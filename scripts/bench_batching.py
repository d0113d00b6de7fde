"""Price the two batching levers named by the r4 per-op profile.

The adapt step is occupancy-limited at batch 8 / 256**2 (no hot op left:
~40 conv fusions at ~20% occupancy each — results/adapt_topops.json), so
the remaining headroom is batching, not kernels.  This script measures:

  a) adapt.batch_critic — one critic apply on the batch-concatenated
     [f_src; f_tgt] features instead of two batch-B applies (exact
     per-sample math, tests/test_train.py::
     test_batch_critic_matches_two_apply_oracle), at production geometry.
  b) the per-chip batch-size occupancy curve (8/16/32): amortized
     per-slice throughput of the full G/D step.  Batch is a QUALITY
     recipe knob (the pinned recipes were swept at 8), so this is a
     diagnostic of the shape limit, not a shipped change.

Same marginal chained-scan methodology as bench.py.  Writes
results/batching_bench.json.

Usage (real TPU):  python scripts/bench_batching.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench
from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.models import segmenter
from mcmda_tpu.train import adapt


def _measure(cfg, batch_size):
    a_batch = {
        "src_image": jax.random.normal(jax.random.key(2),
                                       (batch_size, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3),
                                       (batch_size, 256, 256, 3)),
    }
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    dt, _, _ = bench._timed_scan(adapt.make_adapt_step(cfg), a_state,
                                 a_batch, metric_key="g_loss")
    return dt


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()

    base = ExperimentConfig()
    base = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, warp="pallas"),
        adapt=dataclasses.replace(base.adapt, src_feats_bf16=True))
    out = {}

    # a) batch_critic on/off at the production batch
    b = base.data.batch_size
    for bc in (False, True):
        cfg = dataclasses.replace(base, adapt=dataclasses.replace(
            base.adapt, batch_critic=bc))
        dt = _measure(cfg, b)
        out["batch_critic" if bc else "two_apply"] = {
            "step_ms": round(dt * 1e3, 3),
            "slices_per_sec": round(b / dt, 1)}
        print(f"batch_critic={bc}: {dt * 1e3:6.2f} ms/step "
              f"({b / dt:6.1f} sl/s)", flush=True)
    out["critic_speedup"] = round(out["two_apply"]["step_ms"]
                                  / out["batch_critic"]["step_ms"], 4)

    # b) batch-size occupancy curve with the winning critic mode
    bc_win = out["critic_speedup"] >= 1.0
    curve = {}
    for bs in (8, 16, 32):
        cfg = dataclasses.replace(
            base,
            data=dataclasses.replace(base.data, batch_size=bs),
            adapt=dataclasses.replace(base.adapt, batch_critic=bc_win))
        dt = _measure(cfg, bs)
        curve[str(bs)] = {"step_ms": round(dt * 1e3, 3),
                          "slices_per_sec": round(bs / dt, 1)}
        print(f"batch={bs}: {dt * 1e3:6.2f} ms/step "
              f"({bs / dt:6.1f} sl/s)", flush=True)
    out["batch_curve"] = curve

    out["time"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    try:
        out["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        out["commit"] = "unknown"
    with open("results/batching_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
