"""Measure the shared-target-forward adapt step (adapt.share_tgt_fwd).

r4 structural lever: within a step the k_d critic updates never touch
``dam_params``, so the D-phase target features and the first G-step's
forward are the same function at the same point — ``share_tgt_fwd=true``
computes them once under ``jax.vjp`` (train/adapt.py).  Bit-identical math
(tests/test_train.py::test_shared_tgt_forward_matches_two_forward_oracle);
this script prices it at production geometry with the same marginal
chained-scan methodology as bench.py.  Writes results/share_fwd_bench.json.

Usage (real TPU):  python scripts/bench_share_fwd.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench
from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.models import segmenter
from mcmda_tpu.train import adapt


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()

    base = ExperimentConfig()
    base = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, warp="pallas"),
        adapt=dataclasses.replace(base.adapt, src_feats_bf16=True))
    b = base.data.batch_size
    a_batch = {
        "src_image": jax.random.normal(jax.random.key(2), (b, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3), (b, 256, 256, 3)),
    }
    out = {}
    for share in (False, True):
        cfg = dataclasses.replace(base, adapt=dataclasses.replace(
            base.adapt, share_tgt_fwd=share))
        src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
        a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
        dt, _, _ = bench._timed_scan(adapt.make_adapt_step(cfg), a_state,
                                     a_batch, metric_key="g_loss")
        out["share" if share else "two_fwd"] = {
            "step_ms": round(dt * 1e3, 3),
            "slices_per_sec": round(b / dt, 1)}
        print(f"share_tgt_fwd={share}: {dt * 1e3:6.2f} ms/step "
              f"({b / dt:6.1f} sl/s)", flush=True)
    out["speedup"] = round(out["two_fwd"]["step_ms"]
                           / out["share"]["step_ms"], 4)
    out["time"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    with open("results/share_fwd_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main() or 0)
