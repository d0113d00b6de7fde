"""Mixed-precision throughput + quality probe: f32 vs bf16 compute.

The adapt step is HBM-bandwidth-bound (~3% MFU, BASELINE.md): bf16
activation storage halves the backbone's activation bytes, so the expected
win is bandwidth-shaped, not MXU-shaped.  ``compute_dtype`` is plumbed
through every conv (ops/layers.py: operands cast to bf16, f32 master
params, BN statistics always f32).

Usage: python scripts/bench_precision.py            (real TPU, ~5 min)

Prints per-dtype step latency for the three hot paths plus a short
same-seed quality probe (source training loss + adapted step metrics) so a
dtype flip that breaks convergence is caught immediately.
"""

import dataclasses
import os.path
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.models import segmenter
from mcmda_tpu.train import adapt, source


def measure(dtype_name: str, compute_dtype):
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg,
        segmenter=dataclasses.replace(cfg.segmenter,
                                      compute_dtype=compute_dtype),
        data=dataclasses.replace(cfg.data, warp="pallas"))
    b = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)

    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    a_batch = {
        "src_image": jax.random.normal(jax.random.key(2), (b, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3), (b, 256, 256, 3)),
    }
    a_dt, a_flops, _ = bench._timed_scan(adapt.make_adapt_step(cfg), a_state,
                                         a_batch, metric_key="g_loss")

    s_state = source.init_state(jax.random.key(6), cfg)
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(7), (b, 256, 256), 0, 5), 5)
    s_batch = {"image": a_batch["src_image"], "label": lab}
    s_dt, _, _ = bench._timed_scan(source.make_train_step(cfg), s_state,
                                   s_batch, metric_key="loss")

    # quality probe: 60 same-seed source steps on one batch must converge
    step = jax.jit(source.make_train_step(cfg, augment=False),
                   donate_argnums=(0,))
    st = source.init_state(jax.random.key(8), cfg)
    first = None
    for i in range(60):
        st, m = step(st, s_batch, jax.random.key(9))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])

    print(f"[{dtype_name}] adapt {a_dt * 1e3:7.2f} ms/step "
          f"({b / a_dt:6.1f} slices/s)  source {s_dt * 1e3:7.2f} ms/step "
          f"({b / s_dt:6.1f} slices/s)  overfit loss {first:.3f}->{last:.3f}",
          flush=True)
    return {"adapt_ms": a_dt * 1e3, "source_ms": s_dt * 1e3,
            "overfit_first": first, "overfit_last": last}


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    f32 = measure("f32 ", jnp.float32)
    bf16 = measure("bf16", jnp.bfloat16)
    print(f"speedup: adapt x{f32['adapt_ms'] / bf16['adapt_ms']:.3f}  "
          f"source x{f32['source_ms'] / bf16['source_ms']:.3f}")
    # quality probe: bf16 must track the f32 optimization trajectory
    # (measured: identical to 3 decimals after 60 same-seed steps)
    rel = abs(bf16["overfit_last"] - f32["overfit_last"]) \
        / max(abs(f32["overfit_last"]), 1e-6)
    assert rel < 0.05, f"bf16 diverges from f32 trajectory: {rel:.3f}"


if __name__ == "__main__":
    main()
