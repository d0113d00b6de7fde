"""Benchmark: full-size PnP-AdaNet training throughput on one TPU chip.

Metric of record (BASELINE.json): training slices/sec/chip on the adaptation
step (the framework's flagship path: alternating G/D minimax, on-device
augmentation fused in).  ``vs_baseline`` divides by the measured reference
-equivalent TF1-style implementation's throughput recorded in BASELINE.md
(the reference published no throughput; SURVEY section 6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

# Reference denominator: measured by scripts/measure_reference_baseline.py
# (torch-CPU reimplementation of the reference's TF1 training step on the same
# model/shapes; see BASELINE.md "measured" section).
REFERENCE_SLICES_PER_SEC = 0.207


def main():
    from mcmda_tpu.config import ExperimentConfig
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.train import adapt

    cfg = ExperimentConfig()
    batch_size = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    step = jax.jit(adapt.make_adapt_step(cfg), donate_argnums=(0,))
    batch = {
        "src_image": jax.random.normal(jax.random.key(2),
                                       (batch_size, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3),
                                       (batch_size, 256, 256, 3)),
    }
    rng = jax.random.key(4)

    # warmup / compile
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    # one "training slice" = one target slice through the full G/D update
    slices_per_sec = iters * batch_size / dt
    print(json.dumps({
        "metric": "adapt_train_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(slices_per_sec / REFERENCE_SLICES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
