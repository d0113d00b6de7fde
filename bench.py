"""Benchmark: full-size PnP-AdaNet training throughput on one TPU chip.

Metric of record (BASELINE.json): training slices/sec/chip on the adaptation
step (the framework's flagship path: alternating G/D minimax with on-device
augmentation fused in).  ``vs_baseline`` divides by the measured reference
-equivalent implementation's throughput recorded in BASELINE.md (the
reference published no throughput; SURVEY section 6).

Timing methodology (see scripts/profile_step.py): steps run inside a
lax.scan whose carry is the training state — every iteration depends on the
previous one, so nothing can be hoisted or elided — and the clock stops on a
host READBACK of the last step's loss.  Through the axon tunnel,
block_until_ready alone returns early and reports absurd numbers.

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
    step_fn = adapt.make_adapt_step(cfg)
    batch = {
        "src_image": jax.random.normal(jax.random.key(2),
                                       (batch_size, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3),
                                       (batch_size, 256, 256, 3)),
    }

    K = 20

    def run_k(state, batch, rng):
        def body(st, k):
            st, m = step_fn(st, batch, jax.random.fold_in(rng, k))
            return st, m["g_loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    run_j = jax.jit(run_k, donate_argnums=(0,))

    # compile + warm, with readback
    state, gl = run_j(state, batch, jax.random.key(4))
    _ = float(gl[-1])

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        state, gl = run_j(state, batch, jax.random.fold_in(jax.random.key(5),
                                                           rep))
        _ = float(gl[-1])  # host readback = true completion barrier
        best = min(best, (time.perf_counter() - t0) / K)

    slices_per_sec = batch_size / best
    print(json.dumps({
        "metric": "adapt_train_slices_per_sec_per_chip",
        "value": round(slices_per_sec, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(slices_per_sec / REFERENCE_SLICES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
