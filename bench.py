"""Benchmark: full-size PnP-AdaNet throughput + MFU on one TPU chip.

Covers the THREE hot paths (BASELINE.md "metrics of record"):
  - adaptation train step (flagship: alternating G/D minimax, fused on-device
    augmentation) — the headline metric,
  - supervised source train step,
  - serving (volume inference, single scanned dispatch).

FLOPs per step come from XLA's own compiled cost analysis
(``compile().cost_analysis()['flops']``), and MFU is reported against a peak
measured IN THIS PROCESS by a feedback-chained 4096^3 matmul calibration —
not a datasheet number — so the figure is honest for whatever chip/tunnel
the driver runs on.

Timing methodology (see scripts/profile_step.py): steps run inside a
lax.scan whose carry is the training state — every iteration depends on the
previous one, so nothing can be hoisted or elided — and the clock stops on a
host READBACK of the last step's output.  Through the axon tunnel,
block_until_ready alone returns early and reports absurd numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference denominator: measured by scripts/measure_reference_baseline.py
# (torch-CPU reimplementation of the reference's TF1 training step on the same
# model/shapes; see BASELINE.md "measured" section).
REFERENCE_SLICES_PER_SEC = 0.207


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)) if ca else 0.0


def _timed_scan(step_fn, state, batch, K: int = 20, reps: int = 3,
                metric_key=None):
    """Best per-step latency of a K-step feedback-chained scan, with host
    readback as the completion barrier.  Returns (sec/step, flops/step)."""
    def run_k(state, batch, rng):
        def body(st, k):
            st, m = step_fn(st, batch, jax.random.fold_in(rng, k))
            out = m[metric_key] if metric_key else jax.tree.leaves(m)[0]
            return st, out
        return jax.lax.scan(body, state, jnp.arange(K))

    run_j = jax.jit(run_k, donate_argnums=(0,))
    flops = _flops_of(run_j.lower(state, batch, jax.random.key(4)).compile())
    state, out = run_j(state, batch, jax.random.key(4))  # warm
    _ = float(out[-1])
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        state, out = run_j(state, batch,
                           jax.random.fold_in(jax.random.key(5), rep))
        _ = float(out[-1])  # host readback = true completion barrier
        best = min(best, (time.perf_counter() - t0) / K)
    return best, flops / K


def _measure_peak_tflops() -> float:
    """Feedback-chained bf16 4096^3 matmul chain: measured MXU peak.
    Inputs scaled to unit output variance so the chain stays finite with no
    per-step normalization polluting the measurement."""
    n, K = 4096, 32
    a = jax.random.normal(jax.random.key(0), (n, n),
                          jnp.float32) * (n ** -0.5)
    a = a.astype(jnp.bfloat16)

    def chain(a):
        def body(x, _):
            return (x @ x).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, a, None, length=K)
        return x.astype(jnp.float32).sum()

    f = jax.jit(chain)
    _ = float(f(a))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(a))
        best = min(best, time.perf_counter() - t0)
    return (2 * n ** 3 * K) / best / 1e12


def main():
    from mcmda_tpu.config import ExperimentConfig
    from mcmda_tpu.evaluation import inference
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.train import adapt, source
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()

    import dataclasses
    cfg = ExperimentConfig()
    # production TPU path (configs/*.json): gather-free Pallas warp kernel +
    # bf16 frozen-source-path forward (gradient-free; quality verified)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, warp="pallas"),
        adapt=dataclasses.replace(cfg.adapt, src_feats_bf16=True))
    b = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)

    # ---- adaptation train step (headline) ----
    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    a_batch = {
        "src_image": jax.random.normal(jax.random.key(2), (b, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3), (b, 256, 256, 3)),
    }
    a_dt, a_flops = _timed_scan(adapt.make_adapt_step(cfg), a_state, a_batch,
                                metric_key="g_loss")
    adapt_sps = b / a_dt

    # ---- source train step ----
    s_state = source.init_state(jax.random.key(6), cfg)
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(7), (b, 256, 256), 0, 5), 5)
    s_batch = {"image": a_batch["src_image"], "label": lab}
    s_dt, s_flops = _timed_scan(source.make_train_step(cfg), s_state, s_batch,
                                metric_key="loss")
    source_sps = b / s_dt

    # ---- serving: 64-slice volume, single scanned dispatch ----
    def fwd(img, params, bn):
        _, probs, _, _ = segmenter.apply(params, bn, img, cfg.segmenter,
                                         train=False)
        return probs

    # Device-side number: volume resident in HBM, ONE scanned dispatch +
    # argmax readback (production serving; host->HBM is PCIe on a real TPU
    # VM — through the axon tunnel it is a ~50 MB remote copy that would
    # swamp the measurement, so it is reported separately as e2e).
    from mcmda_tpu.data import volumes as vol_io
    vol = np.asarray(jax.random.normal(jax.random.key(8), (64, 256, 256)),
                     np.float32)
    stacked = vol_io.stack_context(vol, cfg.data.context_slices)
    k = stacked.shape[0] // b
    stacks = jax.device_put(jnp.asarray(
        stacked.reshape((k, b) + stacked.shape[1:])))
    run = inference._scanned_argmax(fwd, (k,) + stacks.shape[1:])
    _ = np.asarray(run(stacks, src_params, src_bn))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # completion barrier: 8-byte readback of a device-side reduction —
        # forces the full scan without paying the tunnel for the 16 MB
        # prediction volume (that transfer is PCIe on a real TPU VM and is
        # covered by the e2e figure below)
        _ = int(jnp.sum(run(stacks, src_params, src_bn)))
        best = min(best, time.perf_counter() - t0)
    serve_dt = best
    serve_sps = vol.shape[0] / serve_dt

    # bf16 serving variant: eval-only precision is safe (probs within 0.02
    # of f32, tests/test_train.py::test_bf16_compute_path; the bf16 QUALITY
    # cliff is specific to adversarial training — docs/roadmap.md), so the
    # serving figure is also reported at bf16 compute.
    cfg16 = dataclasses.replace(cfg, segmenter=dataclasses.replace(
        cfg.segmenter, compute_dtype=jnp.bfloat16))

    def fwd16(img, params, bn):
        _, probs, _, _ = segmenter.apply(params, bn, img, cfg16.segmenter,
                                         train=False)
        return probs

    run16 = inference._scanned_argmax(fwd16, (k,) + stacks.shape[1:])
    _ = np.asarray(run16(stacks, src_params, src_bn))
    best16 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(jnp.sum(run16(stacks, src_params, src_bn)))
        best16 = min(best16, time.perf_counter() - t0)
    serve16_sps = vol.shape[0] / best16
    # e2e including host->device volume upload (tunnel-dominated here)
    t0 = time.perf_counter()
    _ = inference.predict_volume(fwd, vol, context=cfg.data.context_slices,
                                 batch_size=b, fwd_args=(src_params, src_bn))
    serve_e2e_dt = time.perf_counter() - t0

    # ---- MFU ----
    peak = _measure_peak_tflops()
    a_tflops = a_flops / a_dt / 1e12
    s_tflops = s_flops / s_dt / 1e12

    print(json.dumps({
        "metric": "adapt_train_slices_per_sec_per_chip",
        "value": round(adapt_sps, 2),
        "unit": "slices/s/chip",
        "vs_baseline": round(adapt_sps / REFERENCE_SLICES_PER_SEC, 2),
        "extra": {
            "adapt_step_ms": round(a_dt * 1e3, 2),
            "adapt_flops_per_step": a_flops,
            "adapt_tflops_per_sec": round(a_tflops, 2),
            "adapt_mfu_vs_measured_peak": round(a_tflops / peak, 4),
            "source_train_slices_per_sec": round(source_sps, 2),
            "source_step_ms": round(s_dt * 1e3, 2),
            "source_tflops_per_sec": round(s_tflops, 2),
            "source_mfu_vs_measured_peak": round(s_tflops / peak, 4),
            "serving_slices_per_sec": round(serve_sps, 2),
            "serving_bf16_slices_per_sec": round(serve16_sps, 2),
            "serving_volume_ms": round(serve_dt * 1e3, 2),
            "serving_e2e_volume_ms": round(serve_e2e_dt * 1e3, 2),
            "measured_peak_tflops": round(peak, 1),
        },
    }))


if __name__ == "__main__":
    main()
