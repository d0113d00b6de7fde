"""Serving-path decision bench (VERDICT r3 item 6).

Two eval-mode forward implementations exist and had never been compared at
production geometry after the s2d work landed:

  s2d      ``segmenter.apply(train=False)`` with the space-to-depth thin-stage
           execution strategy (ops/s2d.py) — the path bench.py measures and
           the shipped configs run.
  fused    ``segmenter.apply_fused_eval(use_pallas=True)`` — Pallas fused
           conv+BN-affine+act kernels for every stride-1 residual block
           (kernels/fused_conv.py), XLA elsewhere.
  fused_ref same traversal with the XLA reference kernel (isolates the kernel
           itself from the traversal/BN-folding restructure).

All three also at bf16 compute.  Marginal chained-scan methodology identical
to bench.py's serving figure.  The winner becomes the evaluate/predict
default (run.use_pallas).

Usage (real TPU):  python scripts/bench_serving_paths.py
Writes results/serving_paths.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mcmda_tpu.config import ExperimentConfig
    from mcmda_tpu.data import volumes as vol_io
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()

    import bench

    cfg = ExperimentConfig()
    b = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    vol = np.asarray(jax.random.normal(jax.random.key(8), (64, 256, 256)),
                     np.float32)
    stacked = vol_io.stack_context(vol, cfg.data.context_slices)
    k = stacked.shape[0] // b
    stacks = jax.device_put(jnp.asarray(
        stacked.reshape((k, b) + stacked.shape[1:])))

    def serve_marginal(fwd_fn):
        """bench.py's chained-scan marginal per-volume timing."""
        def time_at_c(C):
            def many(stacks, params, bn):
                def body(carry, _):
                    x = stacks + carry * jnp.float32(1e-12)
                    def vol_body(_, xb):
                        return None, jnp.argmax(
                            fwd_fn(xb, params, bn), -1).astype(jnp.int32)
                    _, preds = jax.lax.scan(vol_body, None, x)
                    return jnp.sum(preds).astype(jnp.float32), None
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=C)
                return s
            f = jax.jit(many)
            _ = float(f(stacks, src_params, src_bn))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(f(stacks, src_params, src_bn))
                best = min(best, time.perf_counter() - t0)
            return best
        return bench._marginal(time_at_c, 2, 6)

    def variants(seg_cfg):
        def s2d(img, params, bn):
            _, probs, _, _ = segmenter.apply(params, bn, img, seg_cfg,
                                             train=False)
            return probs

        def fused(img, params, bn):
            _, probs = segmenter.apply_fused_eval(params, bn, img, seg_cfg,
                                                  use_pallas=True)
            return probs

        def fused_ref(img, params, bn):
            _, probs = segmenter.apply_fused_eval(params, bn, img, seg_cfg,
                                                  use_pallas=False)
            return probs
        return {"s2d": s2d, "fused_pallas": fused, "fused_xla": fused_ref}

    cfg16 = dataclasses.replace(cfg.segmenter, compute_dtype=jnp.bfloat16)
    results = {}
    for prec, seg_cfg in [("f32", cfg.segmenter), ("bf16", cfg16)]:
        for name, fn in variants(seg_cfg).items():
            dt = serve_marginal(fn)
            key = f"{name}_{prec}"
            results[key] = {"volume_ms": round(dt * 1e3, 2),
                            "slices_per_sec": round(vol.shape[0] / dt, 1)}
            print(f"{key:18s} {dt * 1e3:7.2f} ms/volume "
                  f"({vol.shape[0] / dt:7.1f} slices/s)", flush=True)

    best = min(results, key=lambda kk: results[kk]["volume_ms"])
    out = {"results": results, "winner": best,
           "geometry": "64x256x256 volume, batch 8, marginal chained-scan"}
    print(json.dumps(out, indent=1))
    os.makedirs("results", exist_ok=True)
    with open("results/serving_paths.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
