"""Serving batch-size occupancy curve (r5).

The r4 batch curve priced the G/D TRAIN step's occupancy lever and found
batch 8 optimal (results/batching_bench.json) — but serving is a different
shape: eval-mode BN uses running stats, so the serving batch changes
NOTHING numerically (same per-slice math, larger dispatch), and the scanned
volume pass amortizes its weights over the batch.  This measures marginal
device-side volume latency (bench.py's feedback-perturbed two-C scan, the
tunnel-cancelling methodology) at batch 8/16/32/64 at f32 and bf16 compute.

Output: results/serving_batch_bench.json
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcmda_tpu import config as config_mod
from mcmda_tpu.data import volumes as vol_io
from mcmda_tpu.models import segmenter


def marginal(time_at_c, c1, c2):
    return (time_at_c(c2) - time_at_c(c1)) / (c2 - c1)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--slices", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[8, 16, 32, 64])
    p.add_argument("--out", default="results/serving_batch_bench.json")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon plugin overrides "
                        "JAX_PLATFORMS env; this uses jax.config.update, "
                        "the tests/conftest.py mechanism)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    with open("configs/mri2ct.json") as f:
        cfg = config_mod.ExperimentConfig.from_json(f.read())
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    vol = np.asarray(jax.random.normal(
        jax.random.key(8), (args.slices, args.size, args.size)), np.float32)
    stacked = vol_io.stack_context(vol, cfg.data.context_slices)
    n = stacked.shape[0]
    out = {"slices": n, "rows": []}
    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        scfg = dataclasses.replace(cfg.segmenter, compute_dtype=dtype)

        def fwd(img, params, bn):
            _, probs, _, _ = segmenter.apply(params, bn, img, scfg,
                                             train=False)
            return probs

        for b in args.batches:
            if n % b:
                continue
            stacks = jax.device_put(jnp.asarray(
                stacked.reshape((n // b, b) + stacked.shape[1:])))

            def time_at_c(C):
                def many(st, params, bn):
                    def body(carry, _):
                        x = st + carry * jnp.float32(1e-12)

                        def vol_body(_, xb):
                            return None, jnp.argmax(
                                fwd(xb, params, bn), -1).astype(jnp.int32)
                        _, preds = jax.lax.scan(vol_body, None, x)
                        return jnp.sum(preds).astype(jnp.float32), None
                    s, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=C)
                    return s
                f = jax.jit(many)
                _ = float(f(stacks, src_params, src_bn))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = float(f(stacks, src_params, src_bn))
                    best = min(best, time.perf_counter() - t0)
                return best

            dt = marginal(time_at_c, 2, 6)
            row = {"dtype": dtype_name, "batch": b,
                   "ms_per_volume": round(dt * 1e3, 3),
                   "slices_per_s": round(n / dt, 1)}
            out["rows"].append(row)
            print(row, flush=True)
    out["time"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
