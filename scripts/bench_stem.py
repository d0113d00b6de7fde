"""Micro-bench: stem (3->16 conv + train-BN + ReLU at 256^2) design candidates.

Reproduces docs/roadmap.md Performance item 3's measurements and evaluates the
channels-first Pallas kernel against them, fwd and fwd+bwd(w, bn), on the real
chip.  Honest-timing recipe from scripts/profile_step.py (feedback chaining +
host readback).

Usage: python scripts/bench_stem.py [fwd|bwd|all]
"""

import os.path
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcmda_tpu.ops import layers

B, H, W, C, K = 8, 256, 256, 3, 16


def bench(name, fn, x0, K_steps=20, reps=3):
    def multi(x):
        def body(x, k):
            y = fn(x, k)
            return x + 1e-6 * y, None
        x, _ = jax.lax.scan(body, x, jnp.arange(K_steps))
        return x
    mj = jax.jit(multi)
    _ = float(jnp.sum(mj(x0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(mj(x0)))
        best = min(best, (time.perf_counter() - t0) / K_steps)
    print(f"{name:48s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    w = jax.random.normal(jax.random.key(1), (3, 3, C, K)) * 0.1
    bn_p, bn_s = layers.bn_init(K)

    def stem_xla(img):
        h = layers.conv_apply({"w": w}, img)
        h, _ = layers.bn_apply(bn_p, bn_s, h, train=True)
        return layers.relu(h)

    def fb(y):  # fold [B,H,W,K] output back to input shape
        return jnp.mean(y, -1, keepdims=True) * jnp.ones((1, 1, 1, C))

    if mode in ("fwd", "all"):
        bench("stem fwd XLA NHWC (roadmap ~4.0ms ctx)",
              lambda img, k: fb(stem_xla(img)), x)
        bench("bare conv XLA NHWC (roadmap 1.75)",
              lambda img, k: fb(layers.conv_apply({"w": w}, img)), x)

        # channels-first conv via XLA (control: does XLA keep CF layout?)
        def conv_cf_xla(img, k):
            xc = jnp.transpose(img, (0, 3, 1, 2))
            y = jax.lax.conv_general_dilated(
                xc, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            m = jnp.mean(y, 1, keepdims=True)  # [B,1,H,W]
            return jnp.transpose(m, (0, 2, 3, 1)) * jnp.ones((1, 1, 1, C))
        bench("conv XLA NCHW incl transpose (control)", conv_cf_xla, x)

        try:
            from mcmda_tpu.kernels import thin_conv as tc
            def stem_pallas(img, k):
                y = tc.stem_conv_nhwc(img, w)  # [B,K,H,W] CF out
                mean = jnp.mean(y, axis=(0, 2, 3))
                var = jnp.mean(jnp.square(y), axis=(0, 2, 3)) - mean ** 2
                inv = jax.lax.rsqrt(var + 1e-5) * bn_p["scale"]
                yn = jnp.maximum((y - mean[:, None, None]) * inv[:, None, None]
                                 + bn_p["bias"][:, None, None], 0.0)
                return jnp.mean(yn, 1, keepdims=True).transpose(0, 2, 3, 1) \
                    * jnp.ones((1, 1, 1, C))
            bench("stem fwd PALLAS CF + XLA BN/relu", stem_pallas, x)
            def conv_pallas(img, k):
                y = tc.stem_conv_nhwc(img, w)
                return jnp.mean(y, 1, keepdims=True).transpose(0, 2, 3, 1) \
                    * jnp.ones((1, 1, 1, C))
            bench("bare conv PALLAS CF incl transposes", conv_pallas, x)
        except ImportError:
            print("thin_conv kernel not built yet")

    if mode in ("bwd", "all"):
        def stem_bwd_xla(img, k):
            def loss(wv, pv):
                h = layers.conv_apply({"w": wv}, img)
                hh, _ = layers.bn_apply(pv, bn_s, h, train=True)
                return jnp.sum(jnp.maximum(hh, 0.0) ** 2)
            gw, gp = jax.grad(loss, argnums=(0, 1))(w, bn_p)
            return jnp.sum(gw) * jnp.ones_like(img) + jnp.sum(gp["scale"])
        bench("stem fwd+bwd(w,bn) XLA NHWC", stem_bwd_xla, x)

        try:
            from mcmda_tpu.kernels import thin_conv as tc
            def stem_bwd_pallas(img, k):
                def loss(wv, pv):
                    y = tc.stem_conv_nhwc(img, wv)
                    mean = jnp.mean(y, axis=(0, 2, 3))
                    var = jnp.mean(jnp.square(y), axis=(0, 2, 3)) - mean ** 2
                    inv = jax.lax.rsqrt(var + 1e-5) * pv["scale"]
                    yn = jnp.maximum((y - mean[:, None, None]) * inv[:, None, None]
                                     + pv["bias"][:, None, None], 0.0)
                    return jnp.sum(yn ** 2)
                gw, gp = jax.grad(loss, argnums=(0, 1))(w, bn_p)
                return jnp.sum(gw) * jnp.ones_like(img) + jnp.sum(gp["scale"])
            bench("stem fwd+bwd(w,bn) PALLAS CF", stem_bwd_pallas, x)
        except ImportError:
            pass


if __name__ == "__main__":
    main()


# ---------------------------------------------------------- space-to-depth
def run_s2d():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    x = jax.random.normal(jax.random.key(0), (B, H, W, C))
    w = jax.random.normal(jax.random.key(1), (3, 3, C, K)) * 0.1
    bn_p, bn_s = layers.bn_init(K)

    def s2d(img):  # [N,H,W,C] -> [N,H/2,W/2,4C], channel order (ry,rx,c)
        n, h, wd, c = img.shape
        t = img.reshape(n, h // 2, 2, wd // 2, 2, c)
        return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(
            n, h // 2, wd // 2, 4 * c)

    def d2s(y2, k):  # inverse, channel order (oy,ox,k)
        n, hh, ww, _ = y2.shape
        t = y2.reshape(n, hh, ww, 2, 2, k)
        return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * hh, 2 * ww, k)

    def make_w2(wv):  # [3,3,C,K] -> [3,3,4C,4K] dense s2d kernel
        c, k = wv.shape[2], wv.shape[3]
        w2 = jnp.zeros((3, 3, 2, 2, c, 2, 2, k), wv.dtype)
        for qy in (-1, 0, 1):
            for ry in (0, 1):
                for oy in (0, 1):
                    dy = 2 * qy + ry - oy + 1
                    if not 0 <= dy <= 2:
                        continue
                    for qx in (-1, 0, 1):
                        for rx in (0, 1):
                            for ox in (0, 1):
                                dx = 2 * qx + rx - ox + 1
                                if not 0 <= dx <= 2:
                                    continue
                                w2 = w2.at[qy + 1, qx + 1, ry, rx, :,
                                           oy, ox, :].set(wv[dy, dx])
        return w2.reshape(3, 3, 4 * c, 4 * k)

    def stem_s2d(img, wv, pv):
        x2 = s2d(img)
        y2 = jax.lax.conv_general_dilated(
            x2, make_w2(wv), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        # BN stats per ORIGINAL channel k: fold the 4 block slots in
        n, hh, ww, _ = y2.shape
        y4 = y2.reshape(n, hh, ww, 4, K)
        mean = jnp.mean(y4, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(y4), axis=(0, 1, 2, 3)) - mean ** 2
        inv = jax.lax.rsqrt(var + 1e-5) * pv["scale"]
        yn = jnp.maximum((y4 - mean) * inv + pv["bias"], 0.0)
        return yn.reshape(n, hh, ww, 4 * K)

    # correctness vs NHWC oracle
    def stem_xla(img, wv, pv):
        hh = layers.conv_apply({"w": wv}, img)
        hh, _ = layers.bn_apply(pv, bn_s, hh, train=True)
        return layers.relu(hh)
    ref = stem_xla(x, w, bn_p)
    got = d2s(stem_s2d(x, w, bn_p), K)
    import numpy as np
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"s2d vs oracle max err: {err:.5f}")

    def fb2(y2):  # [N,128,128,64] -> input shape
        m = jnp.mean(y2, -1, keepdims=True) * jnp.ones((1, 1, 1, 4 * C))
        return d2s(m, C)
    bench("stem fwd S2D (no d2s, as rm1 consumes)",
          lambda img, k: fb2(stem_s2d(img, w, bn_p)), x)
    bench("stem fwd S2D + d2s back to NHWC",
          lambda img, k: jnp.mean(d2s(stem_s2d(img, w, bn_p), K), -1,
                                  keepdims=True) * jnp.ones((1, 1, 1, C)), x)

    def bwd(img, k):
        def loss(wv, pv):
            return jnp.sum(stem_s2d(img, wv, pv) ** 2)
        gw, gp = jax.grad(loss, argnums=(0, 1))(w, bn_p)
        return jnp.sum(gw) * jnp.ones_like(img) + jnp.sum(gp["scale"])
    bench("stem fwd+bwd(w,bn) S2D", bwd, x)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "s2d":
    run_s2d()
