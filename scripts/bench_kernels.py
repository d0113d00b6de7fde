"""On-TPU kernel validation + micro/macro benchmarks.

1. numerics: compiled Pallas fused conv vs XLA oracle on real shapes
2. micro: fused block vs XLA at the dilated-tail shape
3. macro: full-size segmenter eval forward, fused vs standard

Usage: python scripts/bench_kernels.py
"""

import os.path
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.kernels import fused_conv as fk
from mcmda_tpu.models import segmenter


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.key(0)

    # ---- 1. numerics on real hardware
    for (c, k, hw, dil) in [(128, 256, 32, 1), (256, 256, 32, 2),
                            (512, 512, 32, 4)]:
        assert fk.fits_vmem(hw, hw, c, k, dil), (c, k, hw)
        x = jax.random.normal(jax.random.fold_in(key, 1), (4, hw, hw, c))
        w = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, c, k)) * 0.05
        s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (k,))) + 0.5
        b = jax.random.normal(jax.random.fold_in(key, 4), (k,))
        ref = jax.jit(lambda x, w, s, b: fk.conv_bn_act_reference(
            x, w, s, b, dilation=dil))(x, w, s, b)
        got = jax.jit(lambda x, w, s, b: fk.conv_bn_act_pallas(
            x, w, s, b, dilation=dil))(x, w, s, b)
        err = float(jnp.max(jnp.abs(got - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"numerics c={c} k={k} hw={hw} dil={dil}: "
              f"max|err|={err:.2e} (maxref {scale:.1f})", flush=True)
        assert err < 1e-2 * max(scale, 1.0), "PALLAS MISMATCH"

        t_ref = timeit(jax.jit(lambda x, w, s, b: fk.conv_bn_act_reference(
            x, w, s, b, dilation=dil)), x, w, s, b)
        t_pal = timeit(jax.jit(lambda x, w, s, b: fk.conv_bn_act_pallas(
            x, w, s, b, dilation=dil)), x, w, s, b)
        flops = 2 * 4 * hw * hw * c * k * 9
        print(f"  micro: xla {t_ref * 1e3:.3f} ms ({flops / t_ref / 1e12:.2f} "
              f"TFLOP/s)  pallas {t_pal * 1e3:.3f} ms "
              f"({flops / t_pal / 1e12:.2f} TFLOP/s)", flush=True)

    # ---- 3. macro: full-size eval forward
    cfg = ExperimentConfig()
    params, state = segmenter.init(jax.random.fold_in(key, 9), cfg.segmenter)
    imgs = jax.random.normal(jax.random.fold_in(key, 10), (8, 256, 256, 3))

    std = jax.jit(lambda p, s, x: segmenter.apply(p, s, x, cfg.segmenter,
                                                  train=False)[0])
    fus = jax.jit(lambda p, s, x: segmenter.apply_fused_eval(
        p, s, x, cfg.segmenter, use_pallas=True)[0])
    l_std = std(params, state, imgs)
    l_fus = fus(params, state, imgs)
    # per-kernel numerics are f32-exact (above); through 15 composed layers
    # of UNTRAINED random weights, reassociation noise amplifies, so the
    # full-net check is prediction agreement, not logit equality
    agree = float(jnp.mean((jnp.argmax(l_std, -1) ==
                            jnp.argmax(l_fus, -1)).astype(jnp.float32)))
    print(f"full-net eval fused-vs-std argmax agreement = {agree:.4f}",
          flush=True)
    t_std = timeit(std, params, state, imgs, iters=30)
    t_fus = timeit(fus, params, state, imgs, iters=30)
    print(f"eval fwd batch8: std {t_std * 1e3:.1f} ms "
          f"({8 / t_std:.1f} sl/s) | fused {t_fus * 1e3:.1f} ms "
          f"({8 / t_fus:.1f} sl/s) | speedup x{t_std / t_fus:.2f}")
    np.testing.assert_array_less(0.98, agree)


if __name__ == "__main__":
    main()
