"""Measure the training-mode fused conv+BN-stats kernel (train_fused knob).

Real-hardware parity check + marginal chained-scan timing of the full
adaptation and source steps with segmenter.train_fused = none vs pallas
(kernels/train_conv.py), same methodology as bench.py.  Records the delta
either way (docs/roadmap.md Performance item 4).

Usage (real TPU):  python scripts/bench_train_fused.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.kernels import train_conv as tk
from mcmda_tpu.models import segmenter
from mcmda_tpu.train import adapt, source


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()

    # ---- hardware parity: wide-tail shapes, pallas vs oracle ----
    for c, k, d in ((256, 256, 2), (512, 512, 2), (512, 512, 4)):
        x = jax.random.normal(jax.random.key(0), (8, 32, 32, c), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (3, 3, c, k),
                              jnp.float32) * 0.05
        assert tk.fits(x.shape, w.shape, d, jnp.float32), (c, k, d)
        z, s, ss = jax.jit(tk.conv_stats_pallas,
                           static_argnums=(2,))(x, w, d)
        rz, rs, rss = jax.jit(tk.conv_stats_reference,
                              static_argnums=(2,))(x, w, d)
        np.testing.assert_allclose(np.asarray(z), np.asarray(rz),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), np.asarray(rs),
                                   rtol=1e-4, atol=5e-2)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(rss),
                                   rtol=1e-4, atol=5e-2)
        print(f"parity ok: C={c} K={k} d={d}", flush=True)

    # ---- step timing: none vs pallas ----
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
    lab = jax.nn.one_hot(
        jax.random.randint(jax.random.key(7), (b, 256, 256), 0, 5), 5)

    out = {}
    for mode in ("none", "pallas"):
        cfg = dataclasses.replace(base, segmenter=dataclasses.replace(
            base.segmenter, train_fused=mode))
        src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
        a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
        a_dt, _, _ = bench._timed_scan(adapt.make_adapt_step(cfg), a_state,
                                       a_batch, metric_key="g_loss")
        s_state = source.init_state(jax.random.key(6), cfg)
        s_batch = {"image": a_batch["src_image"], "label": lab}
        s_dt, _, _ = bench._timed_scan(source.make_train_step(cfg), s_state,
                                       s_batch, metric_key="loss")
        out[mode] = (a_dt, s_dt)
        print(f"train_fused={mode:6s}: adapt {a_dt * 1e3:6.2f} ms "
              f"({b / a_dt:6.1f} sl/s)  source {s_dt * 1e3:6.2f} ms "
              f"({b / s_dt:6.1f} sl/s)", flush=True)

    print(f"speedup: adapt x{out['none'][0] / out['pallas'][0]:.3f}  "
          f"source x{out['none'][1] / out['pallas'][1]:.3f}", flush=True)


if __name__ == "__main__":
    main()
