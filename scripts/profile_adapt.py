"""Ablation profile of the adaptation step (marginal chained-scan timing).

Where do the 14 ms go?  Times the full G/D step and a ladder of reduced
variants (augmentation off, D-only, G-only, bare forwards) with the same
two-chain-length marginal methodology as bench.py, so the dispatch floor
cancels and differences attribute time to phases honestly.

Usage (real TPU):  python scripts/profile_adapt.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from mcmda_tpu import api
from mcmda_tpu.models import critic as critic_mod, segmenter
from mcmda_tpu.train import adapt, source


def timed(label, step_fn, state, batch, metric_key):
    dt, flops, nbytes = bench._timed_scan(step_fn, state, batch,
                                          metric_key=metric_key)
    print(f"{label:34s} {dt * 1e3:7.2f} ms  "
          f"({flops / dt / 1e12:5.2f} TF/s, {nbytes / dt / 1e9:5.1f} GB/s)",
          flush=True)
    return dt


def timed_fwd(label, fn, *args):
    """Marginal timing of a pure forward via a feedback-perturbed scan."""
    def run_k(K):
        def body(c, _):
            out = fn(*((args[0] + c * 1e-12,) + args[1:]))
            return jnp.sum(out[0] if isinstance(out, tuple) else out), None
        def outer(x0):
            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return s
        f = jax.jit(outer)
        _ = float(f(jnp.float32(0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run_k(10), run_k(30)
    dt = (t2 - t1) / 20
    print(f"{label:34s} {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    cfg = api.load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "mri2ct.json"))
    b = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    batch = {
        "src_image": jax.random.normal(jax.random.key(2), (b, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3), (b, 256, 256, 3)),
    }

    full = timed("full G/D step", adapt.make_adapt_step(cfg), a_state, batch,
                 "g_loss")
    timed("  - augmentation off", adapt.make_adapt_step(cfg, augment=False),
          a_state, batch, "g_loss")
    timed("  - D only (pretrain form)",
          adapt.make_adapt_step(cfg, train_g=False), a_state, batch, "d_loss")

    # bare forwards (train-mode BN, no grad)
    def seg_fwd(x, params, bn):
        logits, _, taps, _ = segmenter.apply(params, bn, x, cfg.segmenter,
                                             train=True)
        return logits
    timed_fwd("segmenter fwd (train BN)", seg_fwd, batch["src_image"],
              src_params, src_bn)

    def seg_fwd_eval(x, params, bn):
        logits, _, taps, _ = segmenter.apply(params, bn, x, cfg.segmenter,
                                             train=False)
        return logits
    timed_fwd("segmenter fwd (eval BN)", seg_fwd_eval, batch["src_image"],
              src_params, src_bn)

    # G-phase-equivalent: fwd+bwd through DAM w.r.t. a scalar of the taps
    dam = a_state.dam_params

    def g_like(x, dam_p, st):
        def loss(dp):
            _, _, taps, _ = segmenter.apply(
                st.src_params, st.tgt_bn, x, cfg.segmenter, train=True,
                dam_params=dp, plug_depth=cfg.adapt.plug_depth)
            return sum(jnp.sum(jnp.square(t)) for t in taps.values())
        g = jax.grad(loss)(dam_p)
        return jax.tree.leaves(g)[0]
    timed_fwd("tgt fwd+bwd to DAM (G-ish)", g_like, batch["tgt_image"], dam,
              a_state)

    # critic fwd+bwd
    crit = a_state.critic_params

    def taps_of(x):
        _, _, taps, _ = segmenter.apply(src_params, src_bn, x, cfg.segmenter,
                                        train=True)
        return {k: v for k, v in taps.items()}
    taps = jax.jit(taps_of)(batch["src_image"])

    def d_like(f0, cp, tp):
        def loss(cpp):
            lg = critic_mod.flatten_logits(
                critic_mod.apply(cpp, tp, cfg.critic))
            return jnp.mean(jnp.square(lg)) + 0 * f0
        g = jax.grad(loss)(cp)
        return jax.tree.leaves(g)[0]
    timed_fwd("critic fwd+bwd", d_like, jnp.float32(0.0), crit, taps)

    print(f"\nfull step {full * 1e3:.2f} ms -> "
          f"{b / full:.1f} slices/s", flush=True)


if __name__ == "__main__":
    main()
