"""Trustworthy on-TPU component profiling.

Through the axon tunnel, ``block_until_ready`` can return before device
completion AND loop-invariant bodies get hoisted out of scans — both inflate
throughput absurdly (observed 80 PFLOP/s).  Honest recipe, used everywhere
here:
  1. every iteration's input DEPENDS on the previous iteration's output
     (feedback chaining) so no iteration can be elided, and
  2. timing ends with a host READBACK (float()) of a value that depends on
     all iterations.

Usage: python scripts/profile_step.py
"""

import os.path
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.data import pipeline
from mcmda_tpu.models import critic as critic_mod, segmenter
from mcmda_tpu.ops import losses
from mcmda_tpu.train import adapt


def bench_chained(name, fn, x0, K=10, reps=2):
    """fn: x -> y with y reusable as (part of) next x via the provided
    ``feedback`` folding inside; here fn must map an image batch to an image
    batch-shaped perturbation."""
    def multi(x):
        def body(x, k):
            y = fn(x, k)
            return x + 1e-6 * y, None
        x, _ = jax.lax.scan(body, x, jnp.arange(K))
        return x
    mj = jax.jit(multi)
    _ = float(jnp.sum(mj(x0)))  # compile + readback
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(mj(x0)))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:40s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    cfg = ExperimentConfig()
    bs = cfg.data.batch_size
    params, state = segmenter.init(jax.random.key(0), cfg.segmenter)
    imgs = jax.random.normal(jax.random.key(1), (bs, 256, 256, 3))
    cp = critic_mod.init(jax.random.key(3), cfg.critic, cfg.segmenter)
    a0 = adapt.init_state(jax.random.key(1), cfg, params, state)

    bench_chained("augment_images (batch)", lambda x, k: pipeline.augment_images(
        jax.random.fold_in(jax.random.key(2), k), x, cfg.data), imgs)

    def fwd_im(x, k):
        logits, _, _, _ = segmenter.apply(params, state, x, cfg.segmenter,
                                          train=True)
        return jnp.mean(logits, -1, keepdims=True) * jnp.ones_like(x[..., :1]) \
            * jnp.ones((1, 1, 1, 3))
    bench_chained("segmenter fwd (train BN)", fwd_im, imgs)

    def critic_path(x, k):
        _, _, taps, _ = segmenter.apply(params, state, x, cfg.segmenter,
                                        train=True)
        l = critic_mod.flatten_logits(critic_mod.apply(
            cp, {t: taps[t] for t in cfg.critic.taps}, cfg.critic))
        return jnp.mean(l) * jnp.ones_like(x)
    bench_chained("seg fwd + critic fwd", critic_path, imgs)

    def g_vjp(x, k):
        def gl(dam):
            _, _, tp, _ = segmenter.apply(
                a0.src_params, a0.tgt_bn, x, cfg.segmenter, train=True,
                dam_params=dam, plug_depth=cfg.adapt.plug_depth)
            l = critic_mod.flatten_logits(critic_mod.apply(
                cp, {t: tp[t] for t in cfg.critic.taps}, cfg.critic))
            return losses.g_loss_nonsat(l)
        g = jax.grad(gl)(a0.dam_params)
        tot = sum(jnp.sum(v) for v in jax.tree.leaves(g))
        return tot * jnp.ones_like(x)
    bench_chained("G vjp (tgt fwd + bwd to DAM)", g_vjp, imgs)

    def d_vjp(x, k):
        _, _, f_src, _ = segmenter.apply(params, state, x, cfg.segmenter,
                                         train=True)
        def dl(cpp):
            l = critic_mod.flatten_logits(critic_mod.apply(
                cpp, {t: f_src[t] for t in cfg.critic.taps}, cfg.critic))
            return losses.d_loss_nonsat(l, l)
        g = jax.grad(dl)(cp)
        tot = sum(jnp.sum(v) for v in jax.tree.leaves(g))
        return tot * jnp.ones_like(x)
    bench_chained("seg fwd + D vjp (critic only)", d_vjp, imgs)


if __name__ == "__main__":
    main()
