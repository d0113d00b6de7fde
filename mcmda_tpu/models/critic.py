"""M3 + M4: feature-space PatchGAN domain critic.

The Domain Critic Module classifies source-vs-target in FEATURE space
[P1 SIII-B]: its input is a selection of higher-layer activations of the
(frozen) segmenter.  Each selected tap is channel-compressed by a 1x1 conv,
resized to the coarsest tap's grid, and concatenated (mode="concat"); or each
tap gets its OWN critic whose losses are summed (mode="multi" — the
multi-level-discriminator capability of BASELINE config 5).

Stack: several strided conv + instance-norm + leaky-ReLU stages, then a 1x1
conv to per-patch domain logits (PatchGAN).  Instance norm replaces the
reference's BN here: it is stateless/per-sample, so the critic needs no
running-statistics plumbing across alternating D/G steps, and it is the
modern default for feature critics.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mcmda_tpu.config import CriticConfig, SegmenterConfig
from mcmda_tpu.ops import layers


def _instance_norm(x, eps=1e-5):
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def tap_channels(seg_cfg: SegmenterConfig) -> Dict[str, int]:
    return {s.name: s.features for s in seg_cfg.stages}


def _stack_init(key, cin: int, cfg: CriticConfig):
    keys = jax.random.split(key, len(cfg.widths) + 1)
    p = {}
    c = cin
    for i, w in enumerate(cfg.widths):
        p[f"conv{i}"] = layers.conv_init(keys[i], 4, 4, c, w, use_bias=True)
        c = w
    p["out"] = layers.conv_init(keys[-1], 1, 1, c, 1, use_bias=True)
    return p


def _stack_apply(p, x, cfg: CriticConfig):
    h = x
    for i, _w in enumerate(cfg.widths):
        h = layers.conv_apply(p[f"conv{i}"], h, stride=cfg.strides[i])
        if i > 0:  # no norm on the first stage (PatchGAN convention)
            h = _instance_norm(h)
        h = layers.leaky_relu(h, cfg.lrelu_slope)
    return layers.conv_apply(p["out"], h)  # [N,h,w,1] patch logits


def init(key, cfg: CriticConfig, seg_cfg: SegmenterConfig):
    chans = tap_channels(seg_cfg)
    for t in cfg.taps:
        if t not in chans:
            raise ValueError(f"critic tap {t!r} is not a segmenter stage")
    kc, ks = jax.random.split(key)
    comp_keys = jax.random.split(kc, len(cfg.taps))
    params = {"compress": {
        t: layers.conv_init(k, 1, 1, chans[t], cfg.compress_features, use_bias=True)
        for t, k in zip(cfg.taps, comp_keys)}}
    if cfg.mode == "concat":
        params["stack"] = _stack_init(ks, cfg.compress_features * len(cfg.taps), cfg)
    elif cfg.mode == "multi":
        stack_keys = jax.random.split(ks, len(cfg.taps))
        params["stacks"] = {t: _stack_init(k, cfg.compress_features, cfg)
                            for t, k in zip(cfg.taps, stack_keys)}
    else:
        raise ValueError(f"unknown critic mode {cfg.mode!r}")
    return params


def apply(params, taps: Dict[str, jnp.ndarray], cfg: CriticConfig):
    """taps: {stage_name: activation NHWC} from the segmenter forward.

    Returns patch logits: [N,h,w,1] (concat mode) or a dict of them (multi
    mode).  Callers treat both uniformly via ``flatten_logits``.
    """
    comp = {}
    for t in cfg.taps:
        h = layers.conv_apply(params["compress"][t], taps[t])
        comp[t] = layers.leaky_relu(h, cfg.lrelu_slope)
    if cfg.mode == "concat":
        min_hw = min((comp[t].shape[1], comp[t].shape[2]) for t in cfg.taps)
        aligned = [comp[t] if comp[t].shape[1:3] == min_hw
                   else layers.resize_to(comp[t], min_hw) for t in cfg.taps]
        return _stack_apply(params["stack"], jnp.concatenate(aligned, axis=-1), cfg)
    return {t: _stack_apply(params["stacks"][t], comp[t], cfg) for t in cfg.taps}


def flatten_logits(out):
    """Concatenate patch logits (possibly per-tap dict) into one flat vector
    per batch element so GAN losses are mode-agnostic."""
    if isinstance(out, dict):
        return jnp.concatenate([v.reshape(v.shape[0], -1) for v in out.values()],
                               axis=1)
    return out.reshape(out.shape[0], -1)
