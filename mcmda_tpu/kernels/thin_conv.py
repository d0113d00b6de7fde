"""Channels-first Pallas kernels for the THIN-channel high-resolution stages.

The segmenter's stem (3->16 conv at 256^2) dominates the forward pass under
XLA — 4.0 ms of 7.4 ms measured (docs/roadmap.md Performance item 3) — not
for FLOPs (0.45 GFLOP) but for layout: XLA keeps channels in the 128-wide
lane dimension, so C=16 occupies 16/128 lanes of every vector register and
~20x the roofline is lost to padding.  The measured dead end (same doc): an
XLA reshape that widens channels costs MORE in relayout than it saves.

The fix implemented here: work CHANNELS-FIRST.  In a [C, H, W] block the
minor dims are (H, W) = (sublanes, lanes) — at W=256 every register is fully
dense, and C becomes a cheap leading (untiled) dimension.  With C_in=3 and
K=16 the conv is 27*K scalar-by-plane FMAs on the VPU — no MXU, no im2col,
no relayout.  BN + ReLU then run as stock XLA elementwise ops on the
channels-first tensor (dense: lanes still hold W) where XLA fuses them with
consumers; only the NHWC boundary transposes touch layout, and those move
6/33 MB once per call.

Status: KEPT ALTERNATIVE, not the shipped path.  The space-to-depth
execution (``ops/s2d.py``, ``SegmenterConfig.thin_layout='s2d'``, the
default) measured faster on fwd+bwd and is what the segmenter uses; nothing
in models/ calls this module — its consumers are the parity tests
(tests/test_thin_conv.py) and scripts/bench_stem.py, and it documents the
measured channels-first design point (docs/roadmap.md).  The XLA oracle for
parity tests is the stock
``layers.conv_apply`` path.  Custom VJP: dw runs as a second channels-first
kernel (27*K plane-multiply-reduces); dx is NOT computed by default — the
stem is the network's first layer, nothing upstream is trainable — pass
``input_grad=True`` (XLA transposed conv) if an input cotangent is ever
needed.  Replaces the reference's first conv layer (SURVEY M1 entry conv;
the reference left this to cuDNN on GPU where thin channels are handled by
dedicated small-C kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(cin: int):
    return [(c, dy, dx) for c in range(cin) for dy in range(3)
            for dx in range(3)]


# ------------------------------------------------------------------- forward
def _fwd_kernel(w_ref, xp_ref, out_ref, *, h: int, wd: int, cin: int, k: int):
    """One image per grid step.  xp_ref [1,C,H+2,W+2] (SAME-padded),
    w_ref SMEM [C*9, K] tap-major, out_ref [1,K,H,W].

    The output-channel loop is a fori_loop (not Python-unrolled): the 27
    shifted-slice FMAs compile ONCE instead of 27*K times — the fully
    unrolled variant cost ~40 s of Mosaic compile per shape."""
    def body(ko, _):
        acc = jnp.zeros((h, wd), jnp.float32)
        for t, (c, dy, dx) in enumerate(_taps(cin)):
            acc += w_ref[t, ko] * xp_ref[0, c, dy:dy + h, dx:dx + wd]
        out_ref[0, ko] = acc
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def stem_conv_cf(xp, w27):
    """xp [N,C,H+2,W+2] f32 (pre-padded), w27 [C*9,K] f32 -> y [N,K,H,W]."""
    n, cin, hp, wp = xp.shape
    h, wd = hp - 2, wp - 2
    k = w27.shape[1]
    kern = functools.partial(_fwd_kernel, h=h, wd=wd, cin=cin, k=k)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((cin * 9, k), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cin, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, h, wd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, h, wd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * cin * 9 * k,
            bytes_accessed=(xp.size + w27.size + n * k * h * wd) * 4,
            transcendentals=0),
    )(w27, xp)


# ------------------------------------------------------------------ backward
def stem_conv_dw_cf(xp, g):
    """Weight cotangent dw[t,ko] = sum_{n,h,w} xshift_t * g_ko, computed as
    nine XLA dot_generals over the CHANNELS-FIRST residuals — contraction
    over (N,H,W) with tiny (C,K) outputs stays dense because the reduced
    dims hold the lanes.  (A Pallas version reducing planes to K-vectors
    crashed Mosaic's 1D vector-layout inference; XLA handles this shape
    class fine.)  xp [N,C,H+2,W+2], g [N,K,H,W] -> dw27 [C*9, K]."""
    n, cin, hp, wp = xp.shape
    h, wd = hp - 2, wp - 2
    outs = []
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xp, (0, 0, dy, dx), (n, cin, dy + h, dx + wd))
            outs.append(jax.lax.dot_general(
                xs, g, dimension_numbers=(((0, 2, 3), (0, 2, 3)), ((), ())),
                preferred_element_type=jnp.float32))  # [C, K]
    dw = jnp.stack(outs, 0).reshape(9, cin, -1)       # [(dy,dx), C, K]
    return jnp.transpose(dw, (1, 0, 2)).reshape(cin * 9, -1)


# --------------------------------------------------------------- public op
def _pad_cf(x):
    """NHWC [N,H,W,C] -> SAME-padded channels-first [N,C,H+2,W+2] f32."""
    xc = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
    return jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))


def _w27(w):
    """HWIO [3,3,C,K] -> tap-major [C*9, K] matching ``_taps`` order."""
    return jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, w.shape[3])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def stem_conv_nhwc(x, w, input_grad: bool = False):
    """SAME 3x3 stride-1 conv, NHWC input [N,H,W,C] + HWIO weights [3,3,C,K]
    -> CHANNELS-FIRST output [N,K,H,W] f32 (the layout BN/ReLU and the
    boundary transpose consume).  dx is zeros unless ``input_grad=True``."""
    return stem_conv_cf(_pad_cf(x), _w27(w))


def _fwd(x, w, input_grad):
    xp = _pad_cf(x)
    # dtype token rides the residuals as a 0-d array (residuals
    # must be JAX types)
    return stem_conv_cf(xp, _w27(w)), (xp, w, jnp.zeros((), x.dtype))


def _bwd(input_grad, res, g):
    xp, w, x_tok = res
    g = g.astype(jnp.float32)
    cin, k = w.shape[2], w.shape[3]
    dw27 = stem_conv_dw_cf(xp, g)
    dw = jnp.transpose(dw27.reshape(cin, 3, 3, k), (1, 2, 0, 3))
    if input_grad:
        # full-fidelity input cotangent via XLA transposed conv (cold path)
        gt = jnp.transpose(g, (0, 2, 3, 1))  # NHWC cotangent
        _, vjp = jax.vjp(
            lambda xx: jax.lax.conv_general_dilated(
                xx, w.astype(jnp.float32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            jnp.transpose(xp[:, :, 1:-1, 1:-1], (0, 2, 3, 1)))
        dx = vjp(gt)[0]
    else:
        dx = jnp.zeros((xp.shape[0], xp.shape[2] - 2, xp.shape[3] - 2, cin),
                       jnp.float32)
    # cotangent dtypes must match the primal avals (bf16 x previously
    # raised a custom_vjp dtype mismatch)
    return dx.astype(x_tok.dtype), dw.astype(w.dtype)


stem_conv_nhwc.defvjp(_fwd, _bwd)


# -------------------------------------------------- channels-first BN + ReLU
def bn_relu_cf(params, state, y, train: bool, momentum: float = 0.99,
               eps: float = 1e-5, axis_name: str | None = None):
    """``layers.bn_apply`` + ReLU semantics on a channels-first [N,K,H,W]
    tensor (reduction axes (0,2,3) instead of (0,1,2)); same state dict
    in/out so checkpoints are layout-agnostic.  All XLA: elementwise ops on
    the CF tensor are dense (lanes hold W) and fuse with the conv's consumer."""
    y32 = y.astype(jnp.float32)
    if train:
        mean = jnp.mean(y32, axis=(0, 2, 3))
        mean2 = jnp.mean(jnp.square(y32), axis=(0, 2, 3))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        new_state = {"mean": momentum * state["mean"] + (1 - momentum) * mean,
                     "var": momentum * state["var"] + (1 - momentum) * var}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    out = (y32 - mean[:, None, None]) * inv[:, None, None] \
        + params["bias"][:, None, None]
    return jnp.maximum(out, 0.0).astype(y.dtype), new_state


def stem_apply_cf(p, st, x, *, train: bool, momentum: float, eps: float,
                  axis_name=None):
    """Full fused-layout stem: Pallas CF conv -> XLA CF BN+ReLU -> NHWC.
    Drop-in for the stem branch of ``segmenter.apply`` (f32 compute only).
    Returns (h_nhwc, {"bn": new_state})."""
    y = stem_conv_nhwc(x, p["conv"]["w"])
    y, bn_s = bn_relu_cf(p["bn"], st["bn"], y, train, momentum, eps, axis_name)
    return jnp.transpose(y, (0, 2, 3, 1)), {"bn": bn_s}
