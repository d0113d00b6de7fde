"""Space-to-depth execution of the THIN-channel high-resolution stages.

Problem (docs/roadmap.md Performance item 3, measured): the stem
(3->16 conv at 256^2) and rm1's entry convs dominate the forward pass under
XLA NHWC — not for FLOPs but for layout: C=16 fills 16/128 lanes of every
vector register.  The measured dead ends: an XLA reshape-BN relayout (costs
more than it saves) and a channels-first Pallas VPU kernel (fwd hits ~0.5 ms
but its backward is ~1.5x slower than this path — kernels/thin_conv.py).

Fix: run the thin section SPACE-TO-DEPTH.  A 2x2 block transform turns
[N,256,256,3] into [N,128,128,12]; a 3x3 stride-1 conv becomes a dense
3x3 conv over 12->64 "slot channels" whose kernel is a fixed LINEAR
embedding of the original [3,3,3,16] weights (so it is exact, and autodiff
pushes gradients straight back through the einsum).  The MXU sees a
108-deep contraction and 64-wide output instead of 27/16 — measured
fwd+bwd 0.8 ms vs 2.0 ms XLA NHWC (scripts/bench_stem.py, floor-corrected).
The 4x FLOP redundancy (each original tap appears in <=4 slot positions,
zeros elsewhere) is free: these convs are layout-bound, not FLOP-bound.

Better still, the s2d tensor is exactly what rm1 wants: rm1's stride-2
entry conv on the ORIGINAL grid is a stride-1 2x2 conv on the s2d grid
(output lands at 128^2 — s2d space exits naturally), and rm1's 1x1
stride-2 projection reads only block slot (0,0) = the first C channels of
the s2d layout.  No depth-to-space is ever materialized on the hot path.

Channel order: s2d channels are (ry, rx, c) — block row, block col, then
original channel; outputs of the stem conv use (oy, ox, k).  BN statistics
per ORIGINAL channel fold the 4 block slots into the reduction (exact:
slots are just spatial positions).

Used by models/segmenter.py when ``SegmenterConfig.thin_layout == "s2d"``
(the default).  Replaces the reference's entry conv + first residual module
execution strategy (SURVEY M1; the reference left thin-C layers to cuDNN's
dedicated small-C GPU kernels — s2d is the TPU-native equivalent trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- transforms
def space_to_depth(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C], channel order (ry, rx, c)."""
    n, h, w, c = x.shape
    t = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2,
                                                        4 * c)


def depth_to_space(y, k: int):
    """Inverse for a (oy, ox, k)-ordered tensor: [N,H',W',4K] -> [N,2H',2W',K]."""
    n, h, w, _ = y.shape
    t = y.reshape(n, h, w, 2, 2, k)
    return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, k)


# ------------------------------------------------- kernel embeddings (static)
@functools.lru_cache(maxsize=None)
def _stem_mask():
    """M[qy,qx,ry,rx,oy,ox,dy,dx] = 1 where a 3x3 stride-1 original tap
    (dy,dx) lands at s2d block offset (qy-1,qx-1), input slot (ry,rx),
    output slot (oy,ox):  dy = 2*qy + ry - oy + 1 - 2  (qy here 0..2)."""
    m = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for qy in range(3):
        for ry in range(2):
            for oy in range(2):
                dy = 2 * (qy - 1) + ry - oy + 1
                if not 0 <= dy <= 2:
                    continue
                for qx in range(3):
                    for rx in range(2):
                        for ox in range(2):
                            dx = 2 * (qx - 1) + rx - ox + 1
                            if 0 <= dx <= 2:
                                m[qy, qx, ry, rx, oy, ox, dy, dx] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _entry_mask():
    """M[qy,qx,ry,rx,dy,dx] for the stride-2 3x3 conv as a 2x2 s2d conv.

    XLA SAME padding for stride 2 / kernel 3 / even input is (0, 1) — the
    window anchors AT the output pixel, not one before it — so output h'
    reads original rows {2h', 2h'+1, 2h'+2} = s2d blocks {h', h'+1}:
    dy = 2*qy + ry with qy in 0..1; use conv padding ((0,1),(0,1))."""
    m = np.zeros((2, 2, 2, 2, 3, 3), np.float32)
    for qy in range(2):
        for ry in range(2):
            dy = 2 * qy + ry
            if not 0 <= dy <= 2:
                continue
            for qx in range(2):
                for rx in range(2):
                    dx = 2 * qx + rx
                    if 0 <= dx <= 2:
                        m[qy, qx, ry, rx, dy, dx] = 1.0
    return m


def stem_kernel(w):
    """[3,3,C,K] -> dense s2d kernel [3,3,4C,4K]; exact linear embedding."""
    c, k = w.shape[2], w.shape[3]
    m = jnp.asarray(_stem_mask())
    w2 = jnp.einsum("ABrsopyx,yxck->ABrscopk", m, w)
    return w2.reshape(3, 3, 4 * c, 4 * k)


def entry_kernel(w):
    """[3,3,C,K] -> s2d stride-1 kernel [2,2,4C,K] (output on the s2d grid =
    the original stride-2 grid; use with padding ((0,1),(0,1)))."""
    c, k = w.shape[2], w.shape[3]
    m = jnp.asarray(_entry_mask())
    w2 = jnp.einsum("ABrsyx,yxck->ABrsck", m, w)
    return w2.reshape(2, 2, 4 * c, k)


# ---------------------------------------------------------------- layers
def stem_conv(x2, w, compute_dtype=jnp.float32):
    """Stem conv in s2d space: x2 [N,H',W',4C] (ry,rx,c) -> [N,H',W',4K]
    (oy,ox,k).  Exact == SAME 3x3 stride-1 NHWC conv + space_to_depth."""
    w2 = stem_kernel(w).astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x2.astype(compute_dtype), w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype == jnp.float32
                                else None))


# A stride-1 dilation-1 3x3 conv over ANY s2d tensor is the same dense
# kernel embedding the stem uses ([3,3,C,K] -> [3,3,4C,4K], exact): the
# mask only encodes grid geometry, not channel meaning.  Alias kept for
# call-site clarity — the r5 "s2d2" layout runs the thin residual BODIES
# ([N,128,128,32] -> s2d [N,64,64,128]) through it, which turns their
# 4-13 TF/s backward convs (dx/dw at 32 lanes) into dense 128-slot MXU
# contractions (results/adapt_topops.json).
body_conv = stem_conv


def entry_conv(s2, w, compute_dtype=jnp.float32):
    """rm1 entry conv: s2 [N,H',W',4K] (oy,ox,k as produced by stem_conv
    consumers after re-tagging; see note) -> [N,H',W',F] on the natural
    half-resolution grid.  Exact == SAME 3x3 STRIDE-2 NHWC conv.

    Note on slot order: the stem's output slots (oy,ox,k) ARE the s2d input
    slots (ry,rx,c) of the next layer — same physical pixels, same order —
    so no relayout happens between stem and rm1."""
    w2 = entry_kernel(w).astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        s2.astype(compute_dtype), w2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype == jnp.float32
                                else None))


def proj_conv(s2, w, compute_dtype=jnp.float32):
    """rm1 1x1 stride-2 projection: reads block slot (0,0) = the first K
    channels of the s2d tensor.  w [1,1,K,F]."""
    k = w.shape[2]
    return jax.lax.conv_general_dilated(
        s2[..., :k].astype(compute_dtype), w.astype(compute_dtype),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype == jnp.float32
                                else None))


def bn_relu(params, state, y2, k: int, train: bool, momentum: float = 0.99,
            eps: float = 1e-5, axis_name: str | None = None,
            relu: bool = True):
    """``layers.bn_apply`` (+ReLU) semantics on an s2d tensor [N,H',W',4K]:
    statistics per ORIGINAL channel k fold the 4 block slots into the
    reduction (slots are spatial positions).  Same state dict in/out, so
    checkpoints are layout-agnostic."""
    n, h, w, _ = y2.shape
    y4 = y2.astype(jnp.float32).reshape(n, h, w, 4, k)
    if train:
        mean = jnp.mean(y4, axis=(0, 1, 2, 3))
        mean2 = jnp.mean(jnp.square(y4), axis=(0, 1, 2, 3))
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
    out = (y4 - mean) * inv + params["bias"]
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.reshape(n, h, w, 4 * k).astype(y2.dtype), new_state
