"""Pallas TPU kernel for the augmentation affine warp (SURVEY D3).

The joint flip/rotate/zoom/shift augmentation is the adapt step's dominant
non-MXU cost: the XLA path (pipeline._warp) is one giant flattened gather
(65536 indices x packed channels) — latency-bound on TPU at ~15.6 ms per
batch-8 256^2 call (docs/roadmap.md "Performance").  This kernel reformulates
the SAME 4-corner bilinear warp as MXU matmuls, with zero gathers:

For an affine inverse map (ys, xs) = A.(y, x) + t (rotation/zoom/shift are
all linear, and a horizontal flip folds into the x coefficients):

    out[r, j] = sum_y sum_x  tri(y - ys(r,j)) . tri(x - xs(r,j)) . in[y, x]

where tri(d) = max(0, 1 - |d|) reproduces bilinear corner weights exactly
(the two taps floor/floor+1 get weights 1-f and f).  Per output row r:

    B_r[y, j] = sum_x in[y, x] . Wx_r[x, j]      # ONE [H,W]@[W,W] MXU matmul
    out_r[j]  = sum_y Wy_r[y, j] . B_r[y, j]     # VPU multiply + sublane sum

with Wx_r[x, j] = tri(x - xs(r, j)), Wy_r[y, j] = tri(y - ys(r, j)) built
in-VMEM from iota arithmetic (never materialized in HBM).  Out-of-range
samples are zeroed by the same strict validity mask as the oracle, so the
results match the XLA path to bf16-payload tolerance (weights and pixels
ride the MXU in bf16; accumulation is f32).

Layout is NCHW (W in lanes) throughout so every build/matmul/reduce/store is
Mosaic-native; the NHWC<->NCHW transposes live outside in XLA where they fuse.

Grid: (batch, H/RB, W/JB).  Per step: RB output rows x C channels matmuls
[HB,W]@[W,JB] bf16 on a VMEM-resident input plane.  Tiling the output
columns (JB lanes) tightens the y-band: ys over a JB-column tile spans
|by|.(JB-1) instead of |by|.(W-1), so at the production geometry (256^2,
15deg, JB=128) HB drops 96 -> 64 — a 1.5x FLOP cut on top of the y-band
itself (the warp is MXU-bound at ~90% of bf16 peak, so FLOPs are time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def affine_coefs(theta, zoom, shift_y, shift_x, flip, h: int, w: int):
    """Coefficients of the INVERSE map used by pipeline._affine_grid:
    ys = ay*y + by*x + cy ; xs = ax*y + bx*x + cx, with a horizontal flip
    folded into the x row (sampling the flipped image at xs equals sampling
    the original at w-1-xs; bilinear weights are symmetric, so this is
    exact).  Returns [6] f32: (ay, by, cy, ax, bx, cx)."""
    cy_c, cx_c = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv = 1.0 / zoom
    ay, by = cos * inv, -sin * inv
    c_y = -ay * cy_c - by * cx_c + cy_c - shift_y
    ax, bx = sin * inv, cos * inv
    c_x = -ax * cy_c - bx * cx_c + cx_c - shift_x
    flip = flip.astype(jnp.float32)
    sign = 1.0 - 2.0 * flip  # +1 normal, -1 flipped
    ax, bx = ax * sign, bx * sign
    c_x = c_x * sign + flip * (w - 1)
    return jnp.stack([ay, by, c_y, ax, bx, c_x]).astype(jnp.float32)


def _kernel(coef_ref, in_ref, out_ref, *, rb: int, h: int, w: int, c: int,
            hb: int, jb: int):
    bi, i, jt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    # whole [B, 6] coef table sits in SMEM (tiny); index by batch program id
    ay, by, cy = coef_ref[bi, 0], coef_ref[bi, 1], coef_ref[bi, 2]
    ax, bx, cx = coef_ref[bi, 3], coef_ref[bi, 4], coef_ref[bi, 5]

    # tpu.iota only produces integers; cast to f32 afterwards
    j0f = (jt * jb).astype(jnp.float32)
    j_lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, jb), 1).astype(jnp.float32) + j0f
    y_sub = jax.lax.broadcasted_iota(jnp.int32, (hb, 1), 0).astype(jnp.float32)
    x_sub = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)

    # y-band: the rows this output block can touch. ys is affine, so its
    # extrema over the block are at the 4 (row, j) corners of THIS column
    # tile; hb is a static bound the CALLER guarantees (from its
    # rotation/zoom ranges and the tile width).  Start is floored to a
    # multiple of 8 (sublane-aligned dynamic slice).
    r0 = (i * rb).astype(jnp.float32)
    r1 = r0 + (rb - 1)
    corners = [ay * r + by * j + cy
               for r in (r0, r1) for j in (j0f, j0f + (jb - 1))]
    y_min = jnp.minimum(jnp.minimum(corners[0], corners[1]),
                        jnp.minimum(corners[2], corners[3])) - 1.0
    start = pl.multiple_of(jnp.clip(y_min.astype(jnp.int32) & ~7, 0, h - hb),
                           8)
    band_f = start.astype(jnp.float32)

    for r in range(rb):  # static unroll: RB output rows per grid step
        row = (i * rb + r).astype(jnp.float32)
        ys = ay * row + by * j_lane + cy                           # [1, JB]
        xs = ax * row + bx * j_lane + cx                           # [1, JB]
        # bilinear hat weights, built in-register (no HBM, no gather)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_sub + band_f - ys))  # [HB, JB]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x_sub - xs))           # [W, JB]
        valid = ((ys >= 0.0) & (ys <= h - 1.0)
                 & (xs >= 0.0) & (xs <= w - 1.0)).astype(jnp.float32)
        wx16 = wx.astype(jnp.bfloat16)
        for ch in range(c):  # static unroll over channels
            b_yj = jax.lax.dot_general(                            # [HB, JB]
                in_ref[0, ch, pl.ds(start, hb)], wx16,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, ch, r] = (jnp.sum(wy * b_yj, axis=0,
                                         keepdims=True) * valid)[0]


def tile_width(w: int) -> int:
    """Output-column tile (lane) width: 128 when the image width divides
    into full lane tiles, else the whole width (no tiling)."""
    return 128 if w % 128 == 0 and w > 128 else w


def band_bound(h: int, w: int, rb: int, max_rotate_rad: float,
               zoom_min: float, jb: int | None = None) -> int:
    """Static y-band size covering any ys span an RB-row output block can
    have under the given rotation/zoom bounds.

    ``jb``: output-column tile width the kernel will run with (see
    ``tile_width``); the rotation term of the span scales with the tile
    width, not the full image width.  None = untiled (jb = w).

    Slack accounting on top of the true corner-to-corner ys span: +-1 for
    the tri-weight support (2 rows), +1 for the fractional floor of y_min,
    and up to +8 lost to the kernel's sublane alignment of the band start
    (``y_min.astype(int32) & ~7`` can move the start ~8 rows below the first
    needed one).  Total +12 (> 2+1+8), ceil'd to a multiple of 8.  The r2
    kernel shipped +4, which silently dropped up to ~113 bilinear taps per
    image at max rotation / min zoom (ADVICE r2, medium) — covered by the
    worst-case sweep in tests/test_kernels.py.
    """
    # max |sin| over the DRAWN range [-max, max] — sin is non-monotone past
    # 90deg, so abs(sin(max)) alone under-sizes the band for ranges > 90deg
    # (a draw near 90deg has the full (w-1)/zoom span)
    s_max = 1.0 if abs(max_rotate_rad) >= np.pi / 2 \
        else abs(np.sin(max_rotate_rad))
    jspan = (w if jb is None else min(jb, w)) - 1
    span = (rb - 1) / zoom_min + s_max * jspan / zoom_min + 12
    return min(h, int(-(-span // 8) * 8))


def warp_affine_nchw(images_nchw, coefs, *, rb: int = 8,
                     interpret: bool = False, max_band: int | None = None,
                     jb: int | None = None):
    """images [B, C, H, W] (any float dtype; matmul payload is bf16),
    coefs [B, 6] from ``affine_coefs`` -> warped [B, C, H, W] f32.

    ``max_band``: static bound on the input-row span any RBxJB output block
    samples (use ``band_bound`` from the augmentation parameter ranges WITH
    the matching jb); restricts each block's matmul to that band — the FLOP
    reduction is h/max_band.  None = full height (always correct).
    ``jb``: output-column tile width; None = ``tile_width(w)``."""
    b, c, h, w = images_nchw.shape
    assert h % rb == 0, (h, rb)
    jb = tile_width(w) if jb is None else jb
    assert w % jb == 0, (w, jb)
    hb = h if max_band is None else min(h, max(8, max_band))
    x16 = images_nchw.astype(jnp.bfloat16)
    kern = functools.partial(_kernel, rb=rb, h=h, w=w, c=c, hb=hb, jb=jb)
    # one [HB,W]@[W,JB] matmul per (b, row, ch, tile); tiles*jb == w
    flops = 2 * b * c * h * hb * w * w
    return pl.pallas_call(
        kern,
        grid=(b, h // rb, w // jb),
        in_specs=[
            pl.BlockSpec((b, 6), lambda bi, ii, jt: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda bi, ii, jt: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, rb, jb),
                               lambda bi, ii, jt: (bi, 0, ii, jt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x16.size + images_nchw.size) * 2,
            transcendentals=0),
        interpret=interpret,
    )(coefs, x16)


def warp_affine(images_nhwc, coefs, *, interpret: bool = False,
                max_band: int | None = None, jb: int | None = None):
    """NHWC wrapper: transposes fuse into neighboring XLA ops."""
    x = jnp.transpose(images_nhwc, (0, 3, 1, 2))
    y = warp_affine_nchw(x, coefs, interpret=interpret, max_band=max_band,
                         jb=jb)
    return jnp.transpose(y, (0, 2, 3, 1)).astype(images_nhwc.dtype)


def warp_affine_reference(images_nhwc, coefs):
    """XLA oracle with the SAME coefficient convention (the pipeline's packed
    single-gather warp, driven by explicit coefs instead of angles)."""
    from mcmda_tpu.data.pipeline import _warp

    def one(img, cf):
        h, w = img.shape[0], img.shape[1]
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        ys = cf[0] * yy + cf[1] * xx + cf[2]
        xs = cf[3] * yy + cf[4] * xx + cf[5]
        return _warp(img, ys, xs)

    return jax.vmap(one)(images_nhwc, coefs)
