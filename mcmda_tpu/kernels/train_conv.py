"""Fused 3x3 (dilated) conv + BN-statistics Pallas kernel for TRAINING-mode
blocks of the wide 1/8-resolution dilated tail (SURVEY M1; docs/roadmap.md
Performance item 4).

Training BN needs batch statistics of the conv output, so the eval-mode
conv+affine fusion (kernels/fused_conv.py) does not apply: XLA executes
  conv (write z) -> stats reduction (READ z) -> normalize+ReLU (read z,
  write y),
i.e. z crosses HBM three times plus a write.  This kernel folds the stats
reduction into the conv's own epilogue: while each (batch, K-tile) output
block is still in VMEM it accumulates per-channel sum(z) and sum(z^2) into
VMEM accumulators that persist across the batch-inner grid, so the stats
pass never touches HBM and z crosses twice (write + normalize read) instead
of three times.

The normalize+activate(+residual) epilogue stays a single XLA elementwise
pass — XLA already fuses it — and consumes (z, sum, sumsq), which keeps the
kernel exact under DP sync-BN: the caller pmean's the RAW moments over the
mesh axis before normalizing, exactly like ops/layers.bn_apply (the oracle).
Moments use E[z^2] - E[z]^2, bn_apply's own formula.

Backward is a custom VJP: z, sum and sumsq are all linear-or-quadratic in z,
so their cotangents collapse onto the conv output as
  dz_total = dz + dsum[None,None,None,:] + 2*z*dsumsq[None,None,None,:]
and dx/dw are the standard transposed convs of dz_total — evaluated via
``jax.linear_transpose`` so no forward conv re-runs in the backward pass.

Grid: (K-tiles, batch) with batch INNERMOST, so each K-tile's stats
accumulator block is revisited on consecutive grid steps (the Pallas
revisit-accumulate pattern) and the weight tile loads once per K-tile.

Scope: stride-1 f32 convs whose working set fits VMEM — rm4/rm5/rm6
(32x32 spatial, 256/512 channels), where the dilated tail's FLOPs live.
Everything else falls back to the XLA oracle below (bit-comparable, the
test reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmda_tpu.ops import layers


# ----------------------------------------------------------------- XLA oracle
def conv_stats_reference(x, w, dilation: int = 1):
    """(z, sum_c, sumsq_c) via stock ops — fallback + test oracle."""
    z = layers.conv_apply({"w": w}, x, stride=1, dilation=dilation)
    s = jnp.sum(z, axis=(0, 1, 2))
    ss = jnp.sum(jnp.square(z), axis=(0, 1, 2))
    return z, s, ss


# -------------------------------------------------------------- pallas kernel
def _kernel(x_ref, w_ref, z_ref, s_ref, ss_ref, scratch,
            *, dilation, hw, kt):
    h, w_dim = hw
    p = dilation
    ni = pl.program_id(1)
    # zero-fill borders then place the sample (scratch persists across steps)
    scratch[:] = jnp.zeros_like(scratch)
    scratch[p:p + h, p:p + w_dim, :] = x_ref[0]

    # 9 shifted MXU matmuls accumulate the SAME-padded atrous conv; dy runs
    # in a fori_loop (dim-0 dynamic offsets are unconstrained) so one
    # row-band is live at a time, dx unrolls with static slices (sublane
    # offsets must be aligned) — same scheme as kernels/fused_conv.py.
    def tap_row(dy, acc):
        band = scratch[pl.ds(dy * p, h)]          # (h, W+2p, C)
        wrow = w_ref[pl.ds(dy, 1)]                # (1, 3, C, Kt)
        for dx in range(3):
            xs = band[:, dx * p:dx * p + w_dim, :]
            acc = acc + jax.lax.dot_general(
                xs, wrow[0, dx], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, 3, tap_row,
                            jnp.zeros((h, w_dim, kt), jnp.float32))
    z_ref[0] = acc
    s = jnp.sum(acc, axis=(0, 1))
    ss = jnp.sum(acc * acc, axis=(0, 1))

    @pl.when(ni == 0)
    def _init():
        s_ref[0] = s
        ss_ref[0] = ss

    @pl.when(ni != 0)
    def _accum():
        s_ref[0] += s
        ss_ref[0] += ss


def conv_stats_pallas(x, w, dilation: int = 1, k_tile: int = 128):
    """Pallas path. x [N,H,W,C] f32, w [3,3,C,K] -> (z [N,H,W,K],
    sum [K], sumsq [K])."""
    n, h, wd, c = x.shape
    k = w.shape[-1]
    kt = min(k_tile, k)
    assert k % kt == 0, (k, kt)
    p = dilation

    grid = (k // kt, n)  # batch INNERMOST: stats blocks revisit consecutively
    in_specs = [
        pl.BlockSpec((1, h, wd, c), lambda ki, ni: (ni, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, kt), lambda ki, ni: (0, 0, 0, ki),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, h, wd, kt), lambda ki, ni: (ni, 0, 0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kt), lambda ki, ni: (0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kt), lambda ki, ni: (0, ki),
                     memory_space=pltpu.VMEM),
    ]
    flops = 2 * n * h * wd * c * k * 9
    z, s, ss = pl.pallas_call(
        functools.partial(_kernel, dilation=dilation, hw=(h, wd), kt=kt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((n, h, wd, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((h + 2 * p, wd + 2 * p, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + w.size + n * h * wd * k) * 4,
            transcendentals=0),
    )(x, w)
    return z, s[0], ss[0]


def fits(x_shape, w_shape, dilation: int, dtype,
         budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """VMEM working-set estimate (calibrated like fused_conv.fits_vmem
    against the 16 MB hard limit): double-buffered x/w/z blocks + the
    padded-input scratch + the live accumulator.  rm4 (256ch, d2) ~7 MB;
    rm5/rm6 (512ch, d2/d4) ~13.1 MB — in; the thin high-res stages are
    rejected by the channel-alignment check (they take the s2d path
    anyway)."""
    n, h, wd, c = x_shape
    k = w_shape[-1]
    if dtype != jnp.float32 or w_shape[:2] != (3, 3) or k % 128 != 0 \
            or c % 128 != 0:
        return False
    from mcmda_tpu import kernels as _k
    if not _k.tpu_pallas_available():
        # CPU/GPU runs (tests, dryruns) take the XLA oracle; forced
        # TPU-interpret mode counts as available
        return False
    kt = min(128, k)
    f32 = 4
    buffers = (2 * h * wd * c          # x block, double-buffered
               + 2 * 9 * c * kt        # w block, double-buffered
               + 2 * h * wd * kt       # z out block, double-buffered
               + h * wd * kt) * f32    # live accumulator
    scratch = (h + 2 * dilation) * (wd + 2 * dilation) * c * f32
    return buffers + scratch < budget_bytes


# ------------------------------------------------------------- differentiable
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_stats(x, w, dilation: int = 1):
    """Differentiable fused conv + BN-moment op: Pallas forward when the
    working set fits VMEM, XLA oracle otherwise; shared analytic VJP."""
    if fits(x.shape, w.shape, dilation, x.dtype):
        return conv_stats_pallas(x, w, dilation)
    return conv_stats_reference(x, w, dilation)


def _fwd(x, w, dilation):
    out = conv_stats(x, w, dilation)
    return out, (x, w, out[0])


def _bwd(dilation, res, cts):
    x, w, z = res
    dz, ds, dss = cts
    # sum/sumsq cotangents collapse onto the conv output (sum is linear in z,
    # sumsq quadratic): one fused elementwise pass under XLA
    dz_total = dz + ds[None, None, None, :] + 2.0 * z * dss[None, None, None, :]
    conv = lambda xx, ww: layers.conv_apply({"w": ww}, xx, dilation=dilation)
    dx = jax.linear_transpose(lambda xx: conv(xx, w), x)(dz_total)[0]
    dw = jax.linear_transpose(lambda ww: conv(x, ww), w)(dz_total)[0]
    return dx, dw


conv_stats.defvjp(_fwd, _bwd)


# --------------------------------------------------------------- block helper
def conv_bn_act_train(conv_p, bn_p, bn_state, x, *, dilation=1,
                      activation="relu", momentum=0.99, eps=1e-5,
                      axis_name=None, residual=None):
    """conv -> train-mode BN -> (+residual) -> activation, with the stats
    reduction fused into the conv kernel.  Exact analog of
    ``conv_apply + bn_apply(train=True) [+ residual] + relu`` (the oracle in
    tests/test_train_conv.py), including sync-BN: raw moments are pmean'd
    over ``axis_name`` BEFORE normalizing, matching ops/layers.bn_apply."""
    z, s, ss = conv_stats(x, conv_p["w"], dilation)
    cnt = z.shape[0] * z.shape[1] * z.shape[2]
    mean = s / cnt
    mean2 = ss / cnt
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean2 = jax.lax.pmean(mean2, axis_name)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    new_state = {
        "mean": momentum * bn_state["mean"] + (1.0 - momentum) * mean,
        "var": momentum * bn_state["var"] + (1.0 - momentum) * var,
    }
    y = (z - mean) * (jax.lax.rsqrt(var + eps) * bn_p["scale"]) + bn_p["bias"]
    if residual is not None:
        y = y + residual
    if activation == "relu":
        y = jnp.maximum(y, 0)
    elif activation != "none":
        raise ValueError(activation)
    return y, new_state
