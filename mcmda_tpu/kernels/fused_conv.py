"""Fused 3x3 (dilated) conv + BN-affine + activation + residual-add Pallas
kernel — the segmenter's hot op (SURVEY M1: every backbone block is
conv/dilated-conv -> BN -> ReLU [P1 Fig.2]).

Eval-mode BN is exactly an affine in the channel dim (scale = gamma *
rsqrt(var+eps), bias = beta - mean*scale), so inference blocks fold into ONE
kernel: 9 shifted MXU matmuls accumulate the SAME-padded (a)trous conv in a
VMEM scratch, then scale/bias/residual/activation apply in-register before the
single HBM writeback.  XLA would emit conv + several elementwise kernels with
HBM round-trips between; this keeps the whole block in VMEM.

Grid: (batch, K-tiles).  Per step, the padded input slice [H+2p, W+2p, C]
lives in VMEM scratch; weights stream per K-tile so VMEM stays bounded for
the 512-channel dilated tail (SURVEY section 7 step 6).

Scope: stride-1 convs (the entire 1/8-resolution dilated tail, where the
FLOPs are).  Strided entry convs, 1x1s, and training-mode BN (batch
statistics need a cross-batch reduction) stay on XLA, which already handles
them well.  The XLA fallback below is bit-faithful and is the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmda_tpu.ops import layers


def fold_bn(bn_params, bn_state, eps: float = 1e-5):
    """Fold eval-mode BN into (scale, bias)."""
    scale = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    bias = bn_params["bias"] - bn_state["mean"] * scale
    return scale, bias


def _activate(y, activation: str):
    if activation == "relu":
        return jnp.maximum(y, 0)
    if activation == "leaky_relu":
        return jnp.where(y >= 0, y, 0.2 * y)
    if activation == "none":
        return y
    raise ValueError(activation)


# ----------------------------------------------------------------- XLA oracle
def conv_bn_act_reference(x, w, scale, bias, *, dilation=1, activation="relu",
                          residual=None):
    """XLA fallback / test oracle: same math, stock ops."""
    y = layers.conv_apply({"w": w}, x, stride=1, dilation=dilation)
    y = y * scale + bias
    if residual is not None:
        y = y + residual
    return _activate(y, activation)


# -------------------------------------------------------------- pallas kernel
def _kernel(x_ref, w_ref, s_ref, b_ref, out_ref, scratch,
            *, dilation, activation, hw, cin, kt, has_residual, res_ref=None):
    h, w_dim = hw
    p = dilation
    # zero-fill borders then place the sample.  The K-tile axis is the
    # INNERMOST grid dim and the padded input is identical across all
    # K-tiles of one image, so the (multi-MB) scratch fill runs only on the
    # first K-tile — scratch persists across the revisits.
    @pl.when(pl.program_id(1) == 0)
    def _fill():
        scratch[:] = jnp.zeros_like(scratch)
        scratch[p:p + h, p:p + w_dim, :] = x_ref[0]

    # 9 shifted MXU matmuls accumulate the SAME-padded atrous conv.  dy runs
    # in a fori_loop (dynamic offsets are unconstrained on dim 0) so Mosaic's
    # scoped-vmem stack holds one row-band at a time — full unrolling kept
    # all nine slices live and OOM'd at 64x64 planes.  dx is unrolled with
    # STATIC slices: dynamic offsets on the sublane dim must be 8-aligned,
    # which dx*dilation is not.
    def tap_row(dy, acc):
        band = scratch[pl.ds(dy * p, h)]          # (h, W+2p, C)
        wrow = w_ref[pl.ds(dy, 1)]                # (1, 3, C, Kt)
        for dx in range(3):
            xs = band[:, dx * p:dx * p + w_dim, :]
            wt = wrow[0, dx]
            acc = acc + jax.lax.dot_general(
                xs, wt, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, 3, tap_row,
                            jnp.zeros((h, w_dim, kt), jnp.float32))
    y = acc * s_ref[0] + b_ref[0]
    if has_residual:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0] = _activate(y, activation).astype(out_ref.dtype)


def conv_bn_act_pallas(x, w, scale, bias, *, dilation=1, activation="relu",
                       residual=None, k_tile=128):
    """Pallas path. x [N,H,W,C], w [3,3,C,K], scale/bias [K],
    residual [N,H,W,K] or None -> [N,H,W,K]."""
    n, h, wd, c = x.shape
    k = w.shape[-1]
    kt = min(k_tile, k)
    assert k % kt == 0, (k, kt)
    p = dilation
    has_res = residual is not None

    in_specs = [
        pl.BlockSpec((1, h, wd, c), lambda ni, ki: (ni, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, kt), lambda ni, ki: (0, 0, 0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kt), lambda ni, ki: (0, ki),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kt), lambda ni, ki: (0, ki),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, scale.reshape(1, k), bias.reshape(1, k)]
    kern = functools.partial(_kernel, dilation=dilation, activation=activation,
                             hw=(h, wd), cin=c, kt=kt, has_residual=has_res)
    if has_res:
        def kern(x_ref, w_ref, s_ref, b_ref, res_ref, out_ref, scratch):  # noqa: F811
            _kernel(x_ref, w_ref, s_ref, b_ref, out_ref, scratch,
                    dilation=dilation, activation=activation, hw=(h, wd),
                    cin=c, kt=kt, has_residual=True, res_ref=res_ref)
        in_specs.append(pl.BlockSpec((1, h, wd, kt),
                                     lambda ni, ki: (ni, 0, 0, ki),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    flops = 2 * n * h * wd * c * k * 9
    return pl.pallas_call(
        kern,
        grid=(n, k // kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, wd, kt), lambda ni, ki: (ni, 0, 0, ki),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, k), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * p, wd + 2 * p, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + w.size + n * h * wd * k) * x.dtype.itemsize,
            transcendentals=0),
    )(*args)


def fits_vmem(h: int, w: int, c: int, k: int, dilation: int,
              k_tile: int = 128, has_residual: bool = False,
              budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Conservative VMEM working-set estimate for the fused kernel.

    Pallas double-buffers every in/out block for pipelining (2x), and the
    body keeps acc + live shifted slices; the budget is calibrated against
    observed Mosaic scoped-vmem sizes on v5e (observed ~1.2x this estimate,
    16MB hard limit).  Large spatial planes (the entry stages) blow VMEM and
    stay on XLA; the FLOP-dominant 1/8-resolution dilated tail (32x32,
    256-512ch) fits."""
    # lanes (last dim = channels) pad to multiples of 128 in VMEM
    c_eff = -(-c // 128) * 128
    kt_eff = -(-min(k_tile, k) // 128) * 128
    p = dilation
    f32 = 4
    blocks = h * w * (c_eff + 3 * kt_eff) * f32 * 2  # double-buffered + acc
    if has_residual:
        blocks += h * w * kt_eff * f32 * 2
    scratch = (h + 2 * p) * (w + 2 * p) * c_eff * f32
    return blocks + scratch < budget_bytes


def conv_bn_act_auto(x, w, scale, bias, *, dilation=1, activation="relu",
                     residual=None):
    """Dispatch: Pallas fused kernel when the working set fits VMEM, XLA
    oracle otherwise.  This is what the fused inference path calls.

    Besides the VMEM estimate, the Pallas path requires an executable
    pallas backend (a CPU/GPU run with ``run.use_pallas=true`` must fall
    back, not crash in Mosaic lowering; TPU-interpret mode counts) and K
    divisible by the K-tile (the kernel asserts ``k % kt == 0``) — the same
    guards as ``train_conv.fits``."""
    from mcmda_tpu import kernels as _k
    n, h, wd, c = x.shape
    k = w.shape[-1]
    if (_k.tpu_pallas_available()
            and k % min(128, k) == 0
            and fits_vmem(h, wd, c, k, dilation,
                          has_residual=residual is not None)):
        return conv_bn_act_pallas(x, w, scale, bias, dilation=dilation,
                                  activation=activation, residual=residual)
    return conv_bn_act_reference(x, w, scale, bias, dilation=dilation,
                                 activation=activation, residual=residual)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_bn_act(x, w, scale, bias, dilation=1, activation="relu"):
    """Differentiable fused op (no residual form): Pallas forward, XLA-derived
    backward.  Used where an autodiff path through the fused op is wanted;
    pure-inference callers use conv_bn_act_pallas directly."""
    return conv_bn_act_pallas(x, w, scale, bias, dilation=dilation,
                              activation=activation)


def _fwd(x, w, scale, bias, dilation, activation):
    y = conv_bn_act_pallas(x, w, scale, bias, dilation=dilation,
                           activation=activation)
    return y, (x, w, scale, y)


def _bwd(dilation, activation, res, g):
    x, w, scale, y = res
    if activation == "relu":
        g = jnp.where(y > 0, g, 0.0)
    elif activation == "leaky_relu":
        g = jnp.where(y > 0, g, 0.2 * g)
    gz = g * scale  # through the affine
    # grads via XLA transposed convs (correct + fast; fusing bwd is future work)
    _, vjp = jax.vjp(lambda xx, ww: layers.conv_apply({"w": ww}, xx,
                                                      dilation=dilation), x, w)
    dx, dw = vjp(gz)
    z = layers.conv_apply({"w": w}, x, dilation=dilation)
    dscale = jnp.sum(g * z, axis=(0, 1, 2))
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return dx, dw, dscale, dbias


conv_bn_act.defvjp(_fwd, _bwd)
