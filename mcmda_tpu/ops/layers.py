"""Primitive layers as init/apply pure-function pairs.

Replaces the reference's ``layers.py`` layer-builder functions (SURVEY L2:
conv2d, dilated conv2d, batch-norm, ReLU, bilinear upsample) with
TPU-idiomatic JAX: NHWC layout, ``lax.conv_general_dilated`` (MXU-tiled by
XLA), explicit BN state threaded functionally, optional bf16 compute.

Param/state convention: every layer returns ``params`` (trainable) and, for
BN, ``state`` (running statistics) as dicts of jnp arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO weights — the canonical TPU conv layout.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


# --------------------------------------------------------------------- conv
def conv_init(key, kh: int, kw: int, cin: int, cout: int, use_bias: bool = False):
    """He-normal conv kernel (HWIO)."""
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    w = w * jnp.sqrt(2.0 / fan_in)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv_apply(p, x, stride: int = 1, dilation: int = 1, compute_dtype=jnp.float32):
    """SAME conv with optional stride / atrous dilation.

    Dilated convolution is the backbone's key op [P1 Fig.2]; on TPU it lowers
    to an MXU conv with rhs_dilation — no im2col on the host, no custom op.

    Mixed precision: operands cast to ``compute_dtype`` (bf16 doubles MXU
    throughput; the MXU still accumulates bf16 products in f32 internally)
    and the output stays in compute_dtype so the autodiff transpose is
    well-typed — forcing an f32 output via preferred_element_type would hand
    the transpose f32 cotangents against bf16 operands, which lax.conv
    rejects.  Params stay f32 masters.
    """
    w = p["w"].astype(compute_dtype)
    y = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(stride, stride),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMSPEC,
        preferred_element_type=(jnp.float32 if compute_dtype == jnp.float32
                                else None),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ----------------------------------------------------------------- batchnorm
def bn_init(c: int):
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def bn_apply(
    params,
    state,
    x,
    train: bool,
    momentum: float = 0.99,
    eps: float = 1e-5,
    axis_name: str | None = None,
):
    """Batch normalization with functional state.

    ``train=True`` normalizes by batch statistics and returns updated running
    stats; ``axis_name`` enables cross-replica (sync) BN via psum over the
    data-parallel mesh axis — the TPU-native replacement for the reference's
    single-GPU BN semantics.
    """
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        mean2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean2 = lax.pmean(mean2, axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps) * params["scale"]
    y = (x32 - mean) * inv + params["bias"]
    return y.astype(x.dtype), new_state


# --------------------------------------------------------------- activations
def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


# ------------------------------------------------------------------ resizing
def bilinear_upsample(x, factor: int):
    """x8 bilinear upsample of logits back to slice resolution [P1 Fig.2]."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), method="bilinear")


def avg_pool(x, factor: int):
    """Average-pool downsample (used to align multi-level taps for the critic)."""
    if factor == 1:
        return x
    return lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, factor, factor, 1),
        window_strides=(1, factor, factor, 1),
        padding="VALID",
    ) / float(factor * factor)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


# ------------------------------------------------------------------- resize
def resize_to(x, hw: Tuple[int, int], method: str = "bilinear"):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method=method)
