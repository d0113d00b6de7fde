"""Channels-first Pallas thin-stem kernel (kernels/thin_conv.py).

The forward pallas_call is exercised against the oracle ON TPU (interpret
mode costs ~2 s per lowered op in this environment — a full interpret parity
run takes minutes; scripts/bench_stem.py re-checks it on hardware).  The
backward (dw dot_generals, kernel embedding plumbing, custom-VJP wiring) is
pure XLA and is tested everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmda_tpu.kernels import thin_conv as tc
from mcmda_tpu.ops import layers

ON_TPU = jax.devices()[0].platform == "tpu"


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * scale


def test_w27_tap_order_matches_pad_cf():
    """_w27's tap-major order (c, dy, dx) must match _taps and _pad_cf's
    layout: reconstructing the conv from shifted slices with w27 rows equals
    the oracle."""
    x = _rand(0, (2, 12, 12, 3))
    w = _rand(1, (3, 3, 3, 8), 0.1)
    xp = tc._pad_cf(x)                      # [N,C,H+2,W+2]
    w27 = tc._w27(w)                        # [27, K]
    acc = jnp.zeros((2, 8, 12, 12), jnp.float32)
    for t, (c, dy, dx) in enumerate(tc._taps(3)):
        sh = xp[:, c, dy:dy + 12, dx:dx + 12]
        acc += w27[t][None, :, None, None] * sh[:, None]
    ref = layers.conv_apply({"w": w}, x)
    np.testing.assert_allclose(np.asarray(jnp.transpose(acc, (0, 2, 3, 1))),
                               np.asarray(ref), atol=1e-5)


def test_dw_matches_autodiff_oracle():
    """stem_conv_dw_cf (the custom VJP's weight cotangent) == XLA autodiff
    of the oracle conv, for a non-trivial upstream cotangent."""
    x = _rand(0, (2, 12, 12, 3))
    w = _rand(1, (3, 3, 3, 8), 0.1)
    g_cf = _rand(2, (2, 8, 12, 12))         # cotangent in CF layout

    dw27 = tc.stem_conv_dw_cf(tc._pad_cf(x), g_cf)
    dw = jnp.transpose(dw27.reshape(3, 3, 3, 8), (1, 2, 0, 3))

    g_nhwc = jnp.transpose(g_cf, (0, 2, 3, 1))
    _, vjp = jax.vjp(lambda wv: layers.conv_apply({"w": wv}, x), w)
    ref = vjp(g_nhwc)[0]
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), atol=1e-4)


@pytest.mark.skipif(not ON_TPU, reason="pallas interpret mode is ~2s/op on "
                    "CPU here; forward parity runs on hardware")
def test_stem_conv_forward_matches_oracle_tpu():
    x = _rand(0, (2, 32, 32, 3))
    w = _rand(1, (3, 3, 3, 16), 0.1)
    got = jnp.transpose(tc.stem_conv_nhwc(x, w), (0, 2, 3, 1))
    ref = layers.conv_apply({"w": w}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-2)


@pytest.mark.skipif(not ON_TPU, reason="forward kernel needs hardware")
def test_stem_conv_grads_match_oracle_tpu():
    x = _rand(0, (2, 32, 32, 3))
    w = _rand(1, (3, 3, 3, 16), 0.1)
    gp = jax.grad(lambda wv: jnp.sum(tc.stem_conv_nhwc(x, wv) ** 2))(w)
    gr = jax.grad(lambda wv: jnp.sum(layers.conv_apply({"w": wv}, x) ** 2))(w)
    scale = float(jnp.max(jnp.abs(gr)))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=1e-2 * scale)
    # default path: input cotangent is intentionally zero (first layer)
    gx = jax.grad(lambda xv: jnp.sum(tc.stem_conv_nhwc(xv, w) ** 2))(x)
    assert bool(jnp.all(gx == 0))


def test_stem_conv_production_size_parity():
    """Interpret-mode parity of the channels-first stem kernel at the full
    256x256 production geometry (3->16): the row-band tiling at the shipped
    image size, not just the small unit shapes."""
    from jax.experimental.pallas import tpu as pltpu
    x = jax.random.normal(jax.random.key(0), (2, 256, 256, 3), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 16),
                          jnp.float32) * 0.2
    ref = layers.conv_apply({"w": w}, x, stride=1, dilation=1)
    with pltpu.force_tpu_interpret_mode():
        got = jnp.transpose(tc.stem_conv_nhwc(x, w), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
