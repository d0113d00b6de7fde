"""Training-mode fused conv + BN-statistics kernel (kernels/train_conv.py).

The pallas_call runs in TPU-interpret mode on CPU (same program,
interpreted); the custom VJP and the block-level helper are pure XLA and are
tested directly against the conv_apply + bn_apply oracle the kernel
replaces.  Real-hardware parity + the measured step delta are recorded by
scripts/bench_train_fused.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mcmda_tpu.kernels import train_conv as tk
from mcmda_tpu.ops import blocks, layers


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * scale


@pytest.mark.parametrize("dilation", [1, 2])
def test_conv_stats_pallas_matches_oracle(dilation):
    x = _rand(0, (2, 8, 8, 16))
    w = _rand(1, (3, 3, 16, 32)) * 0.1
    ref_z, ref_s, ref_ss = tk.conv_stats_reference(x, w, dilation)
    with pltpu.force_tpu_interpret_mode():
        z, s, ss = tk.conv_stats_pallas(x, w, dilation, k_tile=16)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ref_ss),
                               rtol=1e-4, atol=1e-3)


def test_conv_stats_custom_vjp_matches_autodiff():
    """The analytic VJP (cotangents of sum/sumsq collapsed onto the conv
    output + linear_transpose convs) must equal plain autodiff through the
    reference composition — including the quadratic sumsq term."""
    x = _rand(0, (2, 6, 6, 4))
    w = _rand(1, (3, 3, 4, 8)) * 0.3

    def loss_fused(x, w):
        z, s, ss = tk.conv_stats(x, w, 2)
        return jnp.sum(jnp.tanh(z)) + jnp.sum(s * s) + jnp.sum(jnp.sqrt(ss))

    def loss_ref(x, w):
        z, s, ss = tk.conv_stats_reference(x, w, 2)
        return jnp.sum(jnp.tanh(z)) + jnp.sum(s * s) + jnp.sum(jnp.sqrt(ss))

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("residual", [False, True])
def test_conv_bn_act_train_matches_layers(residual):
    """Block helper == conv_apply + bn_apply(train) [+ residual] + relu,
    values AND updated running stats."""
    x = _rand(0, (2, 8, 8, 4))
    w = _rand(1, (3, 3, 4, 8)) * 0.3
    conv_p = {"w": w}
    bn_p = {"scale": jnp.abs(_rand(2, (8,))) + 0.5, "bias": _rand(3, (8,))}
    bn_s = {"mean": _rand(4, (8,)), "var": jnp.abs(_rand(5, (8,))) + 0.5}
    res = _rand(6, (2, 8, 8, 8)) if residual else None

    y, st = tk.conv_bn_act_train(conv_p, bn_p, bn_s, x, dilation=2,
                                 momentum=0.9, eps=1e-5, residual=res)
    z = layers.conv_apply(conv_p, x, dilation=2)
    ref, ref_st = layers.bn_apply(bn_p, bn_s, z, True, 0.9, 1e-5)
    if res is not None:
        ref = ref + res
    ref = layers.relu(ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(st[k]), np.asarray(ref_st[k]),
                                   rtol=1e-5, atol=1e-6)


def test_conv_bn_act_train_sync_bn_matches_global():
    """DP sync-BN: per-shard fused helper with pmean'd moments == the
    single-device helper over the concatenated batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    x = _rand(0, (8, 6, 6, 4))
    w = _rand(1, (3, 3, 4, 8)) * 0.3
    conv_p = {"w": w}
    bn_p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
    bn_s = {"mean": jnp.zeros((8,)), "var": jnp.ones((8,))}

    y_ref, st_ref = tk.conv_bn_act_train(conv_p, bn_p, bn_s, x)

    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("data",))
    fn = shard_map(
        functools.partial(tk.conv_bn_act_train, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data")),
        out_specs=(P("data"), P()),
    )
    y, st = fn(conv_p, bn_p, bn_s, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st["var"]), np.asarray(st_ref["var"]),
                               rtol=1e-5, atol=1e-6)


def test_residual_block_fused_dispatch_parity(monkeypatch):
    """residual_block_apply(fused_train=True) == stock path, with the fits
    gate forced open so the fused code path (not the fallback) is compared —
    the pallas_call itself interprets on CPU."""
    params, state = blocks.residual_block_init(jax.random.key(0), 16, 16)
    x = _rand(1, (2, 8, 8, 16))

    ref_y, ref_st = blocks.residual_block_apply(
        params, state, x, dilation=2, train=True)

    monkeypatch.setattr(tk, "fits", lambda *a, **k: True)
    monkeypatch.setattr(
        tk, "conv_stats_pallas",
        functools.partial(tk.conv_stats_pallas, k_tile=16))
    with pltpu.force_tpu_interpret_mode():
        y, st = blocks.residual_block_apply(
            params, state, x, dilation=2, train=True, fused_train=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st["bn1"]["var"]),
                               np.asarray(ref_st["bn1"]["var"]),
                               rtol=1e-5, atol=1e-6)


def test_fits_gate():
    """The VMEM gate accepts the wide dilated-tail shapes (on TPU) and
    rejects thin/bf16/strided-unfriendly ones everywhere."""
    on_tpu = jax.default_backend() == "tpu"
    assert tk.fits((8, 32, 32, 256), (3, 3, 256, 256), 2,
                   jnp.float32) == on_tpu
    assert tk.fits((8, 32, 32, 512), (3, 3, 512, 512), 4,
                   jnp.float32) == on_tpu
    assert not tk.fits((8, 64, 64, 128), (3, 3, 128, 128), 1, jnp.bfloat16)
    assert not tk.fits((8, 128, 128, 32), (3, 3, 32, 32), 1, jnp.float32)


@pytest.mark.parametrize("c,k,dilation", [(256, 256, 2), (512, 512, 4)])
def test_conv_stats_pallas_production_shapes(c, k, dilation):
    """Interpret-mode parity at the EXACT rm4/rm5-rm6 production shapes
    (32x32 spatial, 256/512 channels, dilation 2/4, k_tile 128) — the same
    grid/tiling the real chip executes, so tiling bugs surface here and not
    only on hardware."""
    x = _rand(0, (2, 32, 32, c), 1.0)
    w = _rand(1, (3, 3, c, k), 0.05)
    ref = tk.conv_stats_reference(x, w, dilation)
    with pltpu.force_tpu_interpret_mode():
        got = tk.conv_stats_pallas(x, w, dilation, k_tile=128)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)
