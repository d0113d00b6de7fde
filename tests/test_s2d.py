"""Space-to-depth thin-stage path (ops/s2d.py) vs the NHWC oracle.

The s2d execution of stem + rm1-entry is an EXACT graph transform (kernel
embeddings are linear, zeros are additive-neutral), so parity tolerances
here are float-reassociation-level, not approximation-level.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmda_tpu.models import segmenter
from mcmda_tpu.ops import layers, s2d


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * scale


def test_s2d_roundtrip():
    x = _rand(0, (2, 8, 10, 3))
    x2 = s2d.space_to_depth(x)
    assert x2.shape == (2, 4, 5, 12)
    # slot order (ry, rx, c): channel ry*2C+rx*C+c holds pixel (2h+ry, 2w+rx)
    np.testing.assert_array_equal(np.asarray(x2[0, 1, 2, 3]),   # (0,1,c=0)
                                  np.asarray(x[0, 2, 5, 0]))
    np.testing.assert_array_equal(np.asarray(x2[0, 1, 2, 6]),   # (1,0,c=0)
                                  np.asarray(x[0, 3, 4, 0]))
    np.testing.assert_array_equal(np.asarray(s2d.depth_to_space(x2, 3)),
                                  np.asarray(x))


def test_stem_conv_matches_oracle():
    x = _rand(0, (2, 32, 32, 3))
    w = _rand(1, (3, 3, 3, 16), 0.1)
    ref = layers.conv_apply({"w": w}, x)
    got = s2d.depth_to_space(s2d.stem_conv(s2d.space_to_depth(x), w), 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_entry_and_proj_conv_match_stride2_oracle():
    x = _rand(0, (2, 32, 32, 3))
    w = _rand(1, (3, 3, 3, 16), 0.1)
    y2 = s2d.stem_conv(s2d.space_to_depth(x), w)
    y = s2d.depth_to_space(y2, 16)
    w1 = _rand(2, (3, 3, 16, 24), 0.1)
    np.testing.assert_allclose(
        np.asarray(s2d.entry_conv(y2, w1)),
        np.asarray(layers.conv_apply({"w": w1}, y, stride=2)), atol=1e-5)
    wp = _rand(3, (1, 1, 16, 24), 0.1)
    np.testing.assert_allclose(
        np.asarray(s2d.proj_conv(y2, wp)),
        np.asarray(layers.conv_apply({"w": wp}, y, stride=2)), atol=1e-5)


@pytest.mark.parametrize("train", [True, False])
def test_bn_relu_matches_bn_apply(train):
    x = _rand(0, (2, 16, 16, 8))
    p = {"scale": jnp.abs(_rand(1, (8,))) + 0.5, "bias": _rand(2, (8,))}
    st = {"mean": _rand(3, (8,)) * 0.1, "var": jnp.abs(_rand(4, (8,))) + 0.5}
    ref, st_ref = layers.bn_apply(p, st, x, train=train)
    ref = layers.relu(ref)
    got2, st_got = s2d.bn_relu(p, st, s2d.space_to_depth(x), 8, train=train)
    # NOTE: bn_relu consumes (oy,ox,k)-ordered tensors; s2d order (ry,rx,c)
    # is the same physical layout, so d2s with the same order inverts it.
    got = s2d.depth_to_space(got2, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    for k in st_ref:
        np.testing.assert_allclose(np.asarray(st_got[k]),
                                   np.asarray(st_ref[k]), atol=1e-6)


@pytest.mark.parametrize("layout", ["s2d", "s2d2"])
@pytest.mark.parametrize("train", [True, False])
def test_segmenter_s2d_matches_nhwc(tiny_config, train, layout):
    """Whole-net parity: thin_layout='s2d'/'s2d2' == 'nhwc' for logits,
    every tap, and BN state, with an active DAM split.  's2d2' keeps rm1
    s2d-resident through its body and feeds rm2's entry from the s2d view
    (ops/blocks.py residual_block_apply_s2d)."""
    cfg_s = dataclasses.replace(tiny_config.segmenter, thin_layout=layout)
    cfg_n = dataclasses.replace(cfg_s, thin_layout="nhwc")
    params, state = segmenter.init(jax.random.key(0), cfg_s)
    dam = segmenter.dam_init_from_source(params, cfg_s, "rm2")
    dam = jax.tree.map(lambda p: p + 0.03, dam)
    x = _rand(5, (2, 32, 32, 3))
    for kwargs in ({}, {"dam_params": dam, "plug_depth": "rm2"}):
        lo_s, pr_s, tp_s, st_s = segmenter.apply(params, state, x, cfg_s,
                                                 train=train, **kwargs)
        lo_n, pr_n, tp_n, st_n = segmenter.apply(params, state, x, cfg_n,
                                                 train=train, **kwargs)
        np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_n),
                                   atol=2e-4)
        for t in tp_s:
            np.testing.assert_allclose(np.asarray(tp_s[t]),
                                       np.asarray(tp_n[t]), atol=2e-4,
                                       err_msg=t)
        for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


@pytest.mark.parametrize("layout", ["s2d", "s2d2"])
def test_segmenter_s2d_gradients_match_nhwc(tiny_config, layout):
    """DAM gradients through the s2d path == through the NHWC path (the
    training path differentiates through the kernel-embedding einsums)."""
    cfg_s = dataclasses.replace(tiny_config.segmenter, thin_layout=layout)
    cfg_n = dataclasses.replace(cfg_s, thin_layout="nhwc")
    params, state = segmenter.init(jax.random.key(0), cfg_s)
    dam = segmenter.dam_init_from_source(params, cfg_s, "rm2")
    x = _rand(6, (2, 32, 32, 3))

    def loss(dam_p, cfg):
        _, _, taps, _ = segmenter.apply(params, state, x, cfg, train=True,
                                        dam_params=dam_p, plug_depth="rm2")
        return sum(jnp.sum(jnp.square(taps[t])) for t in ("rm4", "rm5"))

    g_s = jax.grad(loss)(dam, cfg_s)
    g_n = jax.grad(loss)(dam, cfg_n)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s)
    flat_n = dict(jax.tree_util.tree_flatten_with_path(g_n)[0])
    for kp, v in flat_s:
        ref = flat_n[kp]
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref),
            atol=2e-3 * max(1.0, float(jnp.max(jnp.abs(ref)))),
            err_msg=jax.tree_util.keystr(kp))


@pytest.mark.parametrize("train", [True, False])
def test_residual_block_s2d_matches_oracle(train):
    """ops/blocks.residual_block_apply_s2d (fully s2d-resident stride-1
    block, the rm1-body fast path of thin_layout='s2d2') == the stock
    block on the depth-to-space view, params shared, incl. BN state."""
    from mcmda_tpu.ops import blocks

    k = 8
    params, state = blocks.residual_block_init(jax.random.key(0), k, k)
    x = _rand(9, (2, 16, 16, k))
    ref, st_ref = blocks.residual_block_apply(params, state, x, train=train)
    got2, st_got = blocks.residual_block_apply_s2d(
        params, state, s2d.space_to_depth(x), k, train=train)
    np.testing.assert_allclose(np.asarray(s2d.depth_to_space(got2, k)),
                               np.asarray(ref), atol=2e-5)
    for a, b in zip(jax.tree.leaves(st_got), jax.tree.leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("train", [True, False])
def test_entry_block_out_s2d_matches_oracle(train):
    """residual_block_apply_s2d_entry(out_s2d=True) == the same call with
    out_s2d=False followed by space_to_depth (the 's2d2' entry handoff)."""
    from mcmda_tpu.ops import blocks

    cin, cout = 8, 8
    params, state = blocks.residual_block_init(jax.random.key(1), cin, cout,
                                               stride=2)
    x2 = s2d.space_to_depth(_rand(10, (2, 16, 16, cin)))
    ref, st_ref = blocks.residual_block_apply_s2d_entry(
        params, state, x2, train=train)
    got2, st_got = blocks.residual_block_apply_s2d_entry(
        params, state, x2, train=train, out_s2d=True)
    np.testing.assert_allclose(np.asarray(s2d.depth_to_space(got2, cout)),
                               np.asarray(ref), atol=2e-5)
    for a, b in zip(jax.tree.leaves(st_got), jax.tree.leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("layout", ["s2d", "s2d2"])
def test_s2d_falls_back_on_odd_size(tiny_config, layout):
    """Odd spatial sizes can't block 2x2; the path must fall back to NHWC
    silently and agree with it."""
    cfg_s = dataclasses.replace(tiny_config.segmenter, thin_layout=layout)
    cfg_n = dataclasses.replace(cfg_s, thin_layout="nhwc")
    params, state = segmenter.init(jax.random.key(0), cfg_s)
    x = _rand(7, (1, 33, 33, 3))
    lo_s, _, _, _ = segmenter.apply(params, state, x, cfg_s, train=True)
    lo_n, _, _, _ = segmenter.apply(params, state, x, cfg_n, train=True)
    np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_n), atol=1e-5)
    assert bool(jnp.all(jnp.isfinite(lo_s)))
