"""Pallas kernel tests vs the XLA oracle (SURVEY section 4 unit tier).

On CPU the kernels run in TPU-interpret mode — same program, interpreted —
so these tests validate kernel logic without a chip; the real-TPU compile
path is exercised by bench.py / scripts on hardware.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mcmda_tpu.kernels import fused_conv as fk
from mcmda_tpu.models import segmenter
from mcmda_tpu.ops import layers


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("dilation", [1, 2, 4])
@pytest.mark.parametrize("activation", ["relu", "none"])
def test_fused_conv_matches_oracle(dilation, activation):
    x = _rand(0, (2, 16, 16, 8))
    w = _rand(1, (3, 3, 8, 16)) * 0.1
    scale = jnp.abs(_rand(2, (16,))) + 0.5
    bias = _rand(3, (16,))
    ref = fk.conv_bn_act_reference(x, w, scale, bias, dilation=dilation,
                                   activation=activation)
    with pltpu.force_tpu_interpret_mode():
        got = fk.conv_bn_act_pallas(x, w, scale, bias, dilation=dilation,
                                    activation=activation, k_tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_conv_residual_and_ktiling():
    x = _rand(0, (1, 8, 8, 16))
    w = _rand(1, (3, 3, 16, 32)) * 0.1
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    res = _rand(2, (1, 8, 8, 32))
    ref = fk.conv_bn_act_reference(x, w, scale, bias, residual=res)
    with pltpu.force_tpu_interpret_mode():
        got = fk.conv_bn_act_pallas(x, w, scale, bias, residual=res, k_tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_conv_multi_batch_multi_ktile_scratch_refill():
    """The padded-input scratch fills only on the first K-tile of each image
    (r3: the fill is skipped on K-tile revisits).  With several images AND
    several K-tiles the kernel must refill when the image changes — a stale
    scratch would silently produce the previous image's output."""
    # DISTINCT per-image content so a stale scratch is guaranteed to differ
    x = jnp.concatenate([_rand(0, (1, 8, 8, 16)),
                         10.0 + _rand(7, (1, 8, 8, 16))], axis=0)
    w = _rand(1, (3, 3, 16, 32)) * 0.1
    scale = jnp.abs(_rand(2, (32,))) + 0.5
    bias = _rand(3, (32,))
    ref = fk.conv_bn_act_reference(x, w, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = fk.conv_bn_act_pallas(x, w, scale, bias, k_tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fold_bn_matches_bn_apply():
    bn_p = {"scale": jnp.asarray([2.0, 0.5]), "bias": jnp.asarray([1.0, -1.0])}
    bn_s = {"mean": jnp.asarray([0.3, -0.2]), "var": jnp.asarray([4.0, 0.25])}
    x = _rand(0, (2, 4, 4, 2))
    y_ref, _ = layers.bn_apply(bn_p, bn_s, x, train=False, eps=1e-5)
    s, b = fk.fold_bn(bn_p, bn_s, eps=1e-5)
    np.testing.assert_allclose(np.asarray(x * s + b), np.asarray(y_ref),
                               atol=1e-5)


def test_custom_vjp_grads_match_xla():
    x = _rand(0, (1, 8, 8, 4))
    w = _rand(1, (3, 3, 4, 8)) * 0.1
    scale = jnp.abs(_rand(2, (8,))) + 0.5
    bias = _rand(3, (8,))

    def f_fused(x, w, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fk.conv_bn_act(x, w, s, b, 2, "relu") ** 2)

    def f_ref(x, w, s, b):
        return jnp.sum(fk.conv_bn_act_reference(x, w, s, b, dilation=2) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


def test_fused_eval_matches_reference_forward(tiny_config):
    """Whole-net fused inference == standard eval forward.

    Reference uses thin_layout='nhwc': the fused-eval path is NHWC math,
    and the s2d default differs from it by float reassociation (~5e-4 at
    the logits) — s2d-vs-nhwc parity has its own test (test_s2d.py)."""
    import dataclasses
    cfg = dataclasses.replace(tiny_config.segmenter, thin_layout="nhwc")
    params, state = segmenter.init(jax.random.key(0), cfg)
    x = _rand(9, (2, 32, 32, 3))
    ref_logits, ref_probs, _, _ = segmenter.apply(params, state, x, cfg,
                                                  train=False)
    # XLA-fallback fused path (exact math check)
    logits_f, probs_f = segmenter.apply_fused_eval(params, state, x, cfg,
                                                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(ref_logits),
                               atol=1e-4)
    # pallas path in interpret mode
    with pltpu.force_tpu_interpret_mode():
        logits_p, probs_p = segmenter.apply_fused_eval(params, state, x, cfg,
                                                       use_pallas=True)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(ref_logits),
                               atol=1e-3)


def test_fused_eval_with_dam(tiny_config):
    import dataclasses
    cfg = dataclasses.replace(tiny_config.segmenter, thin_layout="nhwc")
    params, state = segmenter.init(jax.random.key(0), cfg)
    dam = segmenter.dam_init_from_source(params, cfg, "rm2")
    dam = jax.tree.map(lambda p: p + 0.05, dam)
    x = _rand(4, (1, 32, 32, 3))
    ref, _, _, _ = segmenter.apply(params, state, x, cfg, train=False,
                                   dam_params=dam, plug_depth="rm2")
    got, _ = segmenter.apply_fused_eval(params, state, x, cfg,
                                        dam_params=dam, plug_depth="rm2",
                                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


# ------------------------------------------------------------ warp kernel
def test_warp_affine_matches_oracle():
    """Gather-free MXU warp == packed-gather oracle (same coefs), to bf16
    payload tolerance, including flips and out-of-range zeroing."""
    from mcmda_tpu.kernels import warp
    B, H, W, C = 3, 32, 32, 4
    imgs = _rand(0, (B, H, W, C))
    theta = jnp.asarray([0.15, -0.1, 0.0])
    zoom = jnp.asarray([0.9, 1.15, 1.0])
    sy = jnp.asarray([2.0, -1.5, 0.0])
    sx = jnp.asarray([-3.0, 0.5, 0.0])
    flip = jnp.asarray([False, True, False])
    coefs = jax.vmap(lambda t, z, a, b, f: warp.affine_coefs(
        t, z, a, b, f, H, W))(theta, zoom, sy, sx, flip)
    ref = warp.warp_affine_reference(imgs, coefs)
    with pltpu.force_tpu_interpret_mode():
        out = warp.warp_affine(imgs, coefs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)
    # identity coefs (sample 2) reproduce the input to payload tolerance
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(imgs[2]),
                               atol=0.02)


def test_augment_batch_pallas_matches_xla(tiny_config):
    """cfg.warp='pallas' draws the SAME transforms as the XLA path (shared
    parameter draws) and matches it end-to-end, labels included."""
    import dataclasses
    from mcmda_tpu.data import pipeline
    cfg_x = tiny_config.data
    cfg_p = dataclasses.replace(cfg_x, warp="pallas")
    imgs = _rand(1, (4, 32, 32, 3))
    labs = jax.nn.one_hot(
        jax.random.randint(jax.random.key(2), (4, 32, 32), 0, 5), 5)
    key = jax.random.key(3)
    ix, lx = pipeline.augment_batch(key, imgs, labs, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        ip, lp = pipeline.augment_batch(key, imgs, labs, cfg_p)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), atol=0.02)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), atol=0.03)


def test_warp_affine_banded_matches_oracle():
    """y-banding (the FLOP reducer) must not change results when the caller's
    band bound covers the configured rotation/zoom ranges."""
    from mcmda_tpu.kernels import warp
    B, H, W, C = 3, 64, 64, 4
    imgs = _rand(4, (B, H, W, C))
    theta = jnp.asarray([0.15, -0.26, 0.0])
    zoom = jnp.asarray([0.9, 1.15, 0.9])
    sy = jnp.asarray([4.0, -10.5, 0.0])
    sx = jnp.asarray([-3.0, 10.5, 0.0])
    flip = jnp.asarray([False, True, False])
    coefs = jax.vmap(lambda t, z, a, b, f: warp.affine_coefs(
        t, z, a, b, f, H, W))(theta, zoom, sy, sx, flip)
    ref = warp.warp_affine_reference(imgs, coefs)
    band = warp.band_bound(H, W, 8, 0.27, 0.9)
    assert band < H  # the test must actually exercise the banded path
    with pltpu.force_tpu_interpret_mode():
        out = warp.warp_affine(imgs, coefs, max_band=band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)


def test_warp_band_bound_covers_worst_case_sweep():
    """ADVICE r2 (medium): band_bound's slack must absorb the kernel's
    band-start sublane alignment (up to ~8 rows) plus the tri support at MAX
    rotation / MIN zoom — the shipped +4 silently dropped taps.  Sweep shifts
    so the band start lands at every alignment phase."""
    from mcmda_tpu.kernels import warp
    H = W = 64
    rot, zmin = np.deg2rad(15.0), 0.9
    band = warp.band_bound(H, W, 8, rot, zmin)
    assert band < H  # must exercise the banded path
    img = _rand(7, (1, H, W, 4))
    for theta in (rot, -rot):
        for sy in np.linspace(-10.0, 10.0, 9):
            coefs = jax.vmap(lambda t, z, a, b, f: warp.affine_coefs(
                t, z, a, b, f, H, W))(
                jnp.asarray([theta]), jnp.asarray([zmin]),
                jnp.asarray([float(sy)]), jnp.asarray([2.5]),
                jnp.asarray([False]))
            ref = warp.warp_affine_reference(img, coefs)
            with pltpu.force_tpu_interpret_mode():
                out = warp.warp_affine(img, coefs, max_band=band)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=0.02)


def test_band_bound_monotone_past_90deg():
    """sin is non-monotone past 90deg: a 120deg range must size the band at
    least as large as a 90deg range (review r3 — abs(sin(120deg)) used to
    under-size it)."""
    from mcmda_tpu.kernels import warp
    args = (256, 256, 8)
    b90 = warp.band_bound(*args, np.deg2rad(90.0), 0.9)
    b120 = warp.band_bound(*args, np.deg2rad(120.0), 0.9)
    b15 = warp.band_bound(*args, np.deg2rad(15.0), 0.9)
    assert b120 == b90 >= b15


def test_thin_conv_bf16_input_grad_dtype():
    """stem_conv_nhwc's custom VJP must return cotangents matching the
    primal dtypes (bf16 x used to raise a dtype mismatch, review r3)."""
    from mcmda_tpu.kernels import thin_conv
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 8),
                          jnp.float32) * 0.2

    def loss(x, w):
        with pltpu.force_tpu_interpret_mode():
            y = thin_conv.stem_conv_nhwc(x, w)
        return jnp.sum(y * y)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == w.dtype


def test_fused_conv_production_tail_shapes():
    """Interpret-mode parity of the fused eval conv at the dilated-tail
    production shapes (32x32, 256->256 d2 and 512->512 d4, k_tile 128) —
    the same tiling the serving path runs on the chip."""
    for c, k, d in ((256, 256, 2), (512, 512, 4)):
        x = _rand(0, (1, 32, 32, c))
        w = _rand(1, (3, 3, c, k)) * 0.05
        scale = jnp.abs(_rand(2, (k,))) + 0.5
        bias = _rand(3, (k,))
        ref = fk.conv_bn_act_reference(x, w, scale, bias, dilation=d)
        with pltpu.force_tpu_interpret_mode():
            got = fk.conv_bn_act_pallas(x, w, scale, bias, dilation=d,
                                        k_tile=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-3)


def test_warp_column_tiled_worst_case_sweep():
    """j-tiling (jb < W) computes a per-tile y-band; the tiled band_bound
    must cover every tile at MAX rotation / MIN zoom across band-start
    alignment phases (same adversarial sweep as the untiled test, at a
    tiled geometry)."""
    from mcmda_tpu.kernels import warp
    H = W = 256
    rot, zmin = np.deg2rad(15.0), 0.9
    jb = warp.tile_width(W)
    assert jb == 128  # must exercise the tiled path
    band = warp.band_bound(H, W, 8, rot, zmin, jb=jb)
    assert band < warp.band_bound(H, W, 8, rot, zmin)  # tiling tightens it
    img = _rand(7, (1, H, W, 3))
    for theta in (rot, -rot):
        for sy in np.linspace(-10.0, 10.0, 5):
            coefs = jax.vmap(lambda t, z, a, b, f: warp.affine_coefs(
                t, z, a, b, f, H, W))(
                jnp.asarray([theta]), jnp.asarray([zmin]),
                jnp.asarray([float(sy)]), jnp.asarray([2.5]),
                jnp.asarray([False]))
            ref = warp.warp_affine_reference(img, coefs)
            with pltpu.force_tpu_interpret_mode():
                out = warp.warp_affine(img, coefs, max_band=band, jb=jb)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=0.02)


def test_augment_images_pallas_matches_xla(tiny_config):
    """The dummy-free image-only pallas path draws the same transforms as
    the XLA path and matches it (adapt-step target/source streams)."""
    import dataclasses
    from mcmda_tpu.data import pipeline
    cfg_x = tiny_config.data
    cfg_p = dataclasses.replace(cfg_x, warp="pallas")
    imgs = _rand(5, (4, 32, 32, 3))
    key = jax.random.key(9)
    ix = pipeline.augment_images(key, imgs, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        ip = pipeline.augment_images(key, imgs, cfg_p)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(ix), atol=0.02)


def test_warp_production_size_parity():
    """Interpret-mode warp parity at the production 256x256 geometry (15deg
    rotation range -> banded path with band 96): the y-band tiling and
    boundary arithmetic at the shipped image size, incl. a flipped sample."""
    from mcmda_tpu.kernels import warp
    H = W = 256
    img = _rand(11, (2, H, W, 8))
    coefs = jax.vmap(lambda t, z, a, b, f: warp.affine_coefs(
        t, z, a, b, f, H, W))(
        jnp.asarray([0.26, -0.26]), jnp.asarray([0.9, 1.1]),
        jnp.asarray([5.0, -10.0]), jnp.asarray([-7.0, 3.0]),
        jnp.asarray([False, True]))
    band = warp.band_bound(H, W, 8, 0.26, 0.9)
    assert band < H
    ref = warp.warp_affine_reference(img, coefs)
    with pltpu.force_tpu_interpret_mode():
        out = warp.warp_affine(img, coefs, max_band=band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)
