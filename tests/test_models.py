"""Model tests: segmenter shapes/taps, DAM split semantics, critic modes."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmda_tpu.models import critic as critic_mod
from mcmda_tpu.models import segmenter


def test_segmenter_shapes_and_taps(tiny_config):
    cfg = tiny_config.segmenter
    params, state = segmenter.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits, probs, taps, new_state = segmenter.apply(params, state, x, cfg,
                                                     train=True)
    assert logits.shape == (2, 32, 32, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
    assert set(taps) == set(cfg.stage_names())
    assert taps["rm3"].shape == (2, 4, 4, 16)   # x8 downsampled
    assert taps["rm5"].shape == (2, 4, 4, 24)   # dilation holds resolution


def test_segmenter_eval_deterministic(tiny_config):
    cfg = tiny_config.segmenter
    params, state = segmenter.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    l1, _, _, s1 = segmenter.apply(params, state, x, cfg, train=False)
    l2, _, _, _ = segmenter.apply(params, s1, x, cfg, train=False)
    np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_dam_split_partition(tiny_config):
    cfg = tiny_config.segmenter
    params, _ = segmenter.init(jax.random.key(0), cfg)
    dam, hlm = segmenter.dam_split(params, cfg, "rm2")
    assert set(dam) == {"stem", "rm1", "rm2"}
    assert set(hlm) == {"rm3", "rm4", "rm5", "head"}


def test_dam_swap_changes_output_only_via_dam(tiny_config):
    """Plug-and-play: with dam_params == source stages the output matches the
    source net; perturbing the DAM changes it."""
    cfg = tiny_config.segmenter
    params, state = segmenter.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    dam = segmenter.dam_init_from_source(params, cfg, "rm2")
    l_src, _, _, _ = segmenter.apply(params, state, x, cfg, train=False)
    l_same, _, _, _ = segmenter.apply(params, state, x, cfg, train=False,
                                      dam_params=dam, plug_depth="rm2")
    np.testing.assert_allclose(l_src, l_same, atol=1e-5)
    dam2 = jax.tree.map(lambda p: p + 0.1, dam)
    l_diff, _, _, _ = segmenter.apply(params, state, x, cfg, train=False,
                                      dam_params=dam2, plug_depth="rm2")
    assert float(jnp.abs(l_diff - l_src).max()) > 1e-3


def test_critic_concat_and_multi(tiny_config):
    seg_cfg = tiny_config.segmenter
    params, state = segmenter.init(jax.random.key(0), seg_cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    _, _, taps, _ = segmenter.apply(params, state, x, seg_cfg, train=True)

    for mode in ("concat", "multi"):
        ccfg = tiny_config.critic.__class__(
            taps=("rm4", "rm5"), compress_features=8, widths=(8, 16),
            strides=(2, 1), mode=mode)
        cp = critic_mod.init(jax.random.key(2), ccfg, seg_cfg)
        out = critic_mod.apply(cp, taps, ccfg)
        flat = critic_mod.flatten_logits(out)
        assert flat.shape[0] == 2 and flat.ndim == 2

    import pytest
    with pytest.raises(ValueError):
        bad = tiny_config.critic.__class__(taps=("nope",))
        critic_mod.init(jax.random.key(3), bad, seg_cfg)
