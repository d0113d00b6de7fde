"""Evaluation tests: volume prediction stitching, golden-file style eval on
the synthetic dataset, report formatting, checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmda_tpu.data import synthetic
from mcmda_tpu.evaluation import inference, report
from mcmda_tpu.train import source
from mcmda_tpu.utils import checkpoint


def test_predict_volume_shapes_and_padding(tiny_config):
    cfg = tiny_config

    def fake_forward(images):
        # classify by mean intensity sign -> deterministic, shape-correct
        m = jnp.mean(images, axis=-1, keepdims=True)
        logits = jnp.concatenate([m, -m, 0 * m, 0 * m, 0 * m], axis=-1)
        return jax.nn.softmax(logits, -1)

    vol = np.random.default_rng(0).normal(size=(7, 32, 32)).astype(np.float32)
    pred = inference.predict_volume(fake_forward, vol, batch_size=4)
    assert pred.shape == (7, 32, 32)
    # host-loop fallback path agrees with single-dispatch scan
    pred2 = inference.predict_volume(fake_forward, vol, batch_size=4,
                                     single_dispatch=False)
    np.testing.assert_array_equal(pred, pred2)
    probs = inference.predict_volume_probs(fake_forward, vol, batch_size=4)
    assert probs.shape == (7, 32, 32, 5)
    np.testing.assert_array_equal(pred, probs.argmax(-1))


def test_oracle_eval_is_perfect(tiny_config):
    """A forward that returns the ground truth must score Dice 1.0 through
    the whole stitch+metrics path (golden-file test, SURVEY section 4)."""
    vols, labs = synthetic.make_dataset(0, "mri", 1, depth=8, size=32)
    lab = labs[0]
    lookup = {}

    def oracle(images):
        # match slices by center-channel content
        outs = []
        for b in range(images.shape[0]):
            key = float(jnp.sum(images[b, ..., 1]))
            sl = lookup.get(round(key, 3), np.zeros((32, 32), np.int64))
            outs.append(np.eye(5, dtype=np.float32)[sl])
        return jnp.asarray(np.stack(outs))

    from mcmda_tpu.data import volumes as vio
    stacked = vio.stack_context(vols[0], 3)
    for i in range(stacked.shape[0]):
        lookup[round(float(stacked[i, ..., 1].sum()), 3)] = lab[i]

    agg = report.evaluate_volumes(oracle, vols, labs, batch_size=4,
                                  single_dispatch=False)
    for name in ("AA", "LAC", "LVC", "MYO"):
        assert agg[name]["dice"] == 1.0
        assert agg[name]["assd"] == 0.0
        assert agg[name]["hd95"] == 0.0
    assert agg["mean"]["dice"] == 1.0
    assert agg["mean"]["hd95"] == 0.0
    # per-patient QA rows ride along, one per input volume, json-safe
    import json as _json
    assert len(agg["per_volume"]) == len(vols)
    assert agg["per_volume"][0]["AA"]["dice"] == 1.0
    _json.dumps(agg)
    table = report.format_table(agg)
    assert "mean" in table and "AA" in table and "HD95" in table
    assert "per_volume" not in table


def test_checkpoint_roundtrip(tmp_path, tiny_config):
    cfg = tiny_config
    state = source.init_state(jax.random.key(0), cfg)
    path = checkpoint.save(str(tmp_path / "ck"), state, step=5)
    assert checkpoint.latest_step(str(tmp_path / "ck")) == 5
    restored = checkpoint.restore(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_config_json_roundtrip(tiny_config):
    from mcmda_tpu.config import ExperimentConfig
    text = tiny_config.to_json()
    back = ExperimentConfig.from_json(text)
    assert back.segmenter.stages == tiny_config.segmenter.stages
    assert back.adapt.plug_depth == tiny_config.adapt.plug_depth
    assert back.critic.taps == tiny_config.critic.taps


def test_lcc_postprocess_removes_far_island():
    """A distant false-positive island must vanish under --postprocess cc,
    collapsing the island-driven ASSD while leaving Dice ~unchanged
    (VERDICT r2 item 4: the benchmark lineage's standard filter)."""
    from mcmda_tpu.evaluation import postprocess

    truth = np.zeros((24, 48, 48), np.int32)
    truth[8:16, 16:28, 16:28] = 1          # one solid structure
    pred = truth.copy()
    pred[20:22, 44:46, 44:46] = 1          # planted far island (8 voxels)
    pred[2, 2, 2] = 2                      # class-2 speck with empty truth

    structures = {1: "AA", 2: "LAC"}
    out = postprocess.largest_components(pred, structures)
    # island gone, main body intact, other-class speck untouched (it IS its
    # class's largest component)
    assert not out[20:22, 44:46, 44:46].any()
    np.testing.assert_array_equal(out == 1, truth == 1)
    assert out[2, 2, 2] == 2

    from mcmda_tpu.evaluation import metrics3d
    # the island contributes ~35-voxel distances from its 8 voxels; averaged
    # over ~800 surface voxels that's a small-but-nonzero ASSD, and exactly 0
    # after filtering
    assert metrics3d.assd(pred == 1, truth == 1) > 0.1
    assert metrics3d.assd(out == 1, truth == 1) == 0.0


def test_lcc_connectivity_modes():
    from mcmda_tpu.evaluation import postprocess

    m = np.zeros((1, 5, 5), bool)
    m[0, 0, 0] = True
    m[0, 1, 1] = True  # corner-touching voxel
    m[0, 3, 3] = True
    m[0, 3, 4] = True  # face-touching pair elsewhere
    # 26-connectivity: {0,0 + 1,1} is one 2-voxel component; tie broken by
    # first label — just assert sizes survive correctly under both modes
    keep26 = postprocess.largest_component(m, connectivity=3)
    assert keep26.sum() == 2
    keep6 = postprocess.largest_component(m, connectivity=1)
    assert keep6.sum() == 2 and keep6[0, 3, 3] and keep6[0, 3, 4]


def test_evaluate_volumes_postprocess_reports_both(tiny_config):
    """evaluate_volumes(postprocess=...) returns the filtered table with the
    raw table preserved under agg['raw'] — one inference pass."""
    from mcmda_tpu.evaluation import postprocess

    lab = np.zeros((6, 32, 32), np.int32)
    lab[2:5, 8:20, 8:20] = 1
    pred_vol = lab.copy()
    pred_vol[0, 30:32, 30:32] = 1  # island in a slice far from the body
    lookup = {}
    for i in range(6):
        oh = jax.nn.one_hot(pred_vol[i], 5)
        lookup[i] = oh
    calls = []

    def fwd(images):
        # images [B,H,W,C]; middle channel = the slice; recover index by
        # matching against the volume (test-sized, exact float match)
        outs = []
        mid = images.shape[-1] // 2
        for b in range(images.shape[0]):
            sl = np.asarray(images[..., mid][b])
            idx = next((i for i in range(6)
                        if np.allclose(sl, _vol[i], atol=1e-5)), 0)
            calls.append(idx)
            outs.append(lookup[idx])
        return jnp.stack(outs)

    _vol = (pred_vol.astype(np.float32) - pred_vol.mean()) / (
        pred_vol.std() + 1e-6)
    agg = report.evaluate_volumes(fwd, [_vol], [lab], context=3, batch_size=3,
                                  structures={1: "AA"}, single_dispatch=False,
                                  postprocess=postprocess.largest_components)
    assert agg["raw"]["AA"]["assd"] > agg["AA"]["assd"]
    assert agg["AA"]["assd"] == 0.0
    assert agg["AA"]["dice"] == 1.0
    # per-volume QA rows for BOTH variants (filtered top-level, raw nested)
    assert len(agg["per_volume"]) == 1 and len(agg["raw"]["per_volume"]) == 1
    assert agg["raw"]["per_volume"][0]["AA"]["assd"] > \
        agg["per_volume"][0]["AA"]["assd"]


def test_tta_flip_averages_probabilities():
    """tta_flip averages the softmax over the horizontal flip: for a forward
    whose output depends on x-position the wrapper must equal the hand
    average, be W-equivariant by construction, and leave a flip-equivariant
    forward unchanged."""

    def fwd(xb):
        # probability ramp along W, plus image content in class 1
        w = xb.shape[2]
        ramp = jnp.linspace(0.0, 1.0, w)[None, None, :, None]
        p1 = jnp.broadcast_to(ramp, xb.shape[:3] + (1,))
        p2 = jnp.mean(xb, -1, keepdims=True) ** 2
        rest = jnp.ones(xb.shape[:3] + (3,))
        p = jnp.concatenate([p1, p2, rest], -1)
        return p / jnp.sum(p, -1, keepdims=True)

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    got = inference.tta_flip(fwd)(x)
    want = 0.5 * (np.asarray(fwd(x))
                  + np.asarray(fwd(x[:, :, ::-1, :]))[:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    # memoized: same wrapper object per forward (keeps scan caches warm)
    assert inference.tta_flip(fwd) is inference.tta_flip(fwd)

    def equivariant(xb):  # depends only on |content|, symmetric under flip
        m = jnp.mean(xb, -1, keepdims=True) ** 2
        p = jnp.concatenate([m, 1.0 + 0 * m], -1)
        return p / jnp.sum(p, -1, keepdims=True)

    x_sym = x + x[:, :, ::-1, :]  # flip-symmetric input
    np.testing.assert_allclose(
        np.asarray(inference.tta_flip(equivariant)(x_sym)),
        np.asarray(equivariant(x_sym)), atol=1e-6)

    assert inference.get_tta("none") is None
    assert inference.get_tta("flip") is inference.tta_flip
    import pytest
    with pytest.raises(ValueError):
        inference.get_tta("rot90")


def test_predict_volume_tta_single_dispatch(tiny_config):
    """The TTA wrapper must be jittable through the scanned single-dispatch
    path and agree with the host-loop fallback."""

    def fwd(images):
        m = jnp.mean(images, axis=-1, keepdims=True)
        w = images.shape[2]
        ramp = jnp.linspace(-1.0, 1.0, w)[None, None, :, None]
        logits = jnp.concatenate(
            [m + ramp, -m, 0 * m, 0 * m, 0 * m], axis=-1)
        return jax.nn.softmax(logits, -1)

    vol = np.random.default_rng(1).normal(size=(6, 32, 32)).astype(np.float32)
    wrapped = inference.tta_flip(fwd)
    pred = inference.predict_volume(wrapped, vol, batch_size=3)
    pred2 = inference.predict_volume(wrapped, vol, batch_size=3,
                                     single_dispatch=False)
    np.testing.assert_array_equal(pred, pred2)
    # and it differs from the un-augmented prediction for this asymmetric fwd
    base = inference.predict_volume(fwd, vol, batch_size=3,
                                    single_dispatch=False)
    assert (pred != base).any()
