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
    assert agg["mean"]["dice"] == 1.0
    table = report.format_table(agg)
    assert "mean" in table and "AA" in table


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
