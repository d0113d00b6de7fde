"""Trainer tests (SURVEY section 4 integration tier): overfit-one-batch for
T1; adaptation step mechanics for T2/T3 — frozen parts stay frozen, critic
learns in pretrain, generator moves features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmda_tpu.data import synthetic, volumes
from mcmda_tpu.models import segmenter
from mcmda_tpu.train import adapt, source


def _batch(tiny_config, seed=0, domain="mri"):
    vols, labs = synthetic.make_dataset(seed, domain, 1, depth=8, size=32)
    ds = volumes.volumes_to_slices(vols, labs)
    idx = np.arange(tiny_config.data.batch_size)
    return {
        "image": jnp.asarray(ds.images[idx]),
        "label": jnp.asarray(np.eye(5, dtype=np.float32)[ds.labels[idx]]),
    }


def test_source_overfit_one_batch(tiny_config):
    cfg = tiny_config
    state = source.init_state(jax.random.key(0), cfg)
    step = jax.jit(source.make_train_step(cfg, augment=False))
    batch = _batch(cfg)
    rng = jax.random.key(1)
    _, first = step(state, batch, rng)
    for i in range(60):
        state, metrics = step(state, batch, rng)
    assert float(metrics["loss"]) < 0.5 * float(first["loss"])
    assert int(state.step) == 60


def test_source_step_jit_stability(tiny_config):
    """Metrics finite; bn state actually updates."""
    cfg = tiny_config
    state = source.init_state(jax.random.key(0), cfg)
    step = jax.jit(source.make_train_step(cfg, augment=True))
    s2, metrics = step(state, _batch(cfg), jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    before = state.bn_state["rm1"]["b0"]["bn1"]["mean"]
    after = s2.bn_state["rm1"]["b0"]["bn1"]["mean"]
    assert float(jnp.abs(after - before).sum()) > 0


@pytest.fixture(scope="module")
def adapt_setup(tiny_config):
    cfg = tiny_config
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    batch = {"src_image": _batch(cfg, 0, "mri")["image"],
             "tgt_image": _batch(cfg, 0, "ct")["image"]}
    return cfg, state, batch


def test_adapt_dam_initialized_from_source(adapt_setup):
    cfg, state, _ = adapt_setup
    dam_src, _ = segmenter.dam_split(state.src_params, cfg.segmenter,
                                     cfg.adapt.plug_depth)
    for a, b in zip(jax.tree.leaves(state.dam_params),
                    jax.tree.leaves(dam_src)):
        np.testing.assert_allclose(a, b)


def test_adapt_step_freezes_source_and_hlm(adapt_setup):
    cfg, state, batch = adapt_setup
    step = jax.jit(adapt.make_adapt_step(cfg, augment=False))
    new_state, metrics = step(state, batch, jax.random.key(2))
    # source path untouched
    for a, b in zip(jax.tree.leaves(state.src_params),
                    jax.tree.leaves(new_state.src_params)):
        np.testing.assert_allclose(a, b)
    # DAM and critic moved
    moved = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(state.dam_params),
        jax.tree.leaves(new_state.dam_params)))
    assert moved > 0
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_pretrain_step_skips_generator(adapt_setup):
    cfg, state, batch = adapt_setup
    step = jax.jit(adapt.make_adapt_step(cfg, train_g=False, augment=False))
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert "g_loss" not in metrics
    for a, b in zip(jax.tree.leaves(state.dam_params),
                    jax.tree.leaves(new_state.dam_params)):
        np.testing.assert_allclose(a, b)


def test_critic_pretrain_learns_to_separate(adapt_setup):
    """T3: with frozen features, the critic's accuracy should rise well above
    chance within a few dozen steps on clearly-shifted domains."""
    cfg, state, batch = adapt_setup
    step = jax.jit(adapt.make_adapt_step(cfg, train_g=False, augment=False))
    for i in range(150):
        state, metrics = step(state, batch, jax.random.key(i))
    assert float(metrics["d_acc"]) > 0.8


def test_adapted_forward_runs(adapt_setup):
    cfg, state, batch = adapt_setup
    fwd = jax.jit(adapt.adapted_forward(cfg))
    probs = fwd(state, batch["tgt_image"])
    assert probs.shape == batch["tgt_image"].shape[:3] + (5,)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


def test_device_resident_sampling(tiny_config):
    """Zero-host-transfer path: steps gather their own batches on device."""
    from mcmda_tpu.data import pipeline, synthetic, volumes as vio
    cfg = tiny_config
    vols, labs = synthetic.make_dataset(0, "mri", 1, 8, 32)
    ds = vio.volumes_to_slices(vols, labs)
    data = pipeline.to_device_arrays(ds, cfg.data.num_classes)

    state = source.init_state(jax.random.key(0), cfg)
    step = jax.jit(source.make_train_step(cfg, sample_from_device=True))
    s2, m = step(state, data, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    # different rng -> different sampled batch -> different loss
    _, m2 = step(state, data, jax.random.key(2))
    assert float(m["loss"]) != float(m2["loss"])

    ct_vols, _ = synthetic.make_dataset(0, "ct", 1, 8, 32)
    tgt = pipeline.to_device_arrays(vio.volumes_to_slices(ct_vols))
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    a_step = jax.jit(adapt.make_adapt_step(cfg, sample_from_device=True))
    a2, am = a_step(a_state, {"src": data, "tgt": tgt}, jax.random.key(3))
    assert np.isfinite(float(am["d_loss"]))
    assert np.isfinite(float(am["g_loss"]))


def test_adapt_with_multi_level_critic(tiny_config):
    """BASELINE config 5: one critic per tap, summed losses — full train
    step must run and move both stacks."""
    import dataclasses
    cfg = dataclasses.replace(tiny_config, critic=dataclasses.replace(
        tiny_config.critic, mode="multi"))
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    assert set(state.critic_params["stacks"]) == set(cfg.critic.taps)
    batch = {"src_image": _batch(cfg, 0, "mri")["image"],
             "tgt_image": _batch(cfg, 0, "ct")["image"]}
    step = jax.jit(adapt.make_adapt_step(cfg, augment=False))
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["d_loss"]))
    for t in cfg.critic.taps:
        moved = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(state.critic_params["stacks"][t]),
            jax.tree.leaves(new_state.critic_params["stacks"][t])))
        assert moved > 0


def test_checkpoint_prune(tmp_path, tiny_config):
    import jax as _jax
    from mcmda_tpu.train import source as src_mod
    from mcmda_tpu.utils import checkpoint as ck
    st = src_mod.init_state(_jax.random.key(0), tiny_config)
    for s in (5, 10, 15, 20):
        ck.save(str(tmp_path), st, step=s)
    # newest=20: the just-issued async save may not have materialized any
    # directory yet, in which case the listdir inventory undercounts — the
    # hint is the documented call pattern for prune-right-after-save
    ck.prune(str(tmp_path), keep=2, newest=20)
    ck.wait_pending()  # commit the (possibly) in-flight async save of 20
    assert ck.latest_step(str(tmp_path)) == 20
    import os
    steps = sorted(n for n in os.listdir(tmp_path) if n.startswith("step_"))
    assert steps == ["step_00000015", "step_00000020"]


def test_prune_newest_hint_covers_unmaterialized_save(tmp_path):
    """Regression (r3 flake): an async save issued right before prune may
    not have created ANY directory yet, so the listdir inventory undercounts
    and prune keeps one extra old step.  The ``newest`` hint makes the
    inventory deterministic.  Simulated here with committed saves only —
    newest=20 with no step_20 on disk is exactly what prune sees when it
    loses that race."""
    import jax as _jax
    from mcmda_tpu.train import source as src_mod
    from mcmda_tpu.utils import checkpoint as ck
    st = src_mod.init_state(_jax.random.key(0), _tiny_for_ckpt())
    for s in (5, 10, 15):
        ck.save(str(tmp_path), st, step=s)
    ck.wait_pending()
    ck.prune(str(tmp_path), keep=2, newest=20)
    import os
    steps = sorted(n for n in os.listdir(tmp_path) if n.startswith("step_"))
    # inventory = {5,10,15,20} -> keep {15,20}: both 5 AND 10 go
    assert steps == ["step_00000015"]


def test_d_acc_cap_throttles_critic(adapt_setup):
    """With cap 0.0 the critic update is always gated off: a gated step is a
    TRUE no-op — params AND optimizer state (Adam moments, schedule count)
    hold, so the critic resumes exactly where it paused."""
    import dataclasses
    cfg, state, batch = adapt_setup
    cfg_t = dataclasses.replace(cfg, adapt=dataclasses.replace(
        cfg.adapt, d_acc_cap=0.0))
    step = jax.jit(adapt.make_adapt_step(cfg_t, train_g=False, augment=False))
    new_state, m = step(state, batch, jax.random.key(0))
    for a, b in zip(jax.tree.leaves(state.critic_params),
                    jax.tree.leaves(new_state.critic_params)):
        np.testing.assert_allclose(a, b)
    for a, b in zip(jax.tree.leaves(state.opt_d_state),
                    jax.tree.leaves(new_state.opt_d_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_r1_penalty_changes_d_loss(adapt_setup):
    import dataclasses
    cfg, state, batch = adapt_setup
    cfg_r1 = dataclasses.replace(cfg, adapt=dataclasses.replace(
        cfg.adapt, r1_gamma=10.0))
    step0 = jax.jit(adapt.make_adapt_step(cfg, train_g=False, augment=False))
    step1 = jax.jit(adapt.make_adapt_step(cfg_r1, train_g=False,
                                          augment=False))
    _, m0 = step0(state, batch, jax.random.key(0))
    _, m1 = step1(state, batch, jax.random.key(0))
    assert float(m1["d_loss"]) > float(m0["d_loss"])  # penalty adds
    assert np.isfinite(float(m1["d_loss"]))


def test_kd_kg_ratio(tiny_config, adapt_setup):
    cfg, state, batch = adapt_setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, adapt=dataclasses.replace(cfg.adapt,
                                                              k_d=2, k_g=1))
    step = jax.jit(adapt.make_adapt_step(cfg2, augment=False))
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert "d_loss" in metrics and "g_loss" in metrics


def test_equilibrium_selector(tmp_path):
    """Unsupervised checkpoint selection: picks the step whose smoothed
    |d_acc - 0.5| is smallest after warmup, and persists selection.json."""
    sel = adapt.EquilibriumSelector(ema=0.0, warmup_step=20)
    # healthy equilibrium at step 40, collapse (d_acc -> 1) afterwards
    trace = [(10, 0.55), (20, 0.95), (30, 0.7), (40, 0.52), (50, 0.9),
             (60, 0.99)]
    for step, acc in trace:
        sel.update(step, {"d_acc": acc})
    assert sel.best_step == 40
    sel.save(str(tmp_path))
    import json
    with open(tmp_path / "selection.json") as f:
        rec = json.load(f)
    assert rec["best_step"] == 40 and rec["signal"] == "critic_equilibrium"


def test_prune_protects_selected_step(tmp_path):
    import jax as _jax
    from mcmda_tpu.train import source as src_mod
    from mcmda_tpu.utils import checkpoint as ck
    st = src_mod.init_state(_jax.random.key(0), _tiny_for_ckpt())
    for s in (5, 10, 15, 20):
        ck.save(str(tmp_path), st, step=s)
    ck.prune(str(tmp_path), keep=2, protect={5}, newest=20)
    ck.wait_pending()
    import os
    steps = sorted(n for n in os.listdir(tmp_path) if n.startswith("step_"))
    assert "step_00000005" in steps and "step_00000020" in steps
    assert "step_00000010" not in steps


def _tiny_for_ckpt():
    from mcmda_tpu import config as cm
    return cm.ExperimentConfig(
        segmenter=cm.SegmenterConfig(stages=(
            cm.StageSpec("stem", 8, 1, 1, 1), cm.StageSpec("rm1", 8, 2, 1, 1),
            cm.StageSpec("rm2", 16, 2, 1, 1),
            cm.StageSpec("rm3", 16, 1, 2, 1))),
        data=cm.DataConfig(slice_size=32, batch_size=2))


def test_dam_ema_weight_averaging(tiny_config):
    """adapt.dam_ema > 0: bias-corrected weight average.  After one folded
    step the debiased average EQUALS that step's weights; after two it is the
    correctly-weighted mix; dam_ema == 0 leaves the average untouched."""
    import dataclasses
    cfg = dataclasses.replace(tiny_config, adapt=dataclasses.replace(
        tiny_config.adapt, dam_ema=0.5))
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    batch = {"src_image": _batch(cfg, 0, "mri")["image"],
             "tgt_image": _batch(cfg, 0, "ct")["image"]}
    step = jax.jit(adapt.make_adapt_step(cfg, augment=False))
    s1, _ = step(state, batch, jax.random.key(2))
    # debiased avg after ONE fold == exactly the step-1 weights (no
    # contamination from the init weights — the bias-correction property)
    dam_avg, _bn_avg = adapt.eval_weights(s1, use_avg=True)
    for e, b in zip(jax.tree.leaves(dam_avg), jax.tree.leaves(s1.dam_params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(b), atol=1e-6)
    s2, _ = step(s1, batch, jax.random.key(3))
    # after two folds with decay d: (d*w1 + w2) / (d + 1)
    dam_avg2, _ = adapt.eval_weights(s2, use_avg=True)
    for e, w1, w2 in zip(jax.tree.leaves(dam_avg2),
                         jax.tree.leaves(s1.dam_params),
                         jax.tree.leaves(s2.dam_params)):
        np.testing.assert_allclose(
            np.asarray(e),
            (0.5 * np.asarray(w1) + np.asarray(w2)) / 1.5, atol=1e-5)
    p_live = jax.jit(adapt.adapted_forward(cfg))(s2, batch["tgt_image"])
    p_avg = jax.jit(adapt.adapted_forward(cfg, use_avg=True))(
        s2, batch["tgt_image"])
    assert float(jnp.abs(p_live - p_avg).max()) > 0

    cfg0 = tiny_config  # dam_ema defaults to 0
    state0 = adapt.init_state(jax.random.key(1), cfg0, src_params, src_bn)
    # averaging OFF -> the avg trees are never allocated (no checkpoint /
    # donation dead weight, VERDICT r2)
    assert state0.avg_dam is None and state0.ema_w is None
    s01, _ = jax.jit(adapt.make_adapt_step(cfg0, augment=False))(
        state0, batch, jax.random.key(2))
    assert s01.ema_w is None
    # use_avg with no average falls back to the live weights
    dam0, bn0 = adapt.eval_weights(s01, use_avg=True)
    for a, b in zip(jax.tree.leaves(dam0), jax.tree.leaves(s01.dam_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_dam_ema_equilibrium_gate(tiny_config):
    """ema_gate > 0: nothing folds in while the smoothed |d_acc-0.5| sits
    above the gate (ema_w stays 0); with an impossible-to-fail gate the
    average accumulates."""
    import dataclasses
    # eq_smooth starts at 0.25; with decay 0.9 it cannot drop below
    # 0.9^3 * 0.25 ~= 0.18 within 3 steps, so a 0.1 gate stays closed
    base = dataclasses.replace(tiny_config.adapt, dam_ema=0.5,
                               ema_gate_smooth=0.9)
    src_params, src_bn = segmenter.init(jax.random.key(0),
                                        tiny_config.segmenter)
    batch = {"src_image": _batch(tiny_config, 0, "mri")["image"],
             "tgt_image": _batch(tiny_config, 0, "ct")["image"]}
    closed = dataclasses.replace(tiny_config, adapt=dataclasses.replace(
        base, ema_gate=0.1))
    opened = dataclasses.replace(tiny_config, adapt=dataclasses.replace(
        base, ema_gate=10.0))   # always true
    for cfg, expect_fold in ((closed, False), (opened, True)):
        state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
        step = jax.jit(adapt.make_adapt_step(cfg, augment=False))
        for i in range(3):
            state, _ = step(state, batch, jax.random.key(10 + i))
        assert (float(state.ema_w) > 0) == expect_fold, cfg.adapt.ema_gate


def test_class_ratio_selector(tmp_path):
    """Class-ratio selection: picks the step whose predicted class fractions
    are L1-closest to the source label marginals; persists selection.json."""
    ref = np.array([0.9, 0.02, 0.02, 0.02, 0.04])
    sel = adapt.ClassRatioSelector(ref, warmup_step=20)
    trace = [
        (10, [0.90, 0.02, 0.02, 0.02, 0.04]),  # perfect but inside warmup
        (20, [0.96, 0.00, 0.01, 0.01, 0.02]),  # structures shrunk
        (30, [0.91, 0.02, 0.02, 0.02, 0.03]),  # near the prior  <- best
        (40, [0.99, 0.00, 0.00, 0.00, 0.01]),  # collapse
    ]
    for step, fr in trace:
        sel.update(step, fr)
    assert sel.best_step == 30
    sel.save(str(tmp_path))
    import json
    with open(tmp_path / "selection.json") as f:
        rec = json.load(f)
    assert rec["best_step"] == 30 and rec["signal"] == "class_ratio"
    assert rec["weights"] == "live"


def test_selector_tracks_weight_variant(tmp_path):
    """With dam_ema on, the probe scores BOTH the live DAM and the EMA
    average; selection.json must record WHICH variant won so evaluation uses
    the same net the selector ranked (VERDICT r2 coherence item)."""
    ref = np.array([0.9, 0.1])
    sel = adapt.ClassRatioSelector(ref, warmup_step=0)
    sel.update(10, [0.7, 0.3], variant="live")
    sel.update(10, [0.88, 0.12], variant="avg")   # avg wins step 10
    assert (sel.best_step, sel.best_variant) == (10, "avg")
    sel.update(20, [0.90, 0.10], variant="live")  # live wins overall
    sel.update(20, [0.80, 0.20], variant="avg")
    assert (sel.best_step, sel.best_variant) == (20, "live")
    sel.save(str(tmp_path))
    import json
    with open(tmp_path / "selection.json") as f:
        assert json.load(f)["weights"] == "live"


def test_selected_weights_resolution(tmp_path):
    """cli._selected_weights: returns the recorded variant only for the
    selected step's checkpoint path; None elsewhere."""
    import json
    from mcmda_tpu import cli
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "selection.json", "w") as f:
        json.dump({"signal": "class_ratio", "best_step": 30,
                   "best_score": 0.1, "weights": "avg"}, f)
    assert cli._selected_weights(str(run / "step_00000030")) == "avg"
    assert cli._selected_weights(str(run / "step_00000040")) is None
    assert cli._selected_weights(str(tmp_path / "other" / "step_00000030")) \
        is None
    # pre-variant selection.json (no "weights" key) -> None
    with open(run / "selection.json", "w") as f:
        json.dump({"signal": "class_ratio", "best_step": 30,
                   "best_score": 0.1}, f)
    assert cli._selected_weights(str(run / "step_00000030")) is None


def test_label_fractions_and_ratio_probe(tiny_config):
    """label_fractions sums to 1 and matches bincount; the jitted class-ratio
    probe equals a direct forward + argmax count on the same slices."""
    labs = [np.array([[0, 0], [1, 2]]), np.array([[0, 4], [4, 4]])]
    fr = adapt.label_fractions(labs, 5)
    np.testing.assert_allclose(fr, np.array([3, 1, 1, 0, 3]) / 8.0)

    cfg = tiny_config
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    imgs = np.asarray(_batch(cfg, 0, "ct")["image"])  # [B,H,W,ctx]
    probe = adapt.make_class_ratio_probe(cfg, imgs)
    got, ent = probe(state)
    got = np.asarray(got)
    assert np.isfinite(float(ent)) and float(ent) >= 0.0
    fwd = adapt.adapted_forward(cfg)
    preds = np.asarray(jnp.argmax(fwd(state, jnp.asarray(imgs)), -1))
    want = np.bincount(preds.reshape(-1), minlength=5) / preds.size
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6


def test_selection_probe_deferred_bookkeeping(tmp_path):
    """SelectionProbe reads each tick one call later: after N calls the
    selectors have seen ticks 1..N-1; flush() retires the last.  The stash
    holds the BEST tick's weights (captured at probe time, not at read
    time), selection.json is written, and device d_acc metrics reach the
    equilibrium selector without an eager host read."""
    import json
    ref = np.array([0.5, 0.5])
    cr = adapt.ClassRatioSelector(ref, warmup_step=0)
    eq = adapt.EquilibriumSelector(ema=0.0, warmup_step=0)

    def bundle(st):  # stub: state is a plain dict
        return {"fracs_live": jnp.asarray(st["fracs"]),
                "weights_live": (st["dam"], st["bn"])}

    probe = adapt.SelectionProbe(bundle, primary=cr, cr_selector=cr,
                                 eq_selector=eq, save_dir=str(tmp_path))
    ticks = [  # (step, fracs -> L1 score vs ref, dam marker, d_acc)
        (10, [0.9, 0.1], 1.0, 0.9),   # score 0.8
        (20, [0.55, 0.45], 2.0, 0.6),  # score 0.1  <- best
        (30, [0.8, 0.2], 3.0, 0.95),  # score 0.6
    ]
    for step, fracs, marker, dacc in ticks:
        st = {"fracs": np.asarray(fracs, np.float32),
              "dam": jnp.full((3,), marker), "bn": jnp.zeros(1)}
        probe(step, st, metrics={"d_acc": jnp.float32(dacc)})
    # tick 30 is still pending: selectors saw 10 and 20 only
    assert cr.best_step == 20
    probe.flush()
    assert cr.best_step == 20 and cr.best_variant == "live"
    assert eq.best_step == 20  # |0.6-0.5| is the smallest distance
    np.testing.assert_array_equal(
        np.asarray(probe.best_stash["dam_params"]), np.full((3,), 2.0))
    with open(tmp_path / "selection.json") as f:
        rec = json.load(f)
    assert rec["best_step"] == 20
    assert probe.protect_steps() == {20}
    probe.flush()  # idempotent with nothing pending


def test_select_bundle_copies_survive_donation(tiny_config):
    """make_select_bundle must return COPIES of the eval weights: train
    steps donate the state, so a pass-through reference would die with the
    next dispatch.  Simulated by deleting the state's buffers and reading
    the bundle output afterwards; fractions match the plain probe."""
    cfg = tiny_config
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    imgs = np.asarray(_batch(cfg, 0, "ct")["image"])
    want_fracs = np.asarray(adapt.make_class_ratio_probe(cfg, imgs)(state)[0])
    want_dam = jax.device_get(state.dam_params)

    bundle = adapt.make_select_bundle(cfg, imgs, dual=False)
    out = bundle(state)
    jax.block_until_ready(out)
    jax.tree.map(lambda a: a.delete(), state.dam_params)  # simulate donation
    got_dam, _got_bn = jax.device_get(out["weights_live"])
    jax.tree.map(np.testing.assert_array_equal, got_dam, want_dam)
    np.testing.assert_allclose(np.asarray(out["fracs_live"]), want_fracs,
                               atol=1e-6)


def test_bf16_compute_path(tiny_config):
    """compute_dtype=bfloat16: train + eval run finite, activations flow in
    bf16 (params stay f32 masters), and eval probs stay close to f32."""
    import dataclasses
    cfg16 = dataclasses.replace(tiny_config, segmenter=dataclasses.replace(
        tiny_config.segmenter, compute_dtype=jnp.bfloat16))
    batch = _batch(cfg16)
    st = source.init_state(jax.random.key(0), cfg16)
    step = jax.jit(source.make_train_step(cfg16, augment=False))
    st2, m = step(st, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    # master params remain f32 after the update
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(st2.params))

    probs16 = source.make_eval_forward(cfg16)(st.params, st.bn_state,
                                              batch["image"])
    probs32 = source.make_eval_forward(tiny_config)(st.params, st.bn_state,
                                                    batch["image"])
    # same weights, bf16 vs f32 activations: small numerical gap only
    assert float(jnp.abs(probs16.astype(jnp.float32) - probs32).mean()) < 0.02

    # adaptation step also runs under bf16
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg16.segmenter)
    a_state = adapt.init_state(jax.random.key(1), cfg16, src_params, src_bn)
    a_batch = {"src_image": _batch(cfg16, 0, "mri")["image"],
               "tgt_image": _batch(cfg16, 0, "ct")["image"]}
    a_step = jax.jit(adapt.make_adapt_step(cfg16, augment=False))
    _, am = a_step(a_state, a_batch, jax.random.key(2))
    assert np.isfinite(float(am["d_loss"])) and np.isfinite(float(am["g_loss"]))


def test_probe_masks_padding_rows(tiny_config):
    """ADVICE r2: padded probe rows (repeats of the last slice) must not
    count toward the predicted class fractions — probing N slices and
    probing the same N with padding must agree exactly."""
    cfg = tiny_config
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    b = cfg.data.batch_size
    imgs = np.asarray(_batch(cfg, 3, "ct")["image"])  # [B,H,W,ctx]
    n = b + 1  # forces (2*b - n) padded rows
    stacked = np.concatenate([imgs, imgs[:1]], 0)[:n]
    probe = adapt.make_class_ratio_probe(cfg, stacked)
    got, ent_pad = probe(state)
    got = np.asarray(got)
    fwd = adapt.adapted_forward(cfg)
    probs = fwd(state, jnp.asarray(stacked))
    preds = np.asarray(jnp.argmax(probs, -1))
    want = np.bincount(preds.reshape(-1), minlength=5) / preds.size
    np.testing.assert_allclose(got, want, atol=1e-6)
    # entropy must mask padding the same way: mean per-pixel entropy over
    # the N real slices only
    p = np.clip(np.asarray(probs, np.float64), 1e-8, 1.0)
    want_ent = float((-(p * np.log(p)).sum(-1)).mean())
    np.testing.assert_allclose(float(ent_pad), want_ent, rtol=1e-4)


def test_prune_removes_stale_tmp_dirs(tmp_path, tiny_config):
    """ADVICE r2: a crashed run's .orbax-checkpoint-tmp dir counts toward the
    inventory; once its step is pruned the tmp dir must go too, or it pins a
    keep slot forever."""
    import os
    import jax as _jax
    from mcmda_tpu.train import source as src_mod
    from mcmda_tpu.utils import checkpoint as ck
    st = src_mod.init_state(_jax.random.key(0), tiny_config)
    for s in (5, 10, 15):
        ck.save(str(tmp_path), st, step=s)
    ck.wait_pending()
    stale = tmp_path / "step_00000005.orbax-checkpoint-tmp-1234"
    stale.mkdir()
    ck.prune(str(tmp_path), keep=2)
    assert not stale.exists()
    names = sorted(n for n in os.listdir(tmp_path) if n.startswith("step_"))
    assert names == ["step_00000010", "step_00000015"]


def test_selective_precision_adapt_step(tiny_config):
    """Selective precision (VERDICT r2 item 2): the D-phase target forward
    can run bf16 (adapt.tgt_feats_bf16) because it carries no DAM gradient —
    the step must run finite, keep f32 master params, and actually change
    the critic's view (d_loss moves vs the f32 D-phase).  The full-bf16
    backbone must also run finite with f32 masters."""
    import dataclasses
    batch = {"src_image": _batch(tiny_config, 0, "mri")["image"],
             "tgt_image": _batch(tiny_config, 0, "ct")["image"]}
    src_params, src_bn = segmenter.init(jax.random.key(0),
                                        tiny_config.segmenter)
    outs = {}
    for flag in (True, False):
        cfg = dataclasses.replace(
            tiny_config,
            adapt=dataclasses.replace(tiny_config.adapt,
                                      tgt_feats_bf16=flag))
        state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
        step = jax.jit(adapt.make_adapt_step(cfg, augment=False))
        s1, m = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(s1.dam_params))
        outs[flag] = float(m["d_loss"])
    assert outs[True] != outs[False]

    # full-bf16 backbone (the quality-measured recipe) still runs finite
    cfg16 = dataclasses.replace(
        tiny_config, segmenter=dataclasses.replace(
            tiny_config.segmenter, compute_dtype=jnp.bfloat16))
    state = adapt.init_state(jax.random.key(1), cfg16, src_params, src_bn)
    s1, m = jax.jit(adapt.make_adapt_step(cfg16, augment=False))(
        state, batch, jax.random.key(2))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(s1.dam_params))


def test_feat_mmd_sees_variance_mismatch(adapt_setup):
    """feat_mmd (linear MMD^2 with phi=(x, x^2)) must flag a target path
    whose tap features match the source's channel MEANS but not variances —
    the partial-alignment failure the first-moment feat_div is blind to.
    Both metrics come out of a real adapt step; here we check the math on
    the same formula the step computes."""
    cfg, state, batch = adapt_setup
    step = adapt.make_adapt_step(cfg)
    _, metrics = step(state, batch, jax.random.key(0))
    assert float(metrics["feat_mmd"]) >= float(metrics["feat_div"]) >= 0.0

    # direct formula check: same means, different variances
    k = jax.random.key(1)
    f_src = jax.random.normal(k, (4, 8, 8, 16))
    f_tgt = f_src * 2.0 - jnp.mean(f_src * 2.0, axis=(0, 1, 2),
                                   keepdims=True) \
        + jnp.mean(f_src, axis=(0, 1, 2), keepdims=True)
    mu_s = jnp.mean(f_src, axis=(0, 1, 2))
    mu_t = jnp.mean(f_tgt, axis=(0, 1, 2))
    m2_s = jnp.mean(jnp.square(f_src), axis=(0, 1, 2))
    m2_t = jnp.mean(jnp.square(f_tgt), axis=(0, 1, 2))
    fd = float(jnp.mean(jnp.square(mu_s - mu_t)))      # ~0: means match
    ft = float(jnp.mean(jnp.square(m2_s - m2_t)))      # >0: variances differ
    assert fd < 1e-8
    assert ft > 1e-3


def test_shared_tgt_forward_matches_two_forward_oracle(adapt_setup):
    """adapt.share_tgt_fwd (one vjp'd target forward feeding both phases)
    is bit-equivalent math to the two-forward oracle: identical parameter
    trajectories and metrics over several steps, incl. k_d/k_g > 1."""
    import dataclasses

    cfg, state0, batch = adapt_setup
    for kd, kg in ((1, 1), (2, 2)):
        cfg_kd = dataclasses.replace(
            cfg, adapt=dataclasses.replace(cfg.adapt, k_d=kd, k_g=kg))
        cfg_ref = dataclasses.replace(
            cfg_kd, adapt=dataclasses.replace(cfg_kd.adapt,
                                              share_tgt_fwd=False))
        step = jax.jit(adapt.make_adapt_step(cfg_kd, augment=False))
        step_ref = jax.jit(adapt.make_adapt_step(cfg_ref, augment=False))
        s_a, s_b = state0, state0
        for i in range(3):
            s_a, m_a = step(s_a, batch, jax.random.key(i))
            s_b, m_b = step_ref(s_b, batch, jax.random.key(i))
        for a, b in zip(jax.tree.leaves((s_a.dam_params, s_a.critic_params,
                                         s_a.tgt_bn, s_a.opt_g_state)),
                        jax.tree.leaves((s_b.dam_params, s_b.critic_params,
                                         s_b.tgt_bn, s_b.opt_g_state))):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
        for k in m_a:
            np.testing.assert_allclose(np.asarray(m_a[k]),
                                       np.asarray(m_b[k]),
                                       rtol=2e-5, atol=2e-6)


def test_batch_critic_grad_equivalence(adapt_setup):
    """adapt.batch_critic's mathematical claim, at function level: one
    critic apply on [f_src; f_tgt] is per-sample math, so at IDENTICAL
    parameters the D loss matches the two-apply oracle to fp ulps and the
    critic gradient to fp summation-order noise (measured ~1e-7 abs vs
    grads O(0.26)) — with r1_gamma both off and on.  Trajectory-level
    equivalence under Adam is asserted separately (below): Adam's step-1
    normalization lr*g/(sqrt(g^2)+eps) ~ lr*sign(g) amplifies an fp-noise
    sign flip on a near-zero gradient component into an O(lr) parameter
    difference, which no fp-equivalent-but-not-bit-equal program pair can
    beat."""
    from mcmda_tpu.models import critic as critic_mod
    from mcmda_tpu.ops import losses as losses_mod

    cfg, state0, batch = adapt_setup
    cr_cfg = cfg.critic
    d_loss_fn, _ = losses_mod.gan_losses(cfg.adapt.gan_loss)
    key = jax.random.key(7)
    # random feature taps with the segmenter's tap shapes/statistics stand
    # in for f_src/f_tgt: the property under test is about the critic alone
    shapes = {"rm4": (4, 8, 8, 24), "rm5": (4, 8, 8, 24)}
    ks = jax.random.split(key, 2 * len(shapes))
    f_src = {t: jax.random.normal(ks[i], s)
             for i, (t, s) in enumerate(shapes.items())}
    f_tgt = {t: jax.random.normal(ks[len(shapes) + i], s)
             for i, (t, s) in enumerate(shapes.items())}

    def make_loss(batch_mode, r1_gamma):
        def loss(critic_params):
            if batch_mode:
                n = f_src[cr_cfg.taps[0]].shape[0]
                f_both = {t: jnp.concatenate([f_src[t], f_tgt[t]], axis=0)
                          for t in cr_cfg.taps}
                l = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_both, cr_cfg))
                l_s, l_t = l[:n], l[n:]
            else:
                l_s = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_src, cr_cfg))
                l_t = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_tgt, cr_cfg))
            dl = d_loss_fn(l_s, l_t, cfg.adapt.label_smooth)
            if r1_gamma > 0:
                def d_sum(taps):
                    sel = {t: taps[t] for t in cr_cfg.taps}
                    return jnp.sum(critic_mod.flatten_logits(
                        critic_mod.apply(critic_params, sel, cr_cfg)))
                gf = jax.grad(d_sum)({t: f_src[t] for t in cr_cfg.taps})
                n = f_src[cr_cfg.taps[0]].shape[0]
                r1 = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(gf))
                dl = dl + 0.5 * r1_gamma * r1 / n
            return dl
        return loss

    for r1 in (0.0, 0.1):
        vals, grads = {}, {}
        for bc in (True, False):
            vals[bc], grads[bc] = jax.jit(
                jax.value_and_grad(make_loss(bc, r1)))(state0.critic_params)
        assert float(vals[True]) == pytest.approx(float(vals[False]),
                                                  abs=1e-6), r1
        for ga, gb in zip(jax.tree.leaves(grads[True]),
                          jax.tree.leaves(grads[False])):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-4, atol=2e-6)


def test_batch_critic_matches_two_apply_oracle(adapt_setup):
    """Trajectory-level: adapt.batch_critic matches the two-apply oracle
    over 3 Adam steps at Adam-realistic tolerance.  The concat-batch and
    twin-apply critics compile to DIFFERENT XLA programs whose outputs
    differ by fp summation-order noise (~1e-7; losses bit-equal, gradients
    to 1.0e-7 abs — see test_batch_critic_grad_equivalence for the tight
    function-level claim), and Adam's normalization lr*g/(sqrt(v)+eps)
    sign-amplifies that noise on near-zero gradient components into O(lr)
    per-step divergence: measured 7.9e-5 after one step, 8.8e-4 after
    three, r1 on or off (root-caused round 5).  Precedent:
    tests/test_parallel.py uses 5e-4 after ONE step for the same reason."""
    import dataclasses

    cfg, state0, batch = adapt_setup
    for r1, rtol, atol in ((0.0, 5e-2, 5e-3), (0.1, 5e-2, 5e-3)):
        cfg_b = dataclasses.replace(
            cfg, adapt=dataclasses.replace(cfg.adapt, batch_critic=True,
                                           r1_gamma=r1))
        cfg_ref = dataclasses.replace(
            cfg_b, adapt=dataclasses.replace(cfg_b.adapt,
                                             batch_critic=False))
        step = jax.jit(adapt.make_adapt_step(cfg_b, augment=False))
        step_ref = jax.jit(adapt.make_adapt_step(cfg_ref, augment=False))
        s_a, s_b = state0, state0
        for i in range(3):
            s_a, m_a = step(s_a, batch, jax.random.key(i))
            s_b, m_b = step_ref(s_b, batch, jax.random.key(i))
        for a, b in zip(jax.tree.leaves((s_a.dam_params, s_a.critic_params,
                                         s_a.tgt_bn, s_a.opt_g_state)),
                        jax.tree.leaves((s_b.dam_params, s_b.critic_params,
                                         s_b.tgt_bn, s_b.opt_g_state))):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        for k in m_a:
            np.testing.assert_allclose(np.asarray(m_a[k]),
                                       np.asarray(m_b[k]),
                                       rtol=rtol, atol=atol)


def test_cr_ent_reservoir_selection(tmp_path):
    """select_policy="cr_ent": the selector keeps the topk lowest-cr
    candidates and picks by 2*rank(cr)+rank(ent) within them; the probe
    stash holds exactly the reservoir and best_stash follows the pick even
    when it moves to an OLDER step."""
    import json
    ref = np.array([0.5, 0.5])
    cr = adapt.ClassRatioSelector(ref, warmup_step=0, policy="cr_ent",
                                  topk=2)

    def bundle(st):
        return {"fracs_live": jnp.asarray(st["fracs"]),
                "ent_live": jnp.float32(st["ent"]),
                "weights_live": (jnp.full((2,), st["marker"]),
                                 jnp.zeros(1))}

    probe = adapt.SelectionProbe(bundle, primary=cr, cr_selector=cr,
                                 save_dir=str(tmp_path))
    # (step, fracs -> cr score, ent, marker)
    ticks = [
        (10, [0.60, 0.40], 0.30, 1.0),  # cr 0.2
        (20, [0.55, 0.45], 0.90, 2.0),  # cr 0.1 — best cr, but high ent
        (30, [0.57, 0.43], 0.10, 3.0),  # cr 0.14, lowest ent
        (40, [0.90, 0.10], 0.01, 4.0),  # cr 0.8 — never enters topk=2
    ]
    for step, fracs, ent, marker in ticks:
        probe(step, {"fracs": np.asarray(fracs, np.float32), "ent": ent,
                     "marker": marker})
    probe.flush()
    # reservoir = {20 (cr rank 0, ent rank 1 -> 1), 30 (cr rank 1, ent
    # rank 0 -> 2)}: step 20 wins 2*0+1 < 2*1+0
    assert cr.best_step == 20
    assert {s for s, _ in cr.keep_steps()} == {20, 30}
    assert probe.protect_steps() == {20, 30}
    np.testing.assert_array_equal(
        np.asarray(probe.best_stash["dam_params"]), np.full((2,), 2.0))
    rec = json.load(open(tmp_path / "selection.json"))
    assert rec["policy"] == "cr_ent" and rec["best_step"] == 20
    assert len(rec["reservoir"]) == 2

    # a later candidate with mid cr and tiny ent flips the pick to ITSELF,
    # evicting step 30; the stash must still hold the new pick's weights
    probe(50, {"fracs": np.asarray([0.56, 0.44], np.float32), "ent": 0.05,
               "marker": 5.0})
    probe.flush()
    # reservoir = {20: cr 0.1 ent 0.9 -> 2*0+1=1, 50: cr 0.12 ent 0.05 ->
    # 2*1+0=2}: 20 still wins on cr rank
    assert cr.best_step == 20
    assert {s for s, _ in cr.keep_steps()} == {20, 50}
    # step 30's stash entry must be pruned
    assert (30, "live") not in probe._stash and (50, "live") in probe._stash


def test_cr_ent_pick_moves_to_older_step(tmp_path):
    """When a new LOW-cr high-ent candidate enters, the rank combo can move
    the pick to an older reservoir member whose weights were stashed ticks
    ago — best_stash must produce that older snapshot."""
    ref = np.array([0.5, 0.5])
    cr = adapt.ClassRatioSelector(ref, warmup_step=0, policy="cr_ent",
                                  topk=3)

    def bundle(st):
        return {"fracs_live": jnp.asarray(st["fracs"]),
                "ent_live": jnp.float32(st["ent"]),
                "weights_live": (jnp.full((2,), st["marker"]),
                                 jnp.zeros(1))}

    probe = adapt.SelectionProbe(bundle, primary=cr, cr_selector=cr)
    ticks = [
        (10, [0.58, 0.42], 0.10, 1.0),  # cr 0.16, ent lowest
        (20, [0.56, 0.44], 0.50, 2.0),  # cr 0.12
        (30, [0.55, 0.45], 0.80, 3.0),  # cr 0.10, ent highest
    ]
    for step, fracs, ent, marker in ticks:
        probe(step, {"fracs": np.asarray(fracs, np.float32), "ent": ent,
                     "marker": marker})
    probe.flush()
    # ranks: cr -> 30:0 20:1 10:2; ent -> 10:0 20:1 30:2
    # scores: 30 -> 2, 20 -> 3, 10 -> 4: step 30 wins
    assert cr.best_step == 30
    np.testing.assert_array_equal(
        np.asarray(probe.best_stash["dam_params"]), np.full((2,), 3.0))


def test_cr_ent_ranked_order():
    """ranked() returns the reservoir sorted by 2*rank(cr)+rank(ent),
    best first, and its head IS the repicked best."""
    ref = np.array([0.5, 0.5])
    cr = adapt.ClassRatioSelector(ref, warmup_step=0, policy="cr_ent",
                                  topk=4)
    ticks = [(10, [0.58, 0.42], 0.10), (20, [0.56, 0.44], 0.50),
             (30, [0.55, 0.45], 0.80), (40, [0.57, 0.43], 0.20)]
    for step, fracs, ent in ticks:
        cr.update(step, np.asarray(fracs), ent=ent)
    # crs: 30:0.10 20:0.12 40:0.14 10:0.16 (ranks 0/1/2/3)
    # ents: 10:0.10 40:0.20 20:0.50 30:0.80 (ranks 0/1/2/3)
    # scores: 30=2*0+3=3, 20=2*1+2=4, 40=2*2+1=5, 10=2*3+0=6
    order = cr.ranked()
    assert [c["step"] for c in order] == [30, 20, 40, 10]
    assert order[0]["step"] == cr.best_step
    # scores must be non-decreasing under the rank combo
    crs = np.asarray([c["cr"] for c in cr.reservoir])
    ents = np.asarray([c["ent"] for c in cr.reservoir])
    score = {c["step"]: s for c, s in zip(
        cr.reservoir, 2.0 * crs.argsort().argsort()
        + ents.argsort().argsort())}
    assert all(score[a["step"]] <= score[b["step"]]
               for a, b in zip(order, order[1:]))


def test_cr_ent_ent_none_warns():
    """policy='cr_ent' with ent=None falls back to plain cr recording but
    WARNS (the production bundle always supplies ent; silent mixed
    sequences corrupt the reservoir/stash contract — ADVICE r4)."""
    cr = adapt.ClassRatioSelector(np.array([0.5, 0.5]), warmup_step=0,
                                  policy="cr_ent")
    with pytest.warns(UserWarning, match="ent=None"):
        cr.update(10, np.asarray([0.6, 0.4]))
    # the plain-cr fallback still records a best
    assert cr.best_step == 10 and cr.reservoir == []


def test_shared_fwd_kg0_skips_g_update(adapt_setup):
    """share_tgt_fwd with k_g=0 (train_g=True) must perform ZERO DAM
    updates — the shared-vjp G step is guarded on k_g > 0 (ADVICE r4)."""
    import dataclasses

    cfg, state0, batch = adapt_setup
    cfg0 = dataclasses.replace(
        cfg, adapt=dataclasses.replace(cfg.adapt, k_g=0,
                                       share_tgt_fwd=True))
    step = jax.jit(adapt.make_adapt_step(cfg0))
    s1, metrics = step(state0, batch, jax.random.key(3))
    for a, b in zip(jax.tree.leaves(state0.dam_params),
                    jax.tree.leaves(s1.dam_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the critic still trains
    changed = any(
        float(jnp.abs(a - b).sum()) > 0
        for a, b in zip(jax.tree.leaves(state0.critic_params),
                        jax.tree.leaves(s1.critic_params)))
    assert changed


def _offline_smoothed_pick(steps, fracs, ents, ref, w, policy="cr",
                           topk=16):
    """Reference replay of the smoothed policy (scripts/policy_search.py
    semantics): centered w-tick boxcar over the raw streams, shorter
    windows at both edges, then the plain/cr_ent pick."""
    fr = np.asarray(fracs, np.float64)
    en = np.asarray(ents, np.float64)
    h = w // 2
    n = len(steps)
    fr_s = np.stack([fr[max(0, i - h):min(n, i + h + 1)].mean(0)
                     for i in range(n)])
    en_s = np.asarray([en[max(0, i - h):min(n, i + h + 1)].mean()
                       for i in range(n)])
    cr = np.abs(fr_s - ref).sum(1)
    if policy == "cr":
        return steps[int(np.argmin(cr))]
    idx = np.argsort(cr)[:topk]
    s = 2.0 * cr[idx].argsort().argsort() + en_s[idx].argsort().argsort()
    return steps[idx[int(np.argmin(s))]]


@pytest.mark.parametrize("policy", ["cr", "cr_ent"])
def test_smoothed_selector_matches_offline_replay(policy):
    """Streaming ClassRatioSelector(smooth_window=3) + finalize() picks the
    SAME step as the offline boxcar replay the policy was validated with
    (results/policy_prereg_r5.json), including the truncated edge windows."""
    rng = np.random.default_rng(7)
    ref = np.array([0.6, 0.3, 0.1])
    steps = [100 * (i + 1) for i in range(25)]
    fracs = rng.dirichlet((2.0, 1.0, 0.5), size=len(steps))
    ents = rng.uniform(0.1, 1.0, size=len(steps))
    sel = adapt.ClassRatioSelector(ref, warmup_step=0, policy=policy,
                                   topk=8, smooth_window=3)
    for s, fr, en in zip(steps, fracs, ents):
        sel.update(s, fr, ent=float(en))
    sel.finalize()
    want = _offline_smoothed_pick(steps, fracs, ents, ref, 3,
                                  policy=policy, topk=8)
    assert sel.best_step == want


def test_smoothed_selector_pending_keep_and_warmup():
    """Unresolved ticks stay in keep_steps() (their weights must remain
    stashed until the window closes) and pre-warmup ticks are excluded from
    smoothing windows, matching the warmup-filtered offline replay."""
    ref = np.array([0.5, 0.5])
    sel = adapt.ClassRatioSelector(ref, warmup_step=15, smooth_window=3)
    sel.update(10, [0.9, 0.1])          # pre-warmup: not buffered
    assert sel.keep_steps() == set()
    sel.update(20, [0.8, 0.2])          # buffered, unresolved
    assert (20, "live") in sel.keep_steps()
    sel.update(30, [0.55, 0.45])        # resolves tick 20 = mean(20,30)
    # tick 20's smoothed score: L1(mean([0.8,0.2],[0.55,0.45]), ref) = 0.35
    assert sel.best_step == 20
    assert abs(sel.best_score - 0.35) < 1e-12
    # tick 30 still pending
    assert (30, "live") in sel.keep_steps()
    sel.finalize()
    # tick 30 resolves as mean(20, 30, 30-edge) -> window [20, 30]
    assert sel._next["live"] == 2


def test_smoothed_probe_tail_pick(tmp_path):
    """End-to-end SelectionProbe with smoothing: the best tick resolves
    only at finalize() (tail window), and best_stash holds ITS weights."""
    import json
    ref = np.array([0.5, 0.5])
    cr = adapt.ClassRatioSelector(ref, warmup_step=0, smooth_window=3)

    def bundle(st):
        return {"fracs_live": jnp.asarray(st["fracs"]),
                "weights_live": (jnp.full((2,), st["marker"]),
                                 jnp.zeros(1))}

    probe = adapt.SelectionProbe(bundle, primary=cr, cr_selector=cr,
                                 save_dir=str(tmp_path))
    ticks = [   # the LAST tick has the best smoothed score
        (10, [0.95, 0.05], 1.0),
        (20, [0.90, 0.10], 2.0),
        (30, [0.60, 0.40], 3.0),
        (40, [0.52, 0.48], 4.0),   # smoothed window [30, 40]: cr 0.12
    ]
    for step, fracs, marker in ticks:
        probe(step, {"fracs": np.asarray(fracs, np.float32),
                     "marker": marker})
    probe.finalize()
    assert cr.best_step == 40
    np.testing.assert_array_equal(
        np.asarray(probe.best_stash["dam_params"]), np.full((2,), 4.0))
    sel = json.load(open(tmp_path / "selection.json"))
    assert sel["best_step"] == 40 and sel["smooth_window"] == 3


def test_smooth_window_from_config():
    """Span (steps) -> ticks conversion: round, force odd DOWN, min 1."""
    import dataclasses
    from mcmda_tpu import config as cfg_mod

    def w(span, every):
        cfg = cfg_mod.ExperimentConfig()
        cfg = dataclasses.replace(cfg, adapt=dataclasses.replace(
            cfg.adapt, select_smooth_span=span, select_every=every))
        return adapt.smooth_window(cfg)

    assert w(0, 100) == 1        # off (default)
    assert w(300, 100) == 3      # the ct2mri shipped geometry
    assert w(300, 250) == 1      # mri2ct cadence: rounds to no-op
    assert w(500, 100) == 5
    assert w(200, 100) == 1      # even -> rounded down to odd
