"""High-level API smoke: the documented three-call workflow end-to-end on a
tiny synthetic problem (configs 2 -> 3+4 -> 1/5), plus resume semantics."""

import dataclasses


from mcmda_tpu import api
from mcmda_tpu.data import synthetic


def test_three_call_workflow(tiny_config, tmp_path):
    cfg = dataclasses.replace(
        tiny_config,
        source=dataclasses.replace(tiny_config.source, steps=40),
        adapt=dataclasses.replace(tiny_config.adapt, steps=20,
                                  pretrain_steps=10),
        run=dataclasses.replace(tiny_config.run, ckpt_every=20, log_every=0))
    mri_v, mri_l = synthetic.make_dataset(0, "mri", 2, 8, 32)
    ct_v, ct_l = synthetic.make_dataset(0, "ct", 2, 8, 32)

    src = api.train_source(cfg, mri_v, mri_l, out_dir=str(tmp_path / "src"))
    assert int(src.step) == 40
    table0 = api.evaluate(cfg, src, ct_v[1:], ct_l[1:])
    assert 0.0 <= table0["mean"]["dice"] <= 1.0

    ad = api.adapt(cfg, src, mri_v, mri_l, ct_v[:1],
                   out_dir=str(tmp_path / "ad"))
    assert int(ad.step) == 30  # 10 pretrain + 20 adapt
    table1 = api.evaluate(cfg, ad, ct_v[1:], ct_l[1:])
    assert "AA" in table1 and "mean" in table1
    # unsupervised class-ratio checkpoint selection ran and persisted
    import json
    with open(tmp_path / "ad" / "selection.json") as f:
        assert json.load(f)["signal"] == "class_ratio"

    # resume: calling again with same out_dir continues from the checkpoint
    src2 = api.train_source(cfg, mri_v, mri_l, out_dir=str(tmp_path / "src"))
    assert int(src2.step) == 40  # already done -> no extra steps


def test_load_config_default_and_file(tmp_path):
    cfg = api.load_config(None)
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    cfg2 = api.load_config(str(p))
    assert cfg2.segmenter.stages == cfg.segmenter.stages


def test_api_dp_workflow(tiny_config, tmp_path):
    """api.train_source/adapt with dp=8 run the CLI's shard_map execution
    (drivers.py) end-to-end: device-resident feeds, selection, and a state
    equivalent in structure to the single-device path (VERDICT r2 item 7:
    library/CLI parity for parallel execution)."""
    import jax
    assert jax.device_count() >= 8
    cfg = dataclasses.replace(
        tiny_config,
        source=dataclasses.replace(tiny_config.source, steps=8),
        adapt=dataclasses.replace(tiny_config.adapt, steps=8,
                                  pretrain_steps=4),
        run=dataclasses.replace(tiny_config.run, ckpt_every=4, log_every=0,
                                donate=False))
    mri_v, mri_l = synthetic.make_dataset(0, "mri", 2, 8, 32)
    ct_v, ct_l = synthetic.make_dataset(0, "ct", 2, 8, 32)

    src = api.train_source(cfg, mri_v, mri_l,
                           out_dir=str(tmp_path / "src"), dp=8)
    assert int(src.step) == 8
    ad = api.adapt(cfg, src, mri_v, mri_l, ct_v[:1],
                   out_dir=str(tmp_path / "ad"), dp=8)
    assert int(ad.step) == 12
    import json
    with open(tmp_path / "ad" / "selection.json") as f:
        rec = json.load(f)
    assert rec["signal"] == "class_ratio" and rec["weights"] == "live"
    table = api.evaluate(cfg, ad, ct_v[1:], ct_l[1:])
    assert "mean" in table


def test_host_seed_differs_per_process(monkeypatch):
    """Streaming feeds must draw DIFFERENT batches per host: api and CLI
    share drivers.host_seed (review r3 — api previously passed the raw seed,
    making every host sample identical batches under multihost)."""
    import jax

    from mcmda_tpu.train import drivers

    seeds = set()
    for rank in range(4):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        seeds.add(drivers.host_seed(7))
    assert len(seeds) == 4


def test_feed_plumbing_matches_wrap_dp(tiny_config):
    """feed_plumbing (the input half used by api.adapt's streaming branch)
    must agree with wrap_dp's per-host batch size for the same dp."""
    from mcmda_tpu.train import adapt as adapt_mod, drivers

    for dp in (0, 2):
        per, _ = drivers.feed_plumbing(tiny_config, dp)
        _, per_wrap, _ = drivers.wrap_dp(tiny_config,
                                         adapt_mod.make_adapt_step, dp)
        assert per == per_wrap


def test_evaluate_applies_config_postprocess(tiny_config):
    """api.evaluate honors run.eval_postprocess like the CLI: with 'cc' the
    table carries the raw (unfiltered) table under 'raw'."""
    import dataclasses

    from mcmda_tpu import api
    from mcmda_tpu.data import synthetic

    mri_v, mri_l = synthetic.make_dataset(0, "mri", 1, 8, 32)
    cfg = dataclasses.replace(
        tiny_config,
        source=dataclasses.replace(tiny_config.source, steps=2),
        run=dataclasses.replace(tiny_config.run, eval_postprocess="cc"))
    src = api.train_source(cfg, mri_v, mri_l, steps=2)
    table = api.evaluate(cfg, src, mri_v, mri_l)
    assert "raw" in table
    raw_off = api.evaluate(cfg, src, mri_v, mri_l, postprocess="none")
    assert "raw" not in raw_off


def test_api_predict_matches_eval_forward(tiny_config):
    """api.predict (serving masks) agrees with the forward evaluate uses."""
    import numpy as np

    from mcmda_tpu import api
    from mcmda_tpu.data import synthetic
    from mcmda_tpu.evaluation import inference

    mri_v, mri_l = synthetic.make_dataset(0, "mri", 1, 8, 32)
    src = api.train_source(tiny_config, mri_v, mri_l, steps=2)
    preds = api.predict(tiny_config, src, mri_v, postprocess="none")
    assert len(preds) == 1 and preds[0].shape == mri_v[0].shape
    assert preds[0].dtype == np.uint8
    ref = inference.predict_volume(
        api._forward_for(tiny_config, src), mri_v[0],
        context=tiny_config.data.context_slices,
        batch_size=tiny_config.data.batch_size)
    np.testing.assert_array_equal(preds[0], ref.astype(np.uint8))


def test_api_evaluate_tta_flip(tiny_config):
    """api.evaluate/predict honor tta='flip' (and run.eval_tta) — the
    flip-averaged forward goes through the same stitch/metrics path."""
    import numpy as np

    from mcmda_tpu import api
    from mcmda_tpu.data import synthetic
    from mcmda_tpu.evaluation import inference

    mri_v, mri_l = synthetic.make_dataset(0, "mri", 1, 8, 32)
    src = api.train_source(tiny_config, mri_v, mri_l, steps=2)
    table = api.evaluate(cfg=tiny_config, state=src, volumes=mri_v,
                         labels=mri_l, tta="flip")
    assert 0.0 <= table["mean"]["dice"] <= 1.0
    preds = api.predict(tiny_config, src, mri_v, postprocess="none",
                        tta="flip")
    ref = inference.predict_volume(
        inference.tta_flip(api._forward_for(tiny_config, src)), mri_v[0],
        context=tiny_config.data.context_slices,
        batch_size=tiny_config.data.batch_size)
    np.testing.assert_array_equal(preds[0], ref.astype(np.uint8))


def test_api_eval_bf16_serving_precision(tiny_config):
    """run.eval_bf16 builds the eval/serving forward at bf16 compute while
    leaving the training dtype untouched (config.eval_view): predictions
    stay close to the f32 forward, and the view is a no-op when off."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mcmda_tpu import api, config as config_mod
    from mcmda_tpu.data import synthetic

    mri_v, mri_l = synthetic.make_dataset(0, "mri", 1, 8, 32)
    src = api.train_source(tiny_config, mri_v, mri_l, steps=2)
    assert config_mod.eval_view(tiny_config) is tiny_config
    cfg16 = dataclasses.replace(
        tiny_config, run=dataclasses.replace(tiny_config.run,
                                             eval_bf16=True))
    assert (config_mod.eval_view(cfg16).segmenter.compute_dtype
            is jnp.bfloat16)
    # the TRAINING view is untouched
    assert cfg16.segmenter.compute_dtype is tiny_config.segmenter.compute_dtype
    p32 = api.predict(tiny_config, src, mri_v, postprocess="none")[0]
    p16 = api.predict(cfg16, src, mri_v, postprocess="none")[0]
    # argmax labels: bf16 rounding may flip a few boundary pixels only
    assert np.mean(p32 != p16) < 0.02


def test_api_smoothed_selection_wiring(tiny_config, tmp_path):
    """api.adapt with select_smooth_span>0 streams the smoothed selector
    (adapt.smooth_window ticks), resolves the tail at probe.finalize(), and
    persists the smoothing provenance in selection.json."""
    import json
    cfg = dataclasses.replace(
        tiny_config,
        adapt=dataclasses.replace(tiny_config.adapt, steps=20,
                                  pretrain_steps=10, select_every=5,
                                  select_smooth_span=15, select_warmup=0,
                                  select_policy="cr"),
        run=dataclasses.replace(tiny_config.run, ckpt_every=10, log_every=0))
    mri_v, mri_l = synthetic.make_dataset(0, "mri", 2, 8, 32)
    ct_v, _ = synthetic.make_dataset(0, "ct", 2, 8, 32)
    src = api.train_source(cfg, mri_v, mri_l, out_dir=str(tmp_path / "src"))
    ad = api.adapt(cfg, src, mri_v, mri_l, ct_v[:1],
                   out_dir=str(tmp_path / "ad"))
    assert int(ad.step) == 30
    with open(tmp_path / "ad" / "selection.json") as f:
        rec = json.load(f)
    assert rec["signal"] == "class_ratio" and rec["policy"] == "cr"
    assert rec["smooth_window"] == 3
    # probes tick at multiples of 5 past pretrain(10): best is one of them
    assert rec["best_step"] % 5 == 0 and rec["best_step"] > 10
