"""CLI plumbing tests: config overrides, parser wiring, mmwhs layout
resolution (full CLI workflows are driven by examples/ + verify scripts)."""

import os

import numpy as np
import pytest

from mcmda_tpu import cli
from mcmda_tpu.config import ExperimentConfig


def test_override_scalar_and_string():
    cfg = cli._load_config(None, ["adapt.plug_depth=rm2", "adapt.k_d=3",
                                  "source.lr=0.01"])
    assert cfg.adapt.plug_depth == "rm2"
    assert cfg.adapt.k_d == 3
    assert cfg.source.lr == 0.01


def test_override_tuple():
    cfg = cli._load_config(None, ['critic.taps=["rm3","rm4"]'])
    assert cfg.critic.taps == ("rm3", "rm4")


def test_config_file_loading(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(ExperimentConfig().to_json())
    cfg = cli._load_config(str(p), ["run.seed=7"])
    assert cfg.run.seed == 7


def test_shipped_configs_parse():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("mri2ct.json", "ct2mri.json", "smoke.json"):
        with open(os.path.join(here, "configs", name)) as f:
            cfg = ExperimentConfig.from_json(f.read())
        assert cfg.segmenter.total_stride == 8
    # tuned stability recipe is baked into the benchmark configs
    with open(os.path.join(here, "configs", "mri2ct.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    assert cfg.adapt.gan_loss == "lsgan"
    assert cfg.adapt.lr_schedule == "cosine"
    assert cfg.adapt.d_acc_cap < 1.0
    # config-5 reverse direction discriminates on multi-level features
    with open(os.path.join(here, "configs", "ct2mri.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    assert len(cfg.critic.taps) >= 2
    # r4 re-pin from the powered sweep (results/ct2mri_cap0.9_ev100_sweep
    # .json, 5 seeds): the reverse direction's quality peaks are transients
    # shorter than the default 250-step probe interval, so the shipped
    # recipe pins the exact measured cadence + cap.
    assert cfg.adapt.select_every == 100
    assert cfg.adapt.d_acc_cap == 0.9
    # r5 policy validation (results/policy_prereg_r5.json): the smoothed-cr
    # candidate LOST to cr_ent on 10 fresh seeds (0.586 vs 0.627), so both
    # shipped configs keep the cr_ent default; flip-TTA at the pick won on
    # all 15 live ct2mri seeds (+0.019 mean, never negative) and ships
    # there only (mri2ct measured neutral, +0.002).
    assert cfg.adapt.select_policy == "cr_ent"
    assert cfg.adapt.select_smooth_span == 0
    assert cfg.run.eval_tta == "flip"
    with open(os.path.join(here, "configs", "mri2ct.json")) as f:
        m = ExperimentConfig.from_json(f.read())
    assert m.adapt.select_policy == "cr_ent"
    assert m.run.eval_tta == "none"
    # r4 serving precision: bf16 eval measured at production geometry
    # (results/synthetic_mri2ct_adapted_bf16.json, mean Dice delta 0.0003
    # vs f32) with a +13% serving-throughput win (results/serving_paths
    # .json); training precision is untouched (config.eval_view)
    for name in ("mri2ct.json", "ct2mri.json"):
        with open(os.path.join(here, "configs", name)) as f:
            assert ExperimentConfig.from_json(f.read()).run.eval_bf16


def test_parser_subcommands():
    p = cli.build_parser()
    a = p.parse_args(["train-source", "--out", "/tmp/x", "--synthetic"])
    assert a.fn is cli.cmd_train_source
    a = p.parse_args(["adapt", "--source-ckpt", "c", "--out", "o",
                      "--direction", "ct2mri"])
    assert a.direction == "ct2mri"
    a = p.parse_args(["evaluate", "--ckpt", "c", "--source-only"])
    assert a.source_only
    a = p.parse_args(["predict", "--ckpt", "c", "--input", "a.nii", "b.npz",
                      "--out", "o"])
    assert a.fn is cli.cmd_predict and a.input == ["a.nii", "b.npz"]


def test_mmwhs_layout(tmp_path):
    from mcmda_tpu.data import mmwhs
    root = tmp_path
    for d, n in (("mri", 3), ("ct", 3)):
        os.makedirs(root / d / "images")
        os.makedirs(root / d / "labels")
        for i in range(n):
            np.save(root / d / "images" / f"{d}_train_{1001 + i}.npy",
                    np.random.default_rng(i).normal(size=(6, 8, 8))
                    .astype(np.float32))
            np.save(root / d / "labels" / f"{d}_train_{1001 + i}.npy",
                    np.zeros((6, 8, 8), np.int32))
    vols, labs = mmwhs.load_domain(str(root), "mri", with_labels=True)
    assert len(vols) == 3 and len(labs) == 3
    assert abs(vols[0].mean()) < 1e-4  # normalized
    vols2, labs2 = mmwhs.load_domain(str(root), "ct", with_labels=False,
                                     ids=(1, 2))
    assert len(vols2) == 2 and labs2 is None
    with pytest.raises(FileNotFoundError):
        mmwhs.load_domain(str(root), "nope")


def test_cli_adapt_writes_class_ratio_selection(tmp_path):
    """Full CLI train-source -> adapt flow on tiny synthetic data: the adapt
    run must write selection.json carrying the class-ratio signal (the
    default unsupervised checkpoint selection) and protect its checkpoint."""
    import json
    src_out = str(tmp_path / "src")
    common = ["--synthetic", "--synthetic-volumes", "2",
              "--config", os.path.join(
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "configs", "smoke.json"),
              "--set", "data.slice_size=32", "--set", "data.batch_size=2",
              "--set", "run.log_every=4", "--set", "run.donate=false"]
    rc = cli.main(["train-source", *common, "--set", "source.steps=8",
                   "--set", "run.ckpt_every=0", "--out", src_out])
    assert rc in (0, None)
    adapt_out = str(tmp_path / "adapt")
    rc = cli.main(["adapt", *common, "--source-ckpt", src_out,
                   "--set", "adapt.steps=8", "--set", "adapt.pretrain_steps=0",
                   "--set", "run.ckpt_every=4", "--out", adapt_out])
    assert rc in (0, None)
    with open(os.path.join(adapt_out, "selection.json")) as f:
        rec = json.load(f)
    assert rec["signal"] == "class_ratio"
    assert 0 < rec["best_step"] <= 8
    # the selected checkpoint is materialized even when the selection probe
    # (finer cadence) picked a step with no periodic checkpoint
    base = os.path.join(adapt_out, f"step_{rec['best_step']:08d}")
    assert os.path.isdir(base) or os.path.exists(base + ".npz")
    # and the run-dir eval path resolves to it
    rc = cli.main(["evaluate", *common, "--ckpt", adapt_out,
                   "--json-out", os.path.join(adapt_out, "eval.json")])
    assert rc in (0, None)
    with open(os.path.join(adapt_out, "eval.json")) as f:
        assert "mean" in json.load(f)
    # metrics carry both unsupervised signals
    sigs = set()
    with open(os.path.join(adapt_out, "metrics.jsonl")) as f:
        for ln in f:
            sigs.update(json.loads(ln))
    assert "class_ratio_dist" in sigs


def test_cli_adapt_dam_ema_selects_coherent_variant(tmp_path):
    """With weight averaging on, the selection probe scores BOTH the live
    DAM and the EMA average; selection.json records the winning variant,
    metrics carry both scores, and evaluate --weights auto uses the recorded
    variant (coherence: selection and evaluation rank the same net)."""
    import json
    src_out = str(tmp_path / "src")
    common = ["--synthetic", "--synthetic-volumes", "2",
              "--config", os.path.join(
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "configs", "smoke.json"),
              "--set", "data.slice_size=32", "--set", "data.batch_size=2",
              "--set", "run.log_every=4", "--set", "run.donate=false"]
    rc = cli.main(["train-source", *common, "--set", "source.steps=8",
                   "--set", "run.ckpt_every=0", "--out", src_out])
    assert rc in (0, None)
    adapt_out = str(tmp_path / "adapt")
    rc = cli.main(["adapt", *common, "--source-ckpt", src_out,
                   "--set", "adapt.steps=8", "--set", "adapt.pretrain_steps=0",
                   "--set", "adapt.dam_ema=0.7",
                   "--set", "run.ckpt_every=4", "--out", adapt_out])
    assert rc in (0, None)
    with open(os.path.join(adapt_out, "selection.json")) as f:
        rec = json.load(f)
    assert rec["weights"] in ("live", "avg")
    sigs = set()
    with open(os.path.join(adapt_out, "metrics.jsonl")) as f:
        for ln in f:
            sigs.update(json.loads(ln))
    assert {"class_ratio_dist", "class_ratio_dist_avg"} <= sigs
    rc = cli.main(["evaluate", *common, "--set", "adapt.dam_ema=0.7",
                   "--ckpt", adapt_out,
                   "--json-out", os.path.join(adapt_out, "eval.json")])
    assert rc in (0, None)
    with open(os.path.join(adapt_out, "eval.json")) as f:
        assert "mean" in json.load(f)


def test_config_bf16_roundtrip():
    """compute_dtype=bfloat16 must survive a to_json/from_json round-trip
    (regression: ml_dtypes.bfloat16 from from_json wasn't re-encodable)."""
    import jax.numpy as jnp
    cfg = cli._load_config(None, ["segmenter.compute_dtype=bfloat16"])
    assert cfg.segmenter.compute_dtype == jnp.bfloat16
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.segmenter.compute_dtype == jnp.bfloat16


def test_synthetic_e2e_example_smoke(tmp_path):
    """README's first-advertised workflow (examples/synthetic_e2e.py) must
    run end-to-end: all five driver configs on tiny step counts.  Asserts
    completion (summary + verdict printed), not the quality gate — 30-step
    runs don't have to adapt (VERDICT r2 weak item 7)."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "synthetic_e2e.py"),
         "--cpu", "--source-steps", "30", "--pretrain-steps", "10",
         "--adapt-steps", "30"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
        env=env)
    assert out.returncode in (0, 1), out.stderr[-2000:]
    assert "E2E RESULT:" in out.stdout
    assert "summary: MRI dice=" in out.stdout


def test_cli_predict_writes_masks(tmp_path):
    """Serving path: train a tiny source net, then `predict` on unlabeled
    NIfTI + npz volumes — masks land on disk in the matching formats, load
    back as integer label volumes, and preserve voxel spacing."""
    import numpy as np

    from mcmda_tpu.data import volumes as vio

    src_out = str(tmp_path / "src")
    common = ["--synthetic", "--synthetic-volumes", "2",
              "--config", os.path.join(
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "configs", "smoke.json"),
              "--set", "data.slice_size=32", "--set", "data.batch_size=2",
              "--set", "run.log_every=0", "--set", "run.donate=false"]
    rc = cli.main(["train-source", *common, "--set", "source.steps=4",
                   "--set", "run.ckpt_every=0", "--out", src_out])
    assert rc in (0, None)

    vol = np.random.default_rng(0).normal(size=(6, 32, 32)).astype(np.float32)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    vio.save_nifti(str(in_dir / "case7.nii.gz"), vol,
                   np.array([2.0, 1.0, 1.0]))
    vio.save_volume(str(in_dir / "case8.npz"), vol)
    out_dir = str(tmp_path / "preds")

    rc = cli.main(["predict", "--config", common[4], "--ckpt", src_out,
                   "--source-only", "--input", str(in_dir), "--out", out_dir,
                   "--set", "data.slice_size=32", "--set",
                   "data.batch_size=2", "--postprocess", "none"])
    assert rc in (0, None)

    mask, sp = vio.load_volume_with_spacing(
        os.path.join(out_dir, "case7_pred.nii.gz"))
    assert mask.shape == vol.shape
    assert set(np.unique(mask)) <= set(range(5))
    np.testing.assert_allclose(sp, [2.0, 1.0, 1.0])
    mask2, _ = vio.load_volume_with_spacing(
        os.path.join(out_dir, "case8_pred.npz"))
    assert mask2.shape == vol.shape


def test_mmwhs_mispaired_labels_raise(tmp_path):
    """A missing label file must fail loudly, not silently shift every
    later volume onto the wrong patient's labels (review r3)."""
    from mcmda_tpu.data import mmwhs
    root = tmp_path
    os.makedirs(root / "mri" / "images")
    os.makedirs(root / "mri" / "labels")
    for i in (1001, 1002, 1003):
        np.save(root / "mri" / "images" / f"mri_train_{i}.npy",
                np.zeros((4, 8, 8), np.float32))
        if i != 1002:  # 1002's label is missing
            np.save(root / "mri" / "labels" / f"mri_train_{i}.npy",
                    np.zeros((4, 8, 8), np.int32))
    with pytest.raises(ValueError, match="do not pair up"):
        mmwhs.load_domain(str(root), "mri", with_labels=True)


def test_cli_real_data_layout_end_to_end(tmp_path):
    """'Real-data day' dry run (roadmap top quality item): a full
    MMWHS-layout tree of 20+20 NIfTI volumes — written with our own writer,
    mm spacings in the headers — driven through the CLI exactly as a
    reference user would, with NO --synthetic anywhere:

        train-source --data-root -> adapt -> evaluate --tta flip -> predict

    Exercises the NIfTI decode + key pairing + benchmark split ids +
    per-volume normalization (D1-D4), spacing-correct ASSD/HD95 (E2), the
    TTA flag through the CLI, and the serving writer round-trip (E1)."""
    import json

    from mcmda_tpu.data import synthetic, volumes as vio

    root = tmp_path / "mmwhs"
    spacing = np.array([2.0, 1.0, 1.5], np.float32)
    for dom in ("mri", "ct"):
        (root / dom / "images").mkdir(parents=True)
        (root / dom / "labels").mkdir(parents=True)
        vols, labs = synthetic.make_dataset(0, dom, 20, 8, 32)
        for i, (v, l) in enumerate(zip(vols, labs)):
            vio.save_volume(
                str(root / dom / "images" / f"{dom}_train_{1001 + i}.nii.gz"),
                v, spacing)
            vio.save_volume(
                str(root / dom / "labels" / f"{dom}_train_{1001 + i}.nii.gz"),
                l.astype(np.int32), spacing)

    common = ["--data-root", str(root),
              "--config", os.path.join(
                  os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "configs", "smoke.json"),
              "--set", "data.slice_size=32", "--set", "data.batch_size=2",
              "--set", "run.log_every=0", "--set", "run.donate=false"]
    src_out = str(tmp_path / "src")
    rc = cli.main(["train-source", *common, "--set", "source.steps=6",
                   "--set", "run.ckpt_every=0", "--out", src_out])
    assert rc in (0, None)

    adapt_out = str(tmp_path / "adapt")
    rc = cli.main(["adapt", *common, "--source-ckpt", src_out,
                   "--set", "adapt.steps=6", "--set", "adapt.pretrain_steps=0",
                   "--set", "run.ckpt_every=3", "--out", adapt_out])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(adapt_out, "selection.json"))

    eval_json = os.path.join(adapt_out, "eval.json")
    rc = cli.main(["evaluate", *common, "--ckpt", adapt_out, "--tta", "flip",
                   "--json-out", eval_json])
    assert rc in (0, None)
    with open(eval_json) as f:
        table = json.load(f)
    # spacing-correct surface metrics + HD95 through the whole CLI path
    assert {"dice", "assd", "hd95"} <= set(table["mean"])
    assert np.isfinite(table["mean"]["dice"])

    preds = str(tmp_path / "preds")
    rc = cli.main(["predict", "--config", common[3], "--ckpt", adapt_out,
                   "--input", str(root / "ct" / "images" / "ct_train_1001.nii.gz"),
                   "--out", preds, "--set", "data.slice_size=32",
                   "--set", "data.batch_size=2"])
    assert rc in (0, None)
    mask, sp_back = vio.load_volume_with_spacing(
        os.path.join(preds, "ct_train_1001_pred.nii.gz"))
    assert mask.shape == (8, 32, 32)
    np.testing.assert_allclose(sp_back, spacing, atol=1e-5)
