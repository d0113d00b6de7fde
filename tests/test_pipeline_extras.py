"""Host augmentation path, preprocessing script, loop resume mechanics."""

import os
import subprocess
import sys

import numpy as np

from mcmda_tpu.config import DataConfig
from mcmda_tpu.data import pipeline


def test_host_augmented_stream():
    cfg = DataConfig(slice_size=16, batch_size=2, rotate_degrees=15.0,
                     shift_pixels=2.0)
    img = np.zeros((2, 16, 16, 3), np.float32)
    img[:, 4:12, 4:12, :] = 1.0
    lab = np.eye(5, dtype=np.float32)[
        np.pad(np.ones((2, 8, 8), np.int32), ((0, 0), (4, 4), (4, 4)))]

    def stream():
        while True:
            yield {"image": img.copy(), "label": lab.copy()}

    out = next(iter(pipeline.host_augmented(stream(), cfg, seed=0)))
    assert out["image"].shape == img.shape
    assert out["label"].shape == lab.shape
    # label stays a distribution where foreground survives
    mask = out["label"][..., 1] > 0.9
    if mask.any():
        np.testing.assert_allclose(out["label"].sum(-1)[mask], 1.0, atol=1e-3)
    # image-only key path
    out2 = next(iter(pipeline.host_augmented(
        ({"src_image": img.copy()} for _ in range(1)), cfg,
        keys=("src_image",), label_key=None)))
    assert out2["src_image"].shape == img.shape


def test_preprocess_mmwhs_script(tmp_path):
    """Fake raw MMWHS (npy stand-ins can't carry the _image suffix pairing of
    nii, so write tiny nii files) -> benchmark layout."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_data import _write_nifti

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(12, 10, 6)).astype(np.float32)
    lab = np.zeros((12, 10, 6), np.float32)
    lab[4:8, 4:8, 2:4] = 500   # LVC
    lab[2:4, 2:4, 1:3] = 820   # AA
    _write_nifti(str(raw / "mr_train_1001_image.nii.gz"), img)
    _write_nifti(str(raw / "mr_train_1001_label.nii.gz"), lab)
    _write_nifti(str(raw / "ct_train_2001_image.nii.gz"), img)

    out = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable,
                        os.path.join(repo, "scripts/preprocess_mmwhs.py"),
                        "--raw", str(raw), "--out", str(out), "--size", "16"],
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    with np.load(out / "mri" / "images" / "mr_train_1001.npz") as z:
        vol = z["image"]
        assert vol.shape == (6, 16, 16)  # slice axis fronted, crop/pad to 16
        assert abs(vol.mean()) < 0.1
        assert "spacing" in z.files
    with np.load(out / "mri" / "labels" / "mr_train_1001.npz") as z:
        labv = z["label"]
        assert set(np.unique(labv)) <= {0, 1, 3}  # AA=1, LVC=3 remapped
    assert (out / "ct" / "images" / "ct_train_2001.npz").exists()
    assert not (out / "ct" / "labels").exists()


def test_scanned_step_equals_sequential(tiny_config):
    """K fused steps == K sequential steps (same rng folding)."""
    import jax
    from mcmda_tpu.data import synthetic, volumes as vio
    from mcmda_tpu.train import loop, source

    cfg = tiny_config
    vols, labs = synthetic.make_dataset(0, "mri", 1, 8, 32)
    data = pipeline.to_device_arrays(vio.volumes_to_slices(vols, labs),
                                     cfg.data.num_classes)
    base = source.make_train_step(cfg, sample_from_device=True)
    s0 = source.init_state(jax.random.key(0), cfg)
    # sequential
    s_seq = s0
    rng = jax.random.key(5)
    for k in range(4):
        s_seq, m_seq = base(s_seq, data, jax.random.fold_in(rng, k))
    # fused
    fused = jax.jit(loop.scanned_step(base, 4))
    s_f, m_f = fused(s0, data, rng)
    assert int(s_f.step) == int(s_seq.step) == 4
    np.testing.assert_allclose(float(m_f["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    for a, b in zip(__import__("jax").tree.leaves(s_seq.params),
                    __import__("jax").tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pick_inner():
    from mcmda_tpu.cli import _pick_inner
    assert _pick_inner(800, 200, 150) == 50
    assert _pick_inner(60, 40, 20) == 20
    assert _pick_inner(0, 0) == 1
    assert _pick_inner(7, 13) == 1
    assert _pick_inner(1000, 1000) == 50


def test_loop_resume_roundtrip(tmp_path, tiny_config):
    import dataclasses
    import jax
    from mcmda_tpu.train import loop, source
    from mcmda_tpu.data import synthetic, volumes as vio

    cfg = dataclasses.replace(
        tiny_config, source=dataclasses.replace(tiny_config.source, steps=10))
    vols, labs = synthetic.make_dataset(0, "mri", 1, 8, 32)
    ds = vio.volumes_to_slices(vols, labs)
    feed = pipeline.prefetch_to_device(iter(pipeline.BatchSampler(
        ds, 4, seed=0, num_classes=5)))
    state = source.init_state(jax.random.key(0), cfg)
    step = jax.jit(source.make_train_step(cfg, augment=False))
    state, _ = loop.run(step, state, feed, 10, ckpt_every=5,
                        ckpt_dir=str(tmp_path), log_every=0)
    fresh = source.init_state(jax.random.key(0), cfg)
    resumed, start = loop.maybe_resume(str(tmp_path), fresh)
    assert start == 10
    assert int(resumed.step) == 10


def test_loop_logging_deferred_but_complete():
    """Metric logging defers each tick's host read to the next tick, but
    every tick (including the final step) is flushed by the time run()
    returns, with the values of the step it was recorded at."""
    import itertools

    import jax.numpy as jnp

    from mcmda_tpu.train import loop

    calls = []

    class Rec:
        def log(self, step, m):
            calls.append((step, dict(m)))

    def step_fn(st, batch, rng):
        return st + 1, {"x": st.astype(jnp.float32)}

    state, last = loop.run(step_fn, jnp.int32(0), itertools.repeat({}), 10,
                           log_every=5, logger=Rec())
    assert [s for s, _ in calls] == [0, 5, 9]
    assert [m["x"] for _, m in calls] == [0.0, 5.0, 9.0]
    assert last == {"x": 9.0}
    assert int(state) == 10
