"""Data pipeline tests: NIfTI decode, normalization, slice stacking,
augmentation determinism, sampler/prefetch."""

import gzip
import struct

import jax
import numpy as np

from mcmda_tpu.config import DataConfig
from mcmda_tpu.data import pipeline, splits, synthetic, volumes


def _write_nifti(path, data):
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dims = (3,) + data.shape + (1,) * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, 16)  # float32
    struct.pack_into("<8f", hdr, 76, 1.0, 1.0, 1.0, 2.0, 0, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)
    payload = bytes(hdr) + b"\0\0\0\0" + \
        np.asarray(data, np.float32).tobytes(order="F")
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def test_nifti_roundtrip(tmp_path):
    data = np.random.default_rng(0).normal(size=(6, 5, 4)).astype(np.float32)
    p = str(tmp_path / "vol.nii.gz")
    _write_nifti(p, data)
    loaded, zooms = volumes.load_nifti(p)
    np.testing.assert_allclose(loaded, data, atol=1e-6)
    np.testing.assert_allclose(zooms, [1.0, 1.0, 2.0])
    vol = volumes.load_volume(p)  # slice axis moved to front
    assert vol.shape == (4, 6, 5)


def test_normalize_volume():
    v = np.random.default_rng(0).normal(5.0, 3.0, (10, 16, 16)).astype(np.float32)
    n = volumes.normalize_volume(v)
    assert abs(n.mean()) < 1e-4 and abs(n.std() - 1.0) < 1e-2


def test_stack_context_edges():
    vol = np.arange(4 * 2 * 2, dtype=np.float32).reshape(4, 2, 2)
    st = volumes.stack_context(vol, 3)
    assert st.shape == (4, 2, 2, 3)
    np.testing.assert_allclose(st[0, ..., 0], vol[0])  # edge clamp
    np.testing.assert_allclose(st[0, ..., 1], vol[0])
    np.testing.assert_allclose(st[0, ..., 2], vol[1])
    np.testing.assert_allclose(st[2, ..., 0], vol[1])


def test_volumes_to_slices_and_drop_empty():
    vols, labs = synthetic.make_dataset(0, "mri", 2, depth=8, size=16)
    ds = volumes.volumes_to_slices(vols, labs, context=3)
    assert ds.images.shape == (16, 16, 16, 3)
    assert ds.labels.shape == (16, 16, 16)
    ds2 = volumes.volumes_to_slices(vols, labs, context=3, drop_empty=True)
    assert len(ds2) <= len(ds)


def test_synthetic_domain_shift():
    """Same-geometry classes must have different intensities across domains."""
    v_m, l_m = synthetic.make_dataset(0, "mri", 1, depth=8, size=32)
    v_c, l_c = synthetic.make_dataset(0, "ct", 1, depth=8, size=32)
    m_means = [v_m[0][l_m[0] == c].mean() for c in range(1, 5)]
    c_means = [v_c[0][l_c[0] == c].mean() for c in range(1, 5)]
    order_m = np.argsort(m_means)
    order_c = np.argsort(c_means)
    assert not np.array_equal(order_m, order_c)


def test_augment_deterministic_and_joint():
    cfg = DataConfig(slice_size=16, batch_size=2, rotate_degrees=20.0,
                     shift_pixels=2.0)
    rng = jax.random.key(3)
    img = np.zeros((2, 16, 16, 3), np.float32)
    img[:, 4:12, 4:12, :] = 1.0
    lab = np.zeros((2, 16, 16), np.int32)
    lab[:, 4:12, 4:12] = 1
    lab1h = np.eye(5, dtype=np.float32)[lab]
    a1, l1 = pipeline.augment_batch(rng, img, lab1h, cfg)
    a2, l2 = pipeline.augment_batch(rng, img, lab1h, cfg)
    np.testing.assert_allclose(a1, a2, atol=1e-6)  # PRNG-deterministic
    # joint: where the warped label says class1, the image should be bright
    mask = np.asarray(l1[..., 1]) > 0.9
    assert np.asarray(a1)[..., 1][mask].mean() > 0.5
    # label stays a distribution
    np.testing.assert_allclose(np.asarray(l1).sum(-1)[mask], 1.0, atol=1e-3)


def test_sampler_and_prefetch():
    vols, labs = synthetic.make_dataset(0, "mri", 1, depth=8, size=16)
    ds = volumes.volumes_to_slices(vols, labs)
    it = iter(pipeline.BatchSampler(ds, batch_size=4, seed=0, num_classes=5))
    stream = pipeline.prefetch_to_device(it, size=2)
    b = next(stream)
    assert b["image"].shape == (4, 16, 16, 3)
    assert b["label"].shape == (4, 16, 16, 5)


def test_benchmark_split():
    sp = splits.benchmark_split("mri2ct")
    assert len(sp.source_train) == 20
    assert len(sp.target_train) == 16 and len(sp.target_test) == 4
    assert set(sp.target_train).isdisjoint(sp.target_test)
    files = splits.resolve_files(["ct_train_1003.nii", "ct_train_1001.nii"])
    assert files[0].endswith("1001.nii")


def test_resolve_files_digitless_names_stable():
    """Digitless filenames sort by basename, not filesystem glob order
    (review r3: they all keyed to 0, leaving split ids host-dependent)."""
    from mcmda_tpu.data import splits as sp
    paths = ["/d/heartC.npz", "/d/heartA.npz", "/d/heartB.npz"]
    assert sp.resolve_files(paths) == sp.resolve_files(list(reversed(paths)))
    assert sp.resolve_files(paths) == ["/d/heartA.npz", "/d/heartB.npz",
                                       "/d/heartC.npz"]
    # numbered files still sort by patient number, before digitless ones
    mixed = ["/d/x.npz", "/d/p_1010.npz", "/d/p_1002.npz"]
    assert sp.resolve_files(mixed) == ["/d/p_1002.npz", "/d/p_1010.npz",
                                       "/d/x.npz"]
