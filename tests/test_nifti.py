"""NIfTI loader hardening tests (SURVEY D1/D4; VERDICT r1 item 8): NIfTI-1
and NIfTI-2, both endiannesses, detached .hdr/.img pairs, sform-aware
spacing, scl rescaling, and header fuzzing."""

import gzip
import struct

import numpy as np
import pytest

from mcmda_tpu.data import volumes


def _hdr1(shape, dtype_code=16, endian="<", pixdim=(1.0, 1.0, 2.0),
          magic=b"n+1\x00", vox_offset=352.0, scl=(1.0, 0.0), srow=None):
    hdr = bytearray(348)
    struct.pack_into(f"{endian}i", hdr, 0, 348)
    dims = (len(shape),) + shape + (1,) * (7 - len(shape))
    struct.pack_into(f"{endian}8h", hdr, 40, *dims)
    struct.pack_into(f"{endian}h", hdr, 70, dtype_code)
    struct.pack_into(f"{endian}8f", hdr, 76, 1.0, *pixdim, 0, 0, 0, 0)
    struct.pack_into(f"{endian}f", hdr, 108, vox_offset)
    struct.pack_into(f"{endian}2f", hdr, 112, *scl)
    if srow is not None:
        struct.pack_into(f"{endian}h", hdr, 254, 1)  # sform_code
        struct.pack_into(f"{endian}12f", hdr, 280, *np.ravel(srow))
    hdr[344:348] = magic
    return bytes(hdr)


def _hdr2(shape, dtype_code=16, endian="<", pixdim=(1.0, 1.0, 2.0),
          magic=b"n+2\x00\r\n\x1a\n", vox_offset=544):
    hdr = bytearray(540)
    struct.pack_into(f"{endian}i", hdr, 0, 540)
    hdr[4:12] = magic
    struct.pack_into(f"{endian}h", hdr, 12, dtype_code)
    dims = (len(shape),) + shape + (1,) * (7 - len(shape))
    struct.pack_into(f"{endian}8q", hdr, 16, *dims)
    struct.pack_into(f"{endian}8d", hdr, 104, 1.0, *pixdim, 0, 0, 0, 0)
    struct.pack_into(f"{endian}q", hdr, 168, vox_offset)
    struct.pack_into(f"{endian}2d", hdr, 176, 1.0, 0.0)
    return bytes(hdr)


DATA = np.random.default_rng(0).normal(size=(6, 5, 4)).astype(np.float32)


def _write(path, payload):
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def _body(data, endian="<", dtype=np.float32):
    return np.asarray(data, dtype).astype(
        np.dtype(dtype).newbyteorder(endian)).tobytes(order="F")


def test_nifti1_big_endian(tmp_path):
    p = str(tmp_path / "be.nii")
    _write(p, _hdr1(DATA.shape, endian=">") + b"\0" * 4 + _body(DATA, ">"))
    loaded, zooms = volumes.load_nifti(p)
    np.testing.assert_allclose(loaded, DATA, atol=1e-6)
    np.testing.assert_allclose(zooms, [1.0, 1.0, 2.0])


def test_nifti2_both_endians(tmp_path):
    for en, name in (("<", "le2.nii.gz"), (">", "be2.nii")):
        p = str(tmp_path / name)
        _write(p, _hdr2(DATA.shape, endian=en) + b"\0" * 4 + _body(DATA, en))
        loaded, zooms = volumes.load_nifti(p)
        np.testing.assert_allclose(loaded, DATA, atol=1e-6)
        np.testing.assert_allclose(zooms, [1.0, 1.0, 2.0])


def test_detached_hdr_img_pair(tmp_path):
    _write(str(tmp_path / "v.hdr"),
           _hdr1(DATA.shape, magic=b"ni1\x00", vox_offset=0.0))
    _write(str(tmp_path / "v.img"), _body(DATA))
    for entry in ("v.hdr", "v.img"):
        loaded, _ = volumes.load_nifti(str(tmp_path / entry))
        np.testing.assert_allclose(loaded, DATA, atol=1e-6)


def test_sform_spacing_overrides_pixdim(tmp_path):
    # rotated sform: spacing = column norms, NOT the raw pixdim
    srow = np.array([[0.0, -1.5, 0.0, 10.0],
                     [0.8, 0.0, 0.0, -5.0],
                     [0.0, 0.0, 3.0, 0.0]])
    p = str(tmp_path / "s.nii")
    _write(p, _hdr1(DATA.shape, pixdim=(9.0, 9.0, 9.0), srow=srow)
           + b"\0" * 4 + _body(DATA))
    _, zooms = volumes.load_nifti(p)
    np.testing.assert_allclose(zooms, [0.8, 1.5, 3.0], atol=1e-6)


def test_scl_rescale_int16(tmp_path):
    ints = (DATA * 100).astype(np.int16)
    p = str(tmp_path / "i.nii")
    _write(p, _hdr1(DATA.shape, dtype_code=4, scl=(0.01, 2.0))
           + b"\0" * 4 + _body(ints, dtype=np.int16))
    loaded, _ = volumes.load_nifti(p)
    np.testing.assert_allclose(loaded, ints.astype(np.float32) * 0.01 + 2.0,
                               atol=1e-5)


def test_negative_pixdim_abs(tmp_path):
    p = str(tmp_path / "n.nii")
    _write(p, _hdr1(DATA.shape, pixdim=(-1.0, 1.0, -2.0))
           + b"\0" * 4 + _body(DATA))
    _, zooms = volumes.load_nifti(p)
    np.testing.assert_allclose(zooms, [1.0, 1.0, 2.0])


@pytest.mark.parametrize("mutate", [
    lambda h: b"junk" + h[4:],                       # bad sizeof_hdr
    lambda h: h[:344] + b"XXXX",                     # bad magic
    lambda h: h[:40] + struct.pack("<8h", 0, *[1] * 7) + h[56:],  # dim0=0
    lambda h: h[:70] + struct.pack("<h", 31337) + h[72:],  # unknown dtype
    lambda h: h[:200],                               # truncated header
])
def test_fuzzed_headers_raise_value_error(tmp_path, mutate):
    p = str(tmp_path / "f.nii")
    _write(p, mutate(_hdr1(DATA.shape)) + b"\0" * 4 + _body(DATA))
    with pytest.raises(ValueError):
        volumes.load_nifti(p)


def test_truncated_body_raises(tmp_path):
    p = str(tmp_path / "t.nii")
    _write(p, _hdr1(DATA.shape) + b"\0" * 4 + _body(DATA)[:-16])
    with pytest.raises(ValueError, match="too short"):
        volumes.load_nifti(p)


def test_random_byte_fuzz_never_segfaults(tmp_path):
    """Random mutations either load or raise ValueError — never crash."""
    rng = np.random.default_rng(42)
    good = bytearray(_hdr1(DATA.shape) + b"\0" * 4 + _body(DATA))
    for trial in range(50):
        buf = bytearray(good)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, 348)] = rng.integers(0, 256)
        p = str(tmp_path / f"z{trial}.nii")
        _write(p, bytes(buf))
        try:
            volumes.load_nifti(p)
        except ValueError:
            pass


def test_qform_spacing_used_when_no_sform(tmp_path):
    """qform_code>0, sform_code=0 (scanner-native): the qform affine is an
    ORTHONORMAL rotation x diag(pixdim x qfac), so its column norms are
    identically |pixdim| — the loader documents and relies on that
    equivalence instead of computing the no-op quaternion (ADVICE r2; the
    header here carries a nontrivial rotation + qfac=-1 to pin it)."""
    hdr = bytearray(_hdr1((6, 5, 4), pixdim=(1.5, 2.0, 2.5)))
    struct.pack_into("<f", hdr, 76, -1.0)  # pixdim[0] = qfac = -1
    struct.pack_into("<h", hdr, 252, 1)    # qform_code
    s = np.sin(np.pi / 8)
    struct.pack_into("<3f", hdr, 256, 0.0, 0.0, s)  # rotation about z
    p = tmp_path / "q.nii"
    _write(p, bytes(hdr) + b"\x00" * 4 + _body(DATA))
    data, zooms = volumes.load_nifti(str(p))
    np.testing.assert_allclose(zooms, [1.5, 2.0, 2.5], rtol=1e-5)
    np.testing.assert_allclose(data, DATA, rtol=1e-6)


def test_qform_nonfinite_quat_spacing_is_pixdim(tmp_path):
    hdr = bytearray(_hdr1((6, 5, 4), pixdim=(1.0, 1.0, 3.0)))
    struct.pack_into("<h", hdr, 252, 1)
    struct.pack_into("<3f", hdr, 256, np.nan, 0.0, 0.0)
    p = tmp_path / "qbad.nii"
    _write(p, bytes(hdr) + b"\x00" * 4 + _body(DATA))
    _, zooms = volumes.load_nifti(str(p))
    np.testing.assert_allclose(zooms, [1.0, 1.0, 3.0])


def test_scl_slope_applied_with_nan_inter(tmp_path):
    """NIfTI convention (nibabel parity): non-finite scl_inter means 0 — the
    slope must still be applied (ADVICE r2)."""
    p = tmp_path / "scl.nii"
    _write(p, _hdr1((6, 5, 4), scl=(2.5, np.nan))
           + b"\x00" * 4 + _body(DATA))
    data, _ = volumes.load_nifti(str(p))
    np.testing.assert_allclose(data, DATA * 2.5, rtol=1e-6)


def test_save_nifti_roundtrip_mask_and_spacing(tmp_path):
    """Writer inverse of the loader: uint8 mask + spacing survive .nii and
    .nii.gz round-trips (prediction-export path)."""
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 5, size=(5, 7, 6)).astype(np.int32)
    sp = np.array([3.0, 0.5, 1.25], np.float32)
    for name in ("m.nii", "m.nii.gz"):
        p = str(tmp_path / name)
        volumes.save_nifti(p, mask, sp)
        rv, rsp = volumes.load_volume_with_spacing(p)
        np.testing.assert_allclose(rv, mask)
        np.testing.assert_allclose(rsp, sp, rtol=1e-6)


def test_save_nifti_dtype_selection(tmp_path):
    """uint8 for small non-negative ints, int32 when out of uint8 range,
    float32 for floats — all load back exactly."""
    cases = [
        np.arange(24).reshape(2, 3, 4).astype(np.int64) * 20,   # >255 -> i32
        (np.arange(24).reshape(2, 3, 4) % 5).astype(np.uint8),  # u8
        np.linspace(-1, 1, 24).reshape(2, 3, 4).astype(np.float32),
    ]
    for i, v in enumerate(cases):
        p = str(tmp_path / f"c{i}.nii")
        volumes.save_nifti(p, v)
        rv, _ = volumes.load_volume_with_spacing(p)
        np.testing.assert_allclose(rv, v.astype(np.float32), rtol=1e-6)


def test_save_volume_npz_roundtrip(tmp_path):
    p = str(tmp_path / "v.npz")
    v = np.random.default_rng(1).normal(size=(3, 4, 5)).astype(np.float32)
    volumes.save_volume(p, v, [2.0, 1.0, 1.0])
    rv, rsp = volumes.load_volume_with_spacing(p)
    np.testing.assert_allclose(rv, v)
    np.testing.assert_allclose(rsp, [2.0, 1.0, 1.0])


def test_trailing_singleton_dims_squeezed(tmp_path):
    """Tool-exported 4D files with nt=1 (dim[0]=4) must load as 3D so the
    [S,H,W] contract holds downstream (review r3)."""
    p = str(tmp_path / "4d.nii")
    _write(p, _hdr1((6, 5, 4, 1)) + b"\x00" * 4 + _body(DATA))
    loaded, _ = volumes.load_nifti(p)
    assert loaded.shape == (6, 5, 4)
    np.testing.assert_allclose(loaded, DATA, atol=1e-6)


def test_fully_gzipped_detached_pair(tmp_path):
    """x.hdr.gz + x.img.gz (both halves gzipped) loads from either entry
    point (review r3: only .img.gz used to have a gz fallback)."""
    _write(str(tmp_path / "v.hdr.gz"),
           _hdr1(DATA.shape, magic=b"ni1\x00", vox_offset=0.0))
    _write(str(tmp_path / "v.img.gz"), _body(DATA))
    for entry in ("v.hdr.gz", "v.img.gz"):
        loaded, _ = volumes.load_nifti(str(tmp_path / entry))
        np.testing.assert_allclose(loaded, DATA, atol=1e-6)
