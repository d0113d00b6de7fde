"""Volume IO + normalization + slice extraction (SURVEY D1/D2).

The reference consumed pre-processed MMWHS tfrecords where one record is
three adjacent coronal slices stacked as channels (256x256x3) plus a one-hot
5-class label for the center slice [P1 SIV].  Here the same capability is
host-side numpy: decode npz / NIfTI-1 volumes, normalize per volume to
zero-mean/unit-variance, and extract context-stacked slice arrays that feed
the on-device pipeline.

nibabel is not in the image, so a minimal NIfTI-1 reader (gzip-aware,
scl_slope/scl_inter honoring) is implemented natively.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass
from typing import Tuple

import numpy as np

# ----------------------------------------------------------------- NIfTI-1
_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
    64: np.float64, 256: np.int8, 512: np.uint16, 768: np.uint32,
}


def load_nifti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal NIfTI-1 loader. Returns (data, affine-ish zooms[3]).

    Supports .nii and .nii.gz, the standard dtypes, and scl_slope/scl_inter
    rescaling. Data is returned in file (x,y,z) order as float32.
    """
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()
    hdr = raw[:348]
    sizeof_hdr = struct.unpack_from("<i", hdr, 0)[0]
    if sizeof_hdr != 348:
        raise ValueError(f"{path}: not a little-endian NIfTI-1 file")
    dim = struct.unpack_from("<8h", hdr, 40)
    ndim = dim[0]
    shape = tuple(int(d) for d in dim[1:1 + ndim])
    datatype = struct.unpack_from("<h", hdr, 70)[0]
    pixdim = struct.unpack_from("<8f", hdr, 76)
    vox_offset = int(struct.unpack_from("<f", hdr, 108)[0])
    scl_slope = struct.unpack_from("<f", hdr, 112)[0]
    scl_inter = struct.unpack_from("<f", hdr, 116)[0]
    np_dtype = _NIFTI_DTYPES.get(datatype)
    if np_dtype is None:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    count = int(np.prod(shape))
    data = np.frombuffer(raw, dtype=np_dtype, count=count, offset=vox_offset)
    data = data.reshape(shape, order="F").astype(np.float32)
    if scl_slope not in (0.0, 1.0):
        data = data * scl_slope + scl_inter
    zooms = np.asarray(pixdim[1:4], np.float32)
    return data, zooms


def load_volume(path: str, key: str | None = None) -> np.ndarray:
    """Load a 3D volume from .npz/.npy/.nii/.nii.gz as float32 [S,H,W]."""
    return load_volume_with_spacing(path, key)[0]


def load_volume_with_spacing(path: str, key: str | None = None):
    """Like load_volume but also returns voxel spacing [3] (slice,row,col)
    when the format records it (NIfTI pixdim; npz key 'spacing'), else
    unit spacing — feeds the ASD metrics' mm-correct distances (E2)."""
    if path.endswith((".nii", ".nii.gz")):
        data, zooms = load_nifti(path)
        # benchmark slicing is along the last file axis -> move to front
        vol = np.ascontiguousarray(np.moveaxis(data, -1, 0)).astype(np.float32)
        spacing = np.asarray([zooms[2], zooms[0], zooms[1]], np.float32)
        return vol, spacing
    if path.endswith(".npz"):
        with np.load(path) as z:
            arr = z[key] if key else z[[f for f in z.files
                                        if f != "spacing"][0]]
            spacing = (np.asarray(z["spacing"], np.float32)
                       if "spacing" in z.files else np.ones(3, np.float32))
        return np.asarray(arr, np.float32), spacing
    return np.load(path).astype(np.float32), np.ones(3, np.float32)


# ------------------------------------------------------------ normalization
def normalize_volume(vol: np.ndarray, clip_percentiles=(0.5, 99.5)) -> np.ndarray:
    """Per-volume zero-mean/unit-variance after percentile clipping (D2).

    The reference's released data was pre-normalized offline this way
    [P1 SIV]; here it is a library function so raw volumes work too.
    """
    v = vol.astype(np.float32)
    lo, hi = np.percentile(v, clip_percentiles)
    v = np.clip(v, lo, hi)
    std = v.std()
    return (v - v.mean()) / (std + 1e-8)


# --------------------------------------------------------- slice extraction
@dataclass
class SliceDataset:
    """All context-stacked slices of a split, materialized as flat arrays
    ready for device feeds: images [N,H,W,ctx] f32, labels [N,H,W] int32
    (labels may be None for the unlabeled target split)."""

    images: np.ndarray
    labels: np.ndarray | None
    volume_ids: np.ndarray  # [N] which volume each slice came from
    slice_ids: np.ndarray   # [N] index within its volume

    def __len__(self):
        return self.images.shape[0]


def stack_context(vol: np.ndarray, context: int = 3) -> np.ndarray:
    """[S,H,W] -> [S,H,W,context]: each output slice is its `context`
    adjacent slices stacked as channels, edge-clamped (D1)."""
    assert context % 2 == 1
    half = context // 2
    s = vol.shape[0]
    idx = np.arange(s)[:, None] + np.arange(-half, half + 1)[None, :]
    idx = np.clip(idx, 0, s - 1)
    return np.moveaxis(vol[idx], 1, -1)  # [S,H,W,context]


def volumes_to_slices(vols, labels=None, context: int = 3,
                      drop_empty: bool = False) -> SliceDataset:
    """Build a SliceDataset from lists of [S,H,W] volumes (+ label volumes).

    ``drop_empty`` discards slices whose label is all-background — the usual
    trick to keep foreground frequency up in cardiac training sets.
    """
    imgs, labs, vids, sids = [], [], [], []
    for vi, vol in enumerate(vols):
        stacked = stack_context(vol, context)
        lab = labels[vi] if labels is not None else None
        keep = np.arange(vol.shape[0])
        if drop_empty and lab is not None:
            keep = keep[(lab > 0).any(axis=(1, 2))]
            if keep.size == 0:
                keep = np.arange(vol.shape[0])
        imgs.append(stacked[keep])
        if lab is not None:
            labs.append(lab[keep].astype(np.int32))
        vids.append(np.full(len(keep), vi, np.int32))
        sids.append(keep.astype(np.int32))
    return SliceDataset(
        images=np.concatenate(imgs, 0),
        labels=np.concatenate(labs, 0) if labels is not None else None,
        volume_ids=np.concatenate(vids, 0),
        slice_ids=np.concatenate(sids, 0),
    )


def one_hot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    return np.eye(num_classes, dtype=np.float32)[labels]
