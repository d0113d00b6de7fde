"""On-device input pipeline (SURVEY D1/D3 + north-star "on-device XLA
preprocessing graph feeding double-buffered HBM batches").

The reference ran augmentation in host TF queue threads; here augmentation is
a jittable function (random flip + joint affine rotate/zoom/shift on the
(image, one-hot label) pair) fused by XLA into the train step, so the only
host work per step is an integer gather + async ``device_put`` (double
buffering via dispatch-ahead).
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mcmda_tpu.config import DataConfig


# ------------------------------------------------------- jittable transforms
def _affine_grid(h: int, w: int, theta, zoom, shift_y, shift_x):
    """Sampling coordinates for the INVERSE affine map (rotate+zoom+shift
    about the image center)."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y = yy - cy
    x = xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv_scale = 1.0 / zoom
    ys = (cos * y - sin * x) * inv_scale + cy - shift_y
    xs = (sin * y + cos * x) * inv_scale + cx - shift_x
    return ys, xs


def _warp(img_hw_c, ys, xs):
    """Bilinear warp of [H,W,C] at sampling coords (out-of-range -> 0).

    Hand-rolled 4-corner gather on the flattened plane: one shared index set
    for all corners/channels.  Measured ~5.6x faster than per-channel
    jax.scipy.ndimage.map_coordinates on TPU v5e (97.7 -> 17.4 ms for a
    batch-8 256x256 call; see scripts/profile_step.py methodology).  Labels
    ride through as one-hot channels and are renormalized by the caller.
    """
    h, w, c = img_hw_c.shape
    # pack the 4 bilinear corners into channels via edge-clamped shifts so
    # the whole interpolation needs ONE gather (measured another ~10% over
    # 4 separate corner gathers; bit-identical)
    sx = jnp.concatenate([img_hw_c[:, 1:, :], img_hw_c[:, -1:, :]], axis=1)
    base = jnp.concatenate([img_hw_c, sx], axis=-1)          # [H,W,2C]
    sy = jnp.concatenate([base[1:, :, :], base[-1:, :, :]], axis=0)
    packed = jnp.concatenate([base, sy], axis=-1)            # [H,W,4C]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    valid = ((ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1))[..., None]
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    flat = packed.reshape(h * w, 4 * c)
    g = jnp.take(flat, (y0c * w + x0c).reshape(-1), axis=0).reshape(h, w,
                                                                    4 * c)
    g00, g01 = g[..., :c], g[..., c:2 * c]
    g10, g11 = g[..., 2 * c:3 * c], g[..., 3 * c:]
    v = ((1 - wy) * (1 - wx) * g00 + (1 - wy) * wx * g01
         + wy * (1 - wx) * g10 + wy * wx * g11)
    return jnp.where(valid, v, 0.0)


def _draw_params(rng, cfg: DataConfig):
    """Per-sample augmentation parameter draws — shared by the XLA and
    Pallas warp paths so a given key produces the SAME transform on both."""
    k_flip, k_rot, k_zoom, k_sy, k_sx = jax.random.split(rng, 5)
    flip = jax.random.bernoulli(k_flip) & cfg.flip
    theta = jax.random.uniform(k_rot, (), minval=-1.0, maxval=1.0) * \
        (cfg.rotate_degrees * jnp.pi / 180.0)
    zoom = jax.random.uniform(k_zoom, (), minval=cfg.zoom_range[0],
                              maxval=cfg.zoom_range[1])
    sy = jax.random.uniform(k_sy, (), minval=-cfg.shift_pixels,
                            maxval=cfg.shift_pixels)
    sx = jax.random.uniform(k_sx, (), minval=-cfg.shift_pixels,
                            maxval=cfg.shift_pixels)
    return flip, theta, zoom, sy, sx


def augment_pair(rng, image, label_onehot, cfg: DataConfig):
    """Jointly augment one (image [H,W,C], one-hot label [H,W,K]) pair (D3)."""
    h, w = image.shape[0], image.shape[1]
    flip, theta, zoom, sy, sx = _draw_params(rng, cfg)

    image = jnp.where(flip, image[:, ::-1, :], image)
    label_onehot = jnp.where(flip, label_onehot[:, ::-1, :], label_onehot)

    ys, xs = _affine_grid(h, w, theta, zoom, sy, sx)
    # joint warp: image + one-hot label channels in ONE gather pass
    ci = image.shape[-1]
    both = _warp(jnp.concatenate([image, label_onehot], axis=-1), ys, xs)
    image, label_onehot = both[..., :ci], both[..., ci:]
    # renormalize warped one-hot (stays a valid distribution; argmax==nearest)
    label_onehot = label_onehot / jnp.maximum(
        jnp.sum(label_onehot, axis=-1, keepdims=True), 1e-6)
    return image, label_onehot


def augment_batch(rng, images, labels_onehot, cfg: DataConfig):
    """Batched joint augmentation; fuses into the train step under jit.

    cfg.warp selects the implementation: "xla" = vmap'd packed single-gather
    warp; "pallas" = the gather-free MXU warp kernel (kernels/warp.py) —
    same transforms for a given key (shared parameter draws), results equal
    to bf16-payload tolerance.
    """
    keys = jax.random.split(rng, images.shape[0])
    if cfg.warp == "pallas":
        ci = images.shape[-1]
        both = _pallas_warp(keys, jnp.concatenate([images, labels_onehot],
                                                  -1), cfg)
        image, label = both[..., :ci], both[..., ci:]
        label = label / jnp.maximum(jnp.sum(label, axis=-1, keepdims=True),
                                    1e-6)
        return image, label
    return jax.vmap(lambda k, i, l: augment_pair(k, i, l, cfg))(
        keys, images, labels_onehot)


def _pallas_warp(keys, images, cfg: DataConfig):
    """MXU warp of a packed-channel batch with per-image params drawn from
    ``keys`` (same draw structure as the XLA path — shared transforms)."""
    from mcmda_tpu.kernels import warp as warp_mod
    h, w = images.shape[1], images.shape[2]
    flip, theta, zoom, sy, sx = jax.vmap(
        lambda k: _draw_params(k, cfg))(keys)
    coefs = jax.vmap(lambda t, z, a, b, f: warp_mod.affine_coefs(
        t, z, a, b, f, h, w))(theta, zoom, sy, sx, flip)
    band = warp_mod.band_bound(h, w, 8, cfg.rotate_degrees * np.pi / 180.0,
                               cfg.zoom_range[0], jb=warp_mod.tile_width(w))
    return warp_mod.warp_affine(images, coefs, max_band=band)


def augment_images(rng, images, cfg: DataConfig):
    """Image-only augmentation for the unlabeled target stream (T2).

    The pallas path warps the images directly — the warp kernel's cost is
    linear in channels, so routing through ``augment_batch`` with a dummy
    label plane would spend 1/(C+1) of the kernel's MXU time on zeros
    (measured 8.2% of the adapt step at C=3, scripts/profile_topops.py)."""
    keys = jax.random.split(rng, images.shape[0])
    if cfg.warp == "pallas":
        return _pallas_warp(keys, images, cfg)
    dummy = jnp.zeros(images.shape[:3] + (1,), images.dtype)
    out, _ = jax.vmap(lambda k, i, l: augment_pair(k, i, l, cfg))(
        keys, images, dummy)
    return out


# ------------------------------------------------- device-resident datasets
def to_device_arrays(ds, num_classes: int | None = None, sharding=None):
    """Materialize a SliceDataset in HBM for fully on-device sampling.

    The benchmark's training sets are small (tens of volumes -> a few hundred
    MB), so the whole slice array lives on device and each train step GATHERS
    its batch by indices drawn from the step's PRNG key — the host sends
    nothing per step.  (Measured: host->device batch upload dominated wall
    time on remote-attached chips.)  Labels ship as int8 and one-hot on
    device.  Under data parallelism, pass a P("data")-sharding to split the
    dataset across replicas; each shard samples locally.

    Multi-host: when the sharding spans a multi-process mesh, ``ds`` must
    hold ONLY this process's rows (see ``multihost.shard_dataset`` — per-host
    input sharding) and the global array assembles from each process's local
    data without any cross-host transfer.
    """
    import jax

    if sharding is not None and jax.process_count() > 1:
        def put(a):
            return jax.make_array_from_process_local_data(sharding, a)
    else:
        n_keep = None
        if sharding is not None:
            # drop-last to a multiple of the shard count so every replica
            # gets an equal block (multihost.shard_dataset semantics; a
            # P("data") device_put of a non-divisible row count is an error)
            ways = sharding.num_devices
            n_keep = (ds.images.shape[0] // ways) * ways
            if n_keep == 0:
                raise ValueError(
                    f"device-resident dataset has {ds.images.shape[0]} rows "
                    f"— fewer than the {ways} data-parallel shards")

        def put(a):
            return jax.device_put(a if n_keep is None else a[:n_keep],
                                  sharding)
    out = {"images": put(ds.images)}
    if ds.labels is not None and num_classes:
        out["labels"] = put(ds.labels.astype(np.int8))
    return out


def sample_device_batch(data, rng, batch_size: int,
                        num_classes: int | None = None):
    """Jit-friendly: gather a random batch from device-resident arrays."""
    n = data["images"].shape[0]
    idx = jax.random.randint(rng, (batch_size,), 0, n)
    batch = {"image": jnp.take(data["images"], idx, axis=0)}
    if "labels" in data and num_classes:
        batch["label"] = jax.nn.one_hot(
            jnp.take(data["labels"], idx, axis=0).astype(jnp.int32),
            num_classes, dtype=jnp.float32)
    return batch


# ----------------------------------------------------- host-side augmentation
def augment_batch_host(rng: np.random.Generator, images: np.ndarray,
                       labels_onehot: np.ndarray | None, cfg: DataConfig):
    """scipy-based joint augmentation on the HOST (numpy in, numpy out).

    Alternative to the on-device path: when augmentation runs in the input
    pipeline thread it overlaps fully with device compute (the reference's
    queue-thread design, modernized).  Same transform family and parameter
    ranges as ``augment_batch``.
    """
    from scipy import ndimage as ndi

    out_i = np.empty_like(images)
    out_l = np.empty_like(labels_onehot) if labels_onehot is not None else None
    h, w = images.shape[1:3]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    for b in range(images.shape[0]):
        flip = cfg.flip and rng.random() < 0.5
        theta = rng.uniform(-1, 1) * np.deg2rad(cfg.rotate_degrees)
        zoom = rng.uniform(*cfg.zoom_range)
        sy = rng.uniform(-cfg.shift_pixels, cfg.shift_pixels)
        sx = rng.uniform(-cfg.shift_pixels, cfg.shift_pixels)
        cos, sin = np.cos(theta), np.sin(theta)
        mat = np.array([[cos, -sin], [sin, cos]]) / zoom
        offset = np.array([cy - sy, cx - sx]) - mat @ np.array([cy, cx])

        def warp(img2d, order):
            return ndi.affine_transform(img2d, mat, offset=offset, order=order,
                                        mode="constant", cval=0.0)

        im = images[b, :, ::-1] if flip else images[b]
        out_i[b] = np.stack([warp(im[..., c], 1)
                             for c in range(im.shape[-1])], -1)
        if out_l is not None:
            lb = labels_onehot[b, :, ::-1] if flip else labels_onehot[b]
            wl = np.stack([warp(lb[..., c], 1) for c in range(lb.shape[-1])],
                          -1)
            out_l[b] = wl / np.maximum(wl.sum(-1, keepdims=True), 1e-6)
    return out_i, out_l


# --------------------------------------------------------------- host feeds
class BatchSampler:
    """Host-side index sampler over a SliceDataset: uniform with-replacement
    shuffled batches (the reference's shuffle_batch queue, D1)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_classes: int | None = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.num_classes = num_classes

    def __iter__(self) -> Iterator[dict]:
        n = len(self.ds)
        while True:
            idx = self.rng.integers(0, n, self.batch_size)
            batch = {"image": self.ds.images[idx]}
            if self.ds.labels is not None and self.num_classes:
                batch["label"] = np.eye(self.num_classes, dtype=np.float32)[
                    self.ds.labels[idx]]
            yield batch


def host_augmented(stream: Iterator, cfg: DataConfig, seed: int = 0,
                   keys=("image",), label_key: str | None = "label") -> Iterator:
    """Wrap a batch stream with host-side augmentation (runs in the consumer
    thread between dequeues; combined with prefetch_to_device it overlaps
    with device compute).  ``keys`` are image arrays to augment independently;
    ``label_key`` (if present in the batch) is warped jointly with "image"."""
    rng = np.random.default_rng(seed)
    for batch in stream:
        out = dict(batch)
        for k in keys:
            if k == "image" and label_key and label_key in batch:
                out[k], out[label_key] = augment_batch_host(
                    rng, batch[k], batch[label_key], cfg)
            elif k in batch:
                out[k], _ = augment_batch_host(rng, batch[k], None, cfg)
        yield out


def prefetch_to_device(iterator, size: int = 2, sharding=None) -> Iterator:
    """Double-buffered HBM feed: keep `size` batches in flight via async
    ``device_put`` so host gather overlaps device compute."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
