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


def _warp(img_hw_c, ys, xs, order: int):
    """Warp [H,W,C] by sampling coords; order 1 for images, labels are warped
    as one-hot with order 1 then re-argmaxed by the caller (equivalent to
    nearest for hard labels, smoother for soft)."""
    def one(ch):
        return jax.scipy.ndimage.map_coordinates(ch, [ys, xs], order=order,
                                                 mode="constant", cval=0.0)
    return jnp.stack([one(img_hw_c[..., c]) for c in range(img_hw_c.shape[-1])],
                     axis=-1)


def augment_pair(rng, image, label_onehot, cfg: DataConfig):
    """Jointly augment one (image [H,W,C], one-hot label [H,W,K]) pair (D3)."""
    k_flip, k_rot, k_zoom, k_sy, k_sx = jax.random.split(rng, 5)
    h, w = image.shape[0], image.shape[1]

    flip = jax.random.bernoulli(k_flip) & cfg.flip
    image = jnp.where(flip, image[:, ::-1, :], image)
    label_onehot = jnp.where(flip, label_onehot[:, ::-1, :], label_onehot)

    theta = jax.random.uniform(k_rot, (), minval=-1.0, maxval=1.0) * \
        (cfg.rotate_degrees * jnp.pi / 180.0)
    zoom = jax.random.uniform(k_zoom, (), minval=cfg.zoom_range[0],
                              maxval=cfg.zoom_range[1])
    sy = jax.random.uniform(k_sy, (), minval=-cfg.shift_pixels,
                            maxval=cfg.shift_pixels)
    sx = jax.random.uniform(k_sx, (), minval=-cfg.shift_pixels,
                            maxval=cfg.shift_pixels)
    ys, xs = _affine_grid(h, w, theta, zoom, sy, sx)
    image = _warp(image, ys, xs, order=1)
    label_onehot = _warp(label_onehot, ys, xs, order=1)
    # renormalize warped one-hot (stays a valid distribution; argmax==nearest)
    label_onehot = label_onehot / jnp.maximum(
        jnp.sum(label_onehot, axis=-1, keepdims=True), 1e-6)
    return image, label_onehot


def augment_batch(rng, images, labels_onehot, cfg: DataConfig):
    """vmap'd joint augmentation; fuses into the train step under jit."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda k, i, l: augment_pair(k, i, l, cfg))(
        keys, images, labels_onehot)


def augment_images(rng, images, cfg: DataConfig):
    """Image-only augmentation for the unlabeled target stream (T2)."""
    dummy = jnp.zeros(images.shape[:3] + (1,), images.dtype)
    out, _ = augment_batch(rng, images, dummy, cfg)
    return out


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
