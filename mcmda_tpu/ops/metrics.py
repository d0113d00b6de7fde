"""Device-side metrics (SURVEY E2 — the on-device half).

Dice runs on TPU over one-hot volumes; surface-distance metrics (ASD/ASSD)
live in ``mcmda_tpu.evaluation.metrics3d`` on host numpy (SURVEY section 7
hard-part (c): exact surface distances are host work).
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_per_class(pred_labels, true_labels, num_classes: int):
    """Hard Dice per class from integer label maps (any shape, jittable).

    Returns [num_classes] f32; classes absent from BOTH pred and truth get
    Dice 0.0 — medpy.metric.binary.dc's convention (it catches the 0/0 and
    returns 0), matched exactly by metrics3d.dice so device and host tables
    agree and stay comparable to medpy-based evaluations.
    """
    p = pred_labels.reshape(-1)
    t = true_labels.reshape(-1)
    classes = jnp.arange(num_classes)
    p1 = (p[None, :] == classes[:, None]).astype(jnp.float32)
    t1 = (t[None, :] == classes[:, None]).astype(jnp.float32)
    inter = jnp.sum(p1 * t1, axis=1)
    sizes = jnp.sum(p1, axis=1) + jnp.sum(t1, axis=1)
    return jnp.where(sizes > 0, 2.0 * inter / jnp.maximum(sizes, 1.0), 0.0)


def mean_foreground_dice(pred_labels, true_labels, num_classes: int):
    d = dice_per_class(pred_labels, true_labels, num_classes)
    return jnp.mean(d[1:])
