"""Optimizer factory (reference: plain Adam via tf.train.AdamOptimizer)."""

from __future__ import annotations

import optax


def make_optimizer(lr: float, beta1: float = 0.9, beta2: float = 0.999,
                   weight_decay: float = 0.0, schedule: str = "constant",
                   total_steps: int = 0) -> optax.GradientTransformation:
    if schedule == "cosine" and total_steps > 0:
        lr = optax.cosine_decay_schedule(lr, total_steps)
    elif schedule != "constant" and schedule != "cosine":
        raise ValueError(f"unknown lr schedule {schedule!r}")
    if weight_decay > 0:
        return optax.adamw(lr, b1=beta1, b2=beta2, weight_decay=weight_decay)
    return optax.adam(lr, b1=beta1, b2=beta2)
