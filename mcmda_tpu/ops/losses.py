"""Losses (SURVEY T1/T2).

- Supervised source loss: weighted cross-entropy + multi-class soft Dice
  hybrid [P2; SURVEY T1].
- Adversarial losses: feature-space domain critic minimax — non-saturating
  GAN cross-entropy (d_loss separates source vs target features, g_loss
  drives the DAM to fool the critic) [P1 SIII-C]; LSGAN variant as config.

All losses reduce to scalars in f32 and are jit/grad-safe (no data-dependent
Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- segmentation
def _gsum(x, axis_name):
    """Global sum: local sum, psum'd across the data-parallel axis when one
    is given — batch-global losses stay EXACT under sharding (grads must then
    be psum'd, see train/source.py)."""
    if axis_name is not None:
        return jax.lax.psum(x, axis_name)
    return x


def weighted_cross_entropy(logits, labels_onehot, class_weights=None,
                           axis_name=None):
    """Per-pixel softmax cross-entropy, optionally class-weighted.

    ``class_weights=None`` uses inverse-frequency weights computed from the
    (global) batch — background pixels dominate cardiac slices ~20:1.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    if class_weights is None:
        freq = jnp.mean(labels_onehot, axis=(0, 1, 2))  # [C]
        if axis_name is not None:
            freq = jax.lax.pmean(freq, axis_name)
        class_weights = 1.0 / (freq + 1e-3)
        class_weights = class_weights / jnp.sum(class_weights)
    w = jnp.asarray(class_weights, jnp.float32)
    pix_w = jnp.sum(labels_onehot * w, axis=-1)  # [N,H,W]
    xent = -jnp.sum(labels_onehot * logp, axis=-1)
    num = _gsum(jnp.sum(pix_w * xent), axis_name)
    den = _gsum(jnp.sum(pix_w), axis_name)
    return num / (den + 1e-8)


def soft_dice_loss(probs, labels_onehot, smooth: float = 1.0,
                   skip_background: bool = True, axis_name=None):
    """Multi-class soft Dice loss over the (global) batch [P2].

    Dice per class over all pixels in the batch, averaged over foreground
    classes; loss = 1 - mean Dice.
    """
    start = 1 if skip_background else 0
    p = probs[..., start:].astype(jnp.float32)
    t = labels_onehot[..., start:].astype(jnp.float32)
    inter = _gsum(jnp.sum(p * t, axis=(0, 1, 2)), axis_name)
    denom = _gsum(jnp.sum(p, axis=(0, 1, 2)) + jnp.sum(t, axis=(0, 1, 2)),
                  axis_name)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def segmentation_loss(logits, probs, labels_onehot, xent_weight=1.0,
                      dice_weight=1.0, class_weights=None, axis_name=None):
    """The reference's hybrid supervised loss (SURVEY T1)."""
    xe = weighted_cross_entropy(logits, labels_onehot, class_weights, axis_name)
    dl = soft_dice_loss(probs, labels_onehot, axis_name=axis_name)
    return xent_weight * xe + dice_weight * dl, {"xent": xe, "dice_loss": dl}


# -------------------------------------------------------------- adversarial
def _bce_logits(logits, target):
    # softplus-form binary cross-entropy with logits; numerically stable.
    return jnp.mean(jax.nn.softplus(logits) - target * logits)


def d_loss_nonsat(src_logits, tgt_logits, label_smooth: float = 0.0):
    """Critic loss: classify source features as 1, target features as 0."""
    real = 1.0 - label_smooth
    return _bce_logits(src_logits.astype(jnp.float32), real) + \
        _bce_logits(tgt_logits.astype(jnp.float32), 0.0)


def g_loss_nonsat(tgt_logits):
    """Generator (DAM) loss: make target features classify as source."""
    return _bce_logits(tgt_logits.astype(jnp.float32), 1.0)


def d_loss_lsgan(src_logits, tgt_logits, label_smooth: float = 0.0):
    real = 1.0 - label_smooth
    return 0.5 * (jnp.mean((src_logits.astype(jnp.float32) - real) ** 2)
                  + jnp.mean(tgt_logits.astype(jnp.float32) ** 2))


def g_loss_lsgan(tgt_logits):
    return 0.5 * jnp.mean((tgt_logits.astype(jnp.float32) - 1.0) ** 2)


def gan_losses(kind: str):
    """Return (d_loss_fn(src,tgt,smooth), g_loss_fn(tgt)) for config string."""
    if kind == "nonsat":
        return d_loss_nonsat, g_loss_nonsat
    if kind == "lsgan":
        return d_loss_lsgan, g_loss_lsgan
    raise ValueError(f"unknown gan_loss {kind!r}")


def decision_boundary(kind: str) -> float:
    """Per-loss critic decision boundary for ``critic_accuracy``.

    nonsat trains sigmoid logits (decision at logit 0 = probability 0.5);
    lsgan REGRESSES source logits to 1.0 and target logits to 0.0, so the
    midpoint between the targets — 0.5 — is the decision point.  Thresholding
    lsgan logits at 0 would call ~half of a confidently-separated critic's
    target patches wrong, biasing d_acc low and shifting the meaning of the
    d_acc_cap throttle and every |d_acc - 0.5| equilibrium signal.
    """
    if kind == "nonsat":
        return 0.0
    if kind == "lsgan":
        return 0.5
    raise ValueError(f"unknown gan_loss {kind!r}")


def critic_accuracy(src_logits, tgt_logits, boundary: float = 0.0):
    """Fraction of critic patch decisions that are correct; ~0.5 at the
    adversarial equilibrium (the reference's TensorBoard health signal).
    ``boundary`` must match the loss in play — use ``decision_boundary``."""
    correct = jnp.mean((src_logits > boundary).astype(jnp.float32)) + \
        jnp.mean((tgt_logits <= boundary).astype(jnp.float32))
    return 0.5 * correct
