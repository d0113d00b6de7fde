"""T1: supervised source-segmenter training.

One jitted train step: on-device augmentation -> forward (batch-stat BN,
optionally cross-replica synced) -> weighted-xent + soft-Dice loss -> Adam.
Under data parallelism the same step runs inside shard_map with gradients
pmean'd over the "data" axis (see parallel/dp.py).

Reference call stack being rebuilt: SURVEY section 3.1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.data import pipeline
from mcmda_tpu.models import segmenter
from mcmda_tpu.ops import losses
from mcmda_tpu.train import optim


@struct.dataclass
class SourceState:
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(rng, cfg: ExperimentConfig) -> SourceState:
    params, bn_state = segmenter.init(rng, cfg.segmenter)
    tx = make_tx(cfg)
    return SourceState(params=params, bn_state=bn_state,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))


def make_tx(cfg: ExperimentConfig):
    s = cfg.source
    return optim.make_optimizer(s.lr, s.beta1, s.beta2, s.weight_decay,
                                s.lr_schedule, s.steps)


def make_train_step(cfg: ExperimentConfig, axis_name: str | None = None,
                    augment: bool = True, sample_from_device: bool = False):
    """Returns step(state, batch, rng) -> (state, metrics). Pure; jit/shard_map
    it at the call site.

    batch = {"image": [B,H,W,C], "label": [B,H,W,K]} normally; with
    ``sample_from_device`` the batch is instead the device-resident dataset
    from ``pipeline.to_device_arrays`` and the step gathers its own random
    batch on device (zero per-step host transfer).
    """
    tx = make_tx(cfg)
    seg_cfg = cfg.segmenter
    src = cfg.source

    def loss_fn(params, bn_state, image, label):
        logits, probs, _, new_bn = segmenter.apply(
            params, bn_state, image, seg_cfg, train=True, axis_name=axis_name)
        loss, parts = losses.segmentation_loss(
            logits, probs, label, src.xent_weight, src.dice_weight,
            src.class_weights, axis_name=axis_name)
        return loss, (new_bn, parts)

    def step(state: SourceState, batch, rng):
        if sample_from_device:
            r_idx, rng = jax.random.split(rng)
            batch = pipeline.sample_device_batch(batch, r_idx,
                                                 cfg.data.batch_size,
                                                 cfg.data.num_classes)
        image, label = batch["image"], batch["label"]
        if augment:
            image, label = pipeline.augment_batch(rng, image, label, cfg.data)
        (loss, (new_bn, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state, image, label)
        if axis_name is not None:
            # the loss reductions are already GLOBALLY normalized (psum'd
            # inside losses.py), so each shard's grad is a partial derivative
            # of the global loss -> sum, not mean, across shards
            grads = jax.lax.psum(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = {"loss": loss, **parts}
        return SourceState(params=new_params, bn_state=new_bn,
                           opt_state=new_opt, step=state.step + 1), metrics

    return step


def make_eval_forward(cfg: ExperimentConfig):
    """Jittable inference forward (eval-mode BN): images -> probs."""
    def fwd(params, bn_state, image):
        _, probs, _, _ = segmenter.apply(params, bn_state, image,
                                         cfg.segmenter, train=False)
        return probs
    return fwd
