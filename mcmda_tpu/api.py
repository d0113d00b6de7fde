"""High-level library API — the programmatic equivalent of the CLI.

For users who drive the framework from Python::

    import mcmda_tpu.api as api
    cfg = api.load_config("configs/mri2ct.json")
    src = api.train_source(cfg, src_vols, src_labs, out_dir="runs/src")
    ad  = api.adapt(cfg, src, src_vols, src_labs, tgt_vols, out_dir="runs/ad")
    table = api.evaluate(cfg, ad, test_vols, test_labs)
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np

from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.data import pipeline, volumes as vio
from mcmda_tpu.evaluation import report
from mcmda_tpu.train import adapt as adapt_mod, loop, source as source_mod
from mcmda_tpu.utils import checkpoint as ckpt, logging as mlog


def load_config(path: str | None = None) -> ExperimentConfig:
    if path is None:
        return ExperimentConfig()
    with open(path) as f:
        return ExperimentConfig.from_json(f.read())


def _std_feed(ds, cfg, seed, with_labels):
    sampler = iter(pipeline.BatchSampler(
        ds, cfg.data.batch_size, seed=seed,
        num_classes=cfg.data.num_classes if with_labels else None))
    return pipeline.prefetch_to_device(sampler)


def train_source(cfg: ExperimentConfig, volumes: Sequence[np.ndarray],
                 labels: Sequence[np.ndarray], *, out_dir: str | None = None,
                 steps: int | None = None) -> source_mod.SourceState:
    """Config 2: supervised source training. Returns the trained state."""
    ds = vio.volumes_to_slices(volumes, labels,
                               context=cfg.data.context_slices,
                               drop_empty=True)
    state = source_mod.init_state(jax.random.key(cfg.run.seed), cfg)
    state, start = loop.maybe_resume(out_dir, state)
    step = jax.jit(source_mod.make_train_step(cfg))
    logger = mlog.MetricsLogger(os.path.join(out_dir, "metrics.jsonl")
                                if out_dir else None, echo=False)
    state, _ = loop.run(step, state, _std_feed(ds, cfg, cfg.run.seed + 1,
                                               True),
                        steps or cfg.source.steps, seed=cfg.run.seed,
                        log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every if out_dir else 0,
                        ckpt_dir=out_dir, logger=logger, start_step=start)
    return state


def adapt(cfg: ExperimentConfig, source_state: source_mod.SourceState,
          src_volumes: Sequence[np.ndarray], src_labels,
          tgt_volumes: Sequence[np.ndarray], *, out_dir: str | None = None,
          steps: int | None = None,
          pretrain_steps: int | None = None) -> adapt_mod.AdaptState:
    """Configs 3+4: critic pretrain then PnP-AdaNet adaptation."""
    src_ds = vio.volumes_to_slices(src_volumes, src_labels,
                                   context=cfg.data.context_slices,
                                   drop_empty=True)
    tgt_ds = vio.volumes_to_slices(tgt_volumes,
                                   context=cfg.data.context_slices)
    state = adapt_mod.init_state(jax.random.key(cfg.run.seed + 2), cfg,
                                 source_state.params, source_state.bn_state)
    state, start = loop.maybe_resume(out_dir, state)
    s_it = iter(pipeline.BatchSampler(src_ds, cfg.data.batch_size,
                                      seed=cfg.run.seed + 3))
    t_it = iter(pipeline.BatchSampler(tgt_ds, cfg.data.batch_size,
                                      seed=cfg.run.seed + 4))
    pairs = ({"src_image": a["image"], "tgt_image": b["image"]}
             for a, b in zip(s_it, t_it))
    feed = pipeline.prefetch_to_device(pairs)
    logger = mlog.MetricsLogger(os.path.join(out_dir, "metrics.jsonl")
                                if out_dir else None, echo=False)
    n_pre = (pretrain_steps if pretrain_steps is not None
             else cfg.adapt.pretrain_steps)
    n_adapt = steps or cfg.adapt.steps
    if n_pre and start < n_pre:
        pre = jax.jit(adapt_mod.make_adapt_step(cfg, train_g=False))
        state, _ = loop.run(pre, state, feed, n_pre, seed=cfg.run.seed + 5,
                            log_every=cfg.run.log_every, logger=logger,
                            start_step=start)
        start = n_pre
    # unsupervised checkpoint selection (class-ratio prior, docs/design.md
    # section 5c) — same machinery as the CLI; fires at checkpoint intervals
    ref_fracs = adapt_mod.label_fractions(src_labels, cfg.data.num_classes)
    probe_idx = np.linspace(0, len(tgt_ds) - 1,
                            min(64, len(tgt_ds))).astype(int)
    probe = adapt_mod.make_class_ratio_probe(cfg, tgt_ds.images[probe_idx])
    selector = adapt_mod.ClassRatioSelector(
        ref_fracs, warmup_step=adapt_mod.select_warmup(cfg))
    best_stash = {}

    def select_probe(step_i, st, _metrics=None):
        selector.update(step_i, np.asarray(probe(st)))
        if selector.best_step == step_i:
            best_stash["dam_params"] = jax.device_get(st.dam_params)
            best_stash["tgt_bn"] = jax.device_get(st.tgt_bn)
        selector.save(out_dir)

    step = jax.jit(adapt_mod.make_adapt_step(cfg))
    sel_every = cfg.adapt.select_every or cfg.run.ckpt_every
    sel_every = min(sel_every, max(1, n_adapt // 4))  # short runs
    state, _ = loop.run(step, state, feed, n_pre + n_adapt,
                        seed=cfg.run.seed + 6, log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every if out_dir else 0,
                        ckpt_dir=out_dir, logger=logger, start_step=start,
                        probe_every=sel_every if out_dir else 0,
                        probe=select_probe if out_dir else None,
                        protect_steps=lambda: (
                            {selector.best_step}
                            if selector.best_step is not None else ()))
    if out_dir and best_stash and selector.best_step is not None:
        base = os.path.join(out_dir, f"step_{selector.best_step:08d}")
        if not (os.path.isdir(base) or os.path.exists(base + ".npz")):
            sel_state = jax.device_get(state).replace(
                dam_params=best_stash["dam_params"],
                tgt_bn=best_stash["tgt_bn"],
                step=np.asarray(selector.best_step, np.int32))
            ckpt.save(out_dir, sel_state, step=selector.best_step,
                      block=True)
    return state


def evaluate(cfg: ExperimentConfig, state, volumes: Sequence[np.ndarray],
             labels: Sequence[np.ndarray], *, spacing=None) -> dict:
    """Configs 1+5: 3D-stitched Dice/ASSD table for a source or adapted
    state (dispatches on the state type)."""
    if isinstance(state, adapt_mod.AdaptState):
        fwd = jax.jit(lambda img: adapt_mod.adapted_forward(cfg)(state, img))
    else:
        fwd = jax.jit(lambda img: source_mod.make_eval_forward(cfg)(
            state.params, state.bn_state, img))
    return report.evaluate_volumes(fwd, volumes, labels,
                                   context=cfg.data.context_slices,
                                   batch_size=cfg.data.batch_size,
                                   spacing=spacing)
