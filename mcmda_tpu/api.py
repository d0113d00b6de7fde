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
from mcmda_tpu.train import adapt as adapt_mod, drivers, loop, \
    source as source_mod
from mcmda_tpu.utils import checkpoint as ckpt, logging as mlog


def load_config(path: str | None = None) -> ExperimentConfig:
    if path is None:
        return ExperimentConfig()
    with open(path) as f:
        return ExperimentConfig.from_json(f.read())


# Device-resident cutoff, shared with the CLI: datasets under 1 GB live in
# HBM and batches gather on device inside the jitted step (zero per-step
# host transfer); larger ones stream through a host sampler + prefetch.
_ON_DEVICE_BYTES = 1 << 30


def train_source(cfg: ExperimentConfig, volumes: Sequence[np.ndarray],
                 labels: Sequence[np.ndarray], *, out_dir: str | None = None,
                 steps: int | None = None,
                 dp: int = 0) -> source_mod.SourceState:
    """Config 2: supervised source training. Returns the trained state.

    ``dp``: data-parallel over N devices — identical execution to the CLI's
    ``--dp N`` (same drivers.wrap_dp / device_resident_dp plumbing; under an
    initialized multi-process world the pod mesh is used automatically)."""
    import itertools
    ds = vio.volumes_to_slices(volumes, labels,
                               context=cfg.data.context_slices,
                               drop_empty=True)
    state = source_mod.init_state(jax.random.key(cfg.run.seed), cfg)
    state, start = loop.maybe_resume(out_dir, state)
    n_steps = steps or cfg.source.steps
    inner = 1
    # shard FIRST, then apply the cutoff to the LOCAL shard — the CLI's
    # semantics (a dataset too big globally may still fit per host)
    ds_loc = ds
    if drivers.multihost_active():
        from mcmda_tpu.parallel import multihost
        ds_loc = multihost.shard_dataset(ds, jax.device_count())
    if ds_loc.images.nbytes < _ON_DEVICE_BYTES:
        inner = drivers.pick_inner(n_steps, cfg.run.log_every,
                                   cfg.run.ckpt_every)
        dd = pipeline.to_device_arrays(ds_loc, cfg.data.num_classes,
                                       sharding=drivers.batch_sharding_for(
                                           dp))
        step, device_data = drivers.device_resident_dp(
            cfg, source_mod.make_train_step, dp, inner, lambda _shd: dd)
        feed = itertools.repeat(device_data)
    else:
        step, global_batch, to_global = drivers.wrap_dp(
            cfg, source_mod.make_train_step, dp)
        sampler = iter(pipeline.BatchSampler(
            ds, global_batch, seed=drivers.host_seed(cfg.run.seed + 1),
            num_classes=cfg.data.num_classes))
        feed = to_global(sampler)
    logger = mlog.MetricsLogger(os.path.join(out_dir, "metrics.jsonl")
                                if out_dir else None, echo=False)
    state, _ = loop.run(step, state, feed,
                        n_steps, seed=cfg.run.seed,
                        log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every if out_dir else 0,
                        ckpt_dir=out_dir, logger=logger, start_step=start,
                        inner_steps=inner)
    return state


def adapt(cfg: ExperimentConfig, source_state: source_mod.SourceState,
          src_volumes: Sequence[np.ndarray], src_labels,
          tgt_volumes: Sequence[np.ndarray], *, out_dir: str | None = None,
          steps: int | None = None,
          pretrain_steps: int | None = None,
          dp: int = 0) -> adapt_mod.AdaptState:
    """Configs 3+4: critic pretrain then PnP-AdaNet adaptation.

    ``dp``: data-parallel over N devices, with device-resident datasets when
    they fit HBM — the CLI's ``--dp N`` execution, via the same
    drivers plumbing."""
    import itertools
    src_ds = vio.volumes_to_slices(src_volumes, src_labels,
                                   context=cfg.data.context_slices,
                                   drop_empty=True)
    tgt_ds = vio.volumes_to_slices(tgt_volumes,
                                   context=cfg.data.context_slices)
    state = adapt_mod.init_state(jax.random.key(cfg.run.seed + 2), cfg,
                                 source_state.params, source_state.bn_state)
    state, start = loop.maybe_resume(out_dir, state)
    logger = mlog.MetricsLogger(os.path.join(out_dir, "metrics.jsonl")
                                if out_dir else None, echo=False)
    n_pre = (pretrain_steps if pretrain_steps is not None
             else cfg.adapt.pretrain_steps)
    n_adapt = steps or cfg.adapt.steps
    # probe inputs are fixed BEFORE any sharding so selection is
    # configuration-independent (matches the CLI)
    probe_idx_early = np.linspace(0, len(tgt_ds) - 1,
                                  min(64, len(tgt_ds))).astype(int)
    probe_images = tgt_ds.images[probe_idx_early]

    # shard FIRST, then apply the cutoff to the LOCAL shards (CLI semantics)
    src_loc, tgt_loc = src_ds, tgt_ds
    if drivers.multihost_active():
        from mcmda_tpu.parallel import multihost
        src_loc = multihost.shard_dataset(src_ds, jax.device_count())
        tgt_loc = multihost.shard_dataset(tgt_ds, jax.device_count())
    on_device = (src_loc.images.nbytes
                 + tgt_loc.images.nbytes) < _ON_DEVICE_BYTES
    sel_every = cfg.adapt.select_every or cfg.run.ckpt_every
    sel_every = min(sel_every, max(1, n_adapt // 4))  # short runs
    inner = drivers.pick_inner(n_pre, n_adapt, cfg.run.log_every,
                               cfg.run.ckpt_every, sel_every) \
        if on_device else 1

    if on_device:
        shd = drivers.batch_sharding_for(dp)
        device_data = {
            "src": pipeline.to_device_arrays(src_loc, sharding=shd),
            "tgt": pipeline.to_device_arrays(tgt_loc, sharding=shd)}

        def mk_step(**kw):
            return drivers.device_resident_dp(
                cfg, adapt_mod.make_adapt_step, dp, inner,
                lambda _shd: device_data, **kw)[0]

        def make_feed():
            return itertools.repeat(device_data)
    else:
        def mk_step(**kw):
            return drivers.wrap_dp(cfg, adapt_mod.make_adapt_step, dp,
                                   **kw)[0]

        per_host, to_global = drivers.feed_plumbing(cfg, dp)
        s_it = iter(pipeline.BatchSampler(
            src_ds, per_host, seed=drivers.host_seed(cfg.run.seed + 3)))
        t_it = iter(pipeline.BatchSampler(
            tgt_ds, per_host, seed=drivers.host_seed(cfg.run.seed + 4)))

        def make_feed():
            pairs = ({"src_image": a["image"], "tgt_image": b["image"]}
                     for a, b in zip(s_it, t_it))
            return to_global(pairs)

    if n_pre and start < n_pre:
        state, _ = loop.run(mk_step(train_g=False), state, make_feed(),
                            n_pre, seed=cfg.run.seed + 5,
                            log_every=cfg.run.log_every, logger=logger,
                            start_step=start, inner_steps=inner)
        start = n_pre
    # unsupervised checkpoint selection (class-ratio prior, docs/design.md
    # section 5c) — same machinery as the CLI; scores both the live DAM and
    # (when weight averaging is on) the EMA average, selecting the better
    ref_fracs = adapt_mod.label_fractions(src_labels, cfg.data.num_classes)
    selector = adapt_mod.ClassRatioSelector(
        ref_fracs, warmup_step=adapt_mod.select_warmup(cfg),
        policy=cfg.adapt.select_policy, topk=cfg.adapt.select_topk,
        smooth_window=adapt_mod.smooth_window(cfg))
    select_probe = adapt_mod.SelectionProbe(
        adapt_mod.make_select_bundle(cfg, probe_images,
                                     dual=cfg.adapt.dam_ema > 0),
        primary=selector, cr_selector=selector, save_dir=out_dir)
    best_stash = select_probe.best_stash

    state, _ = loop.run(mk_step(), state, make_feed(), n_pre + n_adapt,
                        seed=cfg.run.seed + 6, log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every if out_dir else 0,
                        ckpt_dir=out_dir, logger=logger, start_step=start,
                        inner_steps=inner,
                        probe_every=sel_every if out_dir else 0,
                        probe=select_probe if out_dir else None,
                        protect_steps=select_probe.protect_steps)
    select_probe.finalize()  # final deferred tick + smoothing tail
    if out_dir and best_stash and selector.best_step is not None:
        base = os.path.join(out_dir, f"step_{selector.best_step:08d}")
        if not (os.path.isdir(base) or os.path.exists(base + ".npz")):
            sel_state = jax.device_get(state).replace(
                dam_params=best_stash["dam_params"],
                tgt_bn=best_stash["tgt_bn"],
                step=np.asarray(selector.best_step, np.int32))
            if sel_state.ema_w is not None:
                # the stash holds the CHOSEN variant; zero the accumulator
                # so eval never re-averages (see cli.cmd_adapt)
                sel_state = sel_state.replace(
                    ema_w=np.zeros((), np.float32))
            ckpt.save(out_dir, sel_state, step=selector.best_step,
                      block=True)
    return state


def _forward_for(cfg: ExperimentConfig, state):
    """Jitted eval forward for a source or adapted state (dispatch on
    type) — shared by evaluate and predict.  Applies ``run.eval_bf16``
    (serving-only precision) via ``config.eval_view``."""
    from mcmda_tpu import config as config_mod
    cfg = config_mod.eval_view(cfg)
    if isinstance(state, adapt_mod.AdaptState):
        return jax.jit(lambda img: adapt_mod.adapted_forward(cfg)(state, img))
    return jax.jit(lambda img: source_mod.make_eval_forward(cfg)(
        state.params, state.bn_state, img))


def predict(cfg: ExperimentConfig, state, volumes: Sequence[np.ndarray], *,
            postprocess: str | None = None,
            tta: str | None = None) -> list[np.ndarray]:
    """Serving: per-volume segmentation masks [S,H,W] uint8 (argmax labels)
    for unlabeled volumes — each volume is ONE scanned device dispatch (E1).

    ``postprocess`` / ``tta`` as in :func:`evaluate` (defaulting to
    ``cfg.run.eval_postprocess`` / ``cfg.run.eval_tta``).  Write results with
    ``mcmda_tpu.data.volumes.save_volume`` or via the ``predict`` CLI."""
    from mcmda_tpu.data import splits
    from mcmda_tpu.evaluation import inference, postprocess as pp_mod
    pp = pp_mod.get(postprocess if postprocess is not None
                    else cfg.run.eval_postprocess)
    fwd = _forward_for(cfg, state)
    wrap = inference.get_tta(tta if tta is not None else cfg.run.eval_tta)
    if wrap is not None:
        fwd = wrap(fwd)
    preds = []
    for vol in volumes:
        pred = inference.predict_volume(fwd, vol,
                                        context=cfg.data.context_slices,
                                        batch_size=cfg.data.batch_size)
        if pp is not None:
            pred = pp(pred, splits.STRUCTURES)
        preds.append(pred.astype(np.uint8))
    return preds


def evaluate(cfg: ExperimentConfig, state, volumes: Sequence[np.ndarray],
             labels: Sequence[np.ndarray], *, spacing=None,
             postprocess: str | None = None, tta: str | None = None) -> dict:
    """Configs 1+5: 3D-stitched Dice/ASSD table for a source or adapted
    state (dispatches on the state type).

    ``postprocess``: "none"/"cc" — defaults to ``cfg.run.eval_postprocess``,
    exactly like ``evaluate`` on the CLI (the shipped benchmark configs set
    "cc", the largest-connected-component filter; the raw table is kept
    under the returned dict's ``"raw"`` key).

    ``tta``: "none"/"flip" test-time augmentation — defaults to
    ``cfg.run.eval_tta`` (flip averages probabilities over the horizontal
    flip, ``evaluation.inference.tta_flip``)."""
    from mcmda_tpu.evaluation import inference, postprocess as pp_mod
    pp = pp_mod.get(postprocess if postprocess is not None
                    else cfg.run.eval_postprocess)
    fwd = _forward_for(cfg, state)
    wrap = inference.get_tta(tta if tta is not None else cfg.run.eval_tta)
    if wrap is not None:
        fwd = wrap(fwd)
    return report.evaluate_volumes(fwd, volumes, labels,
                                   context=cfg.data.context_slices,
                                   batch_size=cfg.data.batch_size,
                                   spacing=spacing, postprocess=pp)
