"""Command-line drivers (SURVEY L4/L5 + C1c).

The reference exposed ``python source_segmenter.py`` / ``python main.py`` /
``python evaluate.py`` with tf.app.flags; the rebuild exposes one CLI::

    python -m mcmda_tpu train-source   --config configs/mri2ct.json --out runs/src   [--synthetic]
    python -m mcmda_tpu adapt          --config ... --source-ckpt runs/src/step_... --out runs/adapt
    python -m mcmda_tpu evaluate       --config ... --ckpt runs/adapt/step_... [--source-only]

``--synthetic`` swaps the MMWHS volume directories for the generated phantom
dataset (same code path, smaller shapes come from the config).
``--set a.b=v`` overrides any config field (the reference's flag knobs:
adapt.plug_depth, adapt.k_d, critic.taps, lrs, ...).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _load_config(path, overrides):
    from mcmda_tpu.config import ExperimentConfig
    if path:
        with open(path) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = ExperimentConfig()
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        cfg = _apply_override(cfg, key.split("."), val)
    return cfg


def _apply_override(obj, keys, val):
    if len(keys) == 1:
        try:
            parsed = json.loads(val)
        except (json.JSONDecodeError, ValueError):
            parsed = val  # bare string, e.g. plug_depth=rm2
        if isinstance(parsed, list):
            parsed = tuple(parsed)
        if keys[0] == "compute_dtype" and isinstance(parsed, str):
            import jax.numpy as _jnp
            parsed = _jnp.dtype(parsed).type
        return dataclasses.replace(obj, **{keys[0]: parsed})
    sub = getattr(obj, keys[0])
    return dataclasses.replace(obj, **{keys[0]: _apply_override(sub, keys[1:],
                                                                val)})


def _get_data(args, cfg, direction):
    """Returns ((src_vols, src_labs), tgt_train_vols, (tgt_test_vols,
    tgt_test_labs))."""
    if args.synthetic:
        from mcmda_tpu.data import synthetic
        size = cfg.data.slice_size
        depth = max(16, size // 4)
        src_dom, tgt_dom = (("mri", "ct") if direction == "mri2ct"
                            else ("ct", "mri"))
        sv, sl = synthetic.make_dataset(0, src_dom, args.synthetic_volumes,
                                        depth, size)
        tv, tl = synthetic.make_dataset(0, tgt_dom, args.synthetic_volumes,
                                        depth, size)
        n_test = max(1, args.synthetic_volumes // 4)
        return (sv, sl), tv[:-n_test], (tv[-n_test:], tl[-n_test:])
    from mcmda_tpu.data import mmwhs
    return mmwhs.load_benchmark(args.data_root, direction)


# execution-strategy plumbing shared with the library API (train/drivers.py)
from mcmda_tpu.train.drivers import (  # noqa: E402
    feed as _feed,
    is_primary as _is_primary,
    multihost_active as _multihost_active,
    pick_inner as _pick_inner,
)


def _maybe_init_multihost(args) -> bool:
    """Join a multi-process world when requested (TPU pods auto-detect; the
    CPU tier passes coordinator/num-processes/process-id explicitly)."""
    if not getattr(args, "multihost", False):
        return False
    from mcmda_tpu.parallel import multihost
    return multihost.initialize(args.coordinator, args.num_processes,
                                args.process_id,
                                cpu_gloo=args.mh_cpu_gloo)


def cmd_train_source(args):
    import jax
    from mcmda_tpu.data import pipeline, volumes as vio
    from mcmda_tpu.train import loop, source
    from mcmda_tpu.utils import logging as mlog

    cfg = _load_config(args.config, args.set)
    _maybe_init_multihost(args)
    (src_vols, src_labs), _, _ = _get_data(args, cfg, args.direction)
    ds = vio.volumes_to_slices(src_vols, src_labs,
                               context=cfg.data.context_slices,
                               drop_empty=True)
    print(f"source training: {len(ds)} slices from {len(src_vols)} volumes",
          flush=True)
    state = source.init_state(jax.random.key(cfg.run.seed), cfg)
    if args.from_ckpt:  # explicit resume point beats --out's implicit latest
        from mcmda_tpu.utils import checkpoint as _ck
        state = _ck.restore(_resolve_ckpt(args.from_ckpt), state)
        start = int(state.step)
    else:
        state, start = loop.maybe_resume(args.out, state)
    # device-resident dataset + on-device sampling when it fits HBM (zero
    # per-step host transfer); sharded across replicas under single-process
    # DP and across hosts' devices under multi-host (per-host input
    # sharding); host sampler + global-batch assembly otherwise
    if _multihost_active():
        from mcmda_tpu.parallel import multihost
        ds_local = multihost.shard_dataset(ds, jax.device_count())
    else:
        ds_local = ds
    on_device = ds_local.images.nbytes < 1 << 30
    print(f"feed path: {'device-resident' if on_device else 'host-sampler'}"
          f"{' (per-host sharded)' if _multihost_active() else ''}",
          flush=True)
    inner = 1
    if on_device:
        import itertools
        # fuse dispatches up to the logging grain (hides dispatch latency)
        inner = _pick_inner(cfg.source.steps, cfg.run.log_every,
                            cfg.run.ckpt_every)
        step_fn, device_data = _device_resident_dp(
            cfg, source.make_train_step, args, inner,
            lambda shd: pipeline.to_device_arrays(
                ds_local if shd is not None and _multihost_active() else ds,
                cfg.data.num_classes, sharding=shd))
        feed = itertools.repeat(device_data)
    else:
        step_fn, global_batch, to_global = _wrap_dp(cfg,
                                                    source.make_train_step,
                                                    args)
        sampler = iter(pipeline.BatchSampler(ds, global_batch,
                                             seed=_host_seed(cfg.run.seed + 1),
                                             num_classes=cfg.data.num_classes))
        feed = to_global(sampler)
    logger = mlog.MetricsLogger(
        os.path.join(args.out, "metrics.jsonl") if args.out else None,
        tensorboard_dir=os.path.join(args.out, "tb") if args.out else None)

    # periodic per-volume Dice probe on one source volume (curve monitoring,
    # the reference's TensorBoard habit)
    from mcmda_tpu.evaluation import report as report_mod
    val_vol, val_lab = src_vols[-1], src_labs[-1]

    # ONE stable forward across all checkpoint callbacks: state enters as
    # jit arguments (fwd_args), so every callback reuses a single compiled
    # executable instead of recompiling (and retaining each checkpoint's
    # params in the inference scan cache) per call
    _eval_raw = source.make_eval_forward(cfg)

    def _val_fwd(img, params, bn_state):
        return _eval_raw(params, bn_state, img)

    def val_cb(step_i, st, _metrics=None):
        agg = report_mod.evaluate_volumes(
            _val_fwd, [val_vol], [val_lab], context=cfg.data.context_slices,
            batch_size=cfg.data.batch_size,
            fwd_args=(st.params, st.bn_state))
        logger.log(step_i, {"val_dice": agg["mean"]["dice"]})

    state, _ = loop.run(step_fn, state, feed, cfg.source.steps,
                        seed=cfg.run.seed, log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every, ckpt_dir=args.out,
                        logger=logger, start_step=start,
                        callback=val_cb if args.out else None,
                        inner_steps=inner)
    print(f"done; final checkpoint in {args.out}")


def _host_seed(seed: int) -> int:
    """Per-host sampler seed (shared with the library API)."""
    from mcmda_tpu.train import drivers
    return drivers.host_seed(seed)


def _wrap_dp(cfg, make_step, args, **mk_kwargs):
    """(step_fn, per-host global batch, feed transform) — see
    drivers.wrap_dp; the CLI contributes only --dp."""
    from mcmda_tpu.train import drivers
    return drivers.wrap_dp(cfg, make_step, dp=getattr(args, "dp", 0) or 0,
                           **mk_kwargs)


def _device_resident_dp(cfg, make_step, args, inner, data_builder,
                        **mk_kwargs):
    """Device-resident dataset + scanned on-device-sampling step — see
    drivers.device_resident_dp; the CLI contributes only --dp."""
    from mcmda_tpu.train import drivers
    return drivers.device_resident_dp(cfg, make_step,
                                      getattr(args, "dp", 0) or 0, inner,
                                      data_builder, **mk_kwargs)


def cmd_adapt(args):
    import jax
    from mcmda_tpu.data import pipeline, volumes as vio
    from mcmda_tpu.train import adapt, loop, source
    from mcmda_tpu.utils import checkpoint, logging as mlog

    cfg = _load_config(args.config, args.set)
    _maybe_init_multihost(args)
    (src_vols, src_labs), tgt_train, _ = _get_data(args, cfg, args.direction)
    src_ds = vio.volumes_to_slices(src_vols, src_labs,
                                   context=cfg.data.context_slices,
                                   drop_empty=True)
    tgt_ds = vio.volumes_to_slices(tgt_train,
                                   context=cfg.data.context_slices)
    # unsupervised-selection inputs, fixed BEFORE any per-host sharding so
    # every process scores the identical probe: up to 64 target slices spread
    # evenly + the source-label class-fraction prior
    probe_idx = np.linspace(0, len(tgt_ds) - 1,
                            min(64, len(tgt_ds))).astype(int)
    probe_images = tgt_ds.images[probe_idx]
    ref_fracs = adapt.label_fractions(src_labs, cfg.data.num_classes)
    # K1 handoff: restore the phase-1 source checkpoint into BOTH the frozen
    # source path and (via init_state) the DAM initialization
    src_state = source.init_state(jax.random.key(0), cfg)
    src_state = checkpoint.restore(_resolve_ckpt(args.source_ckpt), src_state)
    state = adapt.init_state(jax.random.key(cfg.run.seed + 2), cfg,
                             src_state.params, src_state.bn_state)
    if args.from_ckpt:
        state = checkpoint.restore(_resolve_ckpt(args.from_ckpt), state)
        start = int(state.step)
    else:
        state, start = loop.maybe_resume(args.out, state)

    if _multihost_active():
        from mcmda_tpu.parallel import multihost
        src_ds = multihost.shard_dataset(src_ds, jax.device_count())
        tgt_ds = multihost.shard_dataset(tgt_ds, jax.device_count())
    on_device = (src_ds.images.nbytes + tgt_ds.images.nbytes) < 1 << 30
    if on_device:
        import itertools
        shd = None
        if _multihost_active():
            from mcmda_tpu.parallel import mesh as mesh_mod, multihost
            shd = mesh_mod.batch_sharding(multihost.global_mesh())
        elif args.dp and args.dp > 1:
            from mcmda_tpu.parallel import mesh as mesh_mod
            shd = mesh_mod.batch_sharding(mesh_mod.make_mesh(args.dp))
        device_data = {"src": pipeline.to_device_arrays(src_ds, sharding=shd),
                       "tgt": pipeline.to_device_arrays(tgt_ds, sharding=shd)}

        def make_feed():
            return itertools.repeat(device_data)
    else:
        _, per_host, to_global = _wrap_dp(cfg, adapt.make_adapt_step, args)
        src_sampler = iter(pipeline.BatchSampler(
            src_ds, per_host, seed=_host_seed(cfg.run.seed + 3)))
        tgt_sampler = iter(pipeline.BatchSampler(
            tgt_ds, per_host, seed=_host_seed(cfg.run.seed + 4)))

        def make_feed():
            def pair_stream():
                for sb, tb in zip(src_sampler, tgt_sampler):
                    yield {"src_image": sb["image"],
                           "tgt_image": tb["image"]}
            return to_global(pair_stream())

    logger = mlog.MetricsLogger(
        os.path.join(args.out, "metrics.jsonl") if args.out else None,
        tensorboard_dir=os.path.join(args.out, "tb") if args.out else None)

    # periodic qualitative dumps (the reference's T2 snapshot images);
    # jitted ONCE — state is an argument, so callbacks never retrace
    snap_batch = tgt_ds.images[:4]
    snap_fwd = jax.jit(adapt.adapted_forward(cfg))

    # unsupervised checkpoint selection: adaptation quality peaks mid-run
    # and collapses; the selected step is written to selection.json and its
    # checkpoint is protected from pruning.  Primary signal per
    # cfg.adapt.select_signal (class-ratio prior measured near-oracle —
    # docs/design.md section 5c); the other signal is still logged.
    eq_selector = adapt.EquilibriumSelector(
        warmup_step=cfg.adapt.pretrain_steps + cfg.adapt.steps // 5)
    cr_selector = adapt.ClassRatioSelector(
        ref_fracs, warmup_step=adapt.select_warmup(cfg),
        policy=cfg.adapt.select_policy, topk=cfg.adapt.select_topk,
        smooth_window=adapt.smooth_window(cfg))
    selector = cr_selector if cfg.adapt.select_signal == "class_ratio" \
        else eq_selector
    # The probe cadence (cfg.adapt.select_every) is independent of
    # checkpointing: when the primary score improves, only the tiny
    # DAM + target-BN trees are stashed host-side (~MBs) and the selected
    # checkpoint is materialized once at run end — 250-step selection
    # granularity without 4x checkpoint I/O.  Deferred one tick
    # (SelectionProbe): each tick is one async bundle dispatch scoring both
    # weight variants (selection and evaluation must rank/use the same net,
    # VERDICT r2) and the host reads it a tick later, so the training
    # pipeline never stalls on a probe.  Selector state advances identically
    # on every process (replicated state, fixed probe); artifact writes gate
    # to process 0.
    select_probe = adapt.SelectionProbe(
        adapt.make_select_bundle(cfg, probe_images,
                                 dual=cfg.adapt.dam_ema > 0),
        primary=selector, cr_selector=cr_selector, eq_selector=eq_selector,
        logger=logger, save_dir=args.out,
        save_ok=not _multihost_active() or _is_primary())
    best_stash = select_probe.best_stash

    def snapshot_cb(step, st, metrics=None):
        from mcmda_tpu.evaluation import snapshots
        if _multihost_active() and not _is_primary():
            return
        probs = snap_fwd(st, jnp_asarray(snap_batch))
        snapshots.save_snapshot(
            os.path.join(args.out, "snapshots", f"step_{step:08d}.png"),
            snap_batch, np.asarray(probs.argmax(-1)))

    def jnp_asarray(x):
        import jax.numpy as jnp
        return jnp.asarray(x)

    sel_every = cfg.adapt.select_every or cfg.run.ckpt_every
    sel_every = min(sel_every, max(1, cfg.adapt.steps // 4))  # short runs
    inner = _pick_inner(cfg.adapt.pretrain_steps, cfg.adapt.steps,
                        cfg.run.log_every, cfg.run.ckpt_every, sel_every) \
        if on_device else 1

    def mk_step(**kw):
        if on_device:
            return _device_resident_dp(cfg, adapt.make_adapt_step, args,
                                       inner, lambda _: device_data, **kw)[0]
        return _wrap_dp(cfg, adapt.make_adapt_step, args, **kw)[0]

    # T3: discriminator warm-up phase, then the full alternating step
    if cfg.adapt.pretrain_steps and start < cfg.adapt.pretrain_steps:
        state, _ = loop.run(mk_step(train_g=False), state, make_feed(),
                            cfg.adapt.pretrain_steps, seed=cfg.run.seed + 5,
                            log_every=cfg.run.log_every, logger=logger,
                            start_step=start, inner_steps=inner)
        start = cfg.adapt.pretrain_steps
    state, _ = loop.run(mk_step(), state, make_feed(),
                        cfg.adapt.pretrain_steps + cfg.adapt.steps,
                        seed=cfg.run.seed + 6, log_every=cfg.run.log_every,
                        ckpt_every=cfg.run.ckpt_every, ckpt_dir=args.out,
                        logger=logger, start_step=start,
                        callback=snapshot_cb if args.out else None,
                        inner_steps=inner,
                        probe_every=sel_every if args.out else 0,
                        probe=select_probe if args.out else None,
                        protect_steps=select_probe.protect_steps)
    select_probe.finalize()  # final deferred tick + smoothing tail
    if selector.best_step is not None:
        print(f"selected checkpoint ({selector.signal}): "
              f"step {selector.best_step} "
              f"(score {selector.best_score:.4f})")
        if best_stash and args.out:
            # materialize the selected checkpoint: final state with the
            # stashed DAM/BN swapped in (the frozen HLM and source path are
            # unchanged across the run, optimizer state is irrelevant to
            # evaluation/resume-from-selected)
            sel_state = jax.device_get(state)
            sel_state = sel_state.replace(
                dam_params=best_stash["dam_params"],
                tgt_bn=best_stash["tgt_bn"],
                step=np.asarray(selector.best_step, np.int32))
            if sel_state.ema_w is not None:
                # the stash already materialized the CHOSEN weight variant
                # into dam_params; zero the EMA accumulator weight so any
                # later `evaluate --weights avg/auto` falls back to exactly
                # those weights instead of re-averaging with the final
                # state's (unrelated) avg trees
                sel_state = sel_state.replace(
                    ema_w=np.zeros((), np.float32))
            base = os.path.join(args.out,
                                f"step_{selector.best_step:08d}")
            if not (os.path.isdir(base) or os.path.exists(base + ".npz")):
                checkpoint.save(args.out, sel_state,
                                step=selector.best_step, block=True)
                print(f"materialized selected checkpoint at step "
                      f"{selector.best_step}")
    print(f"done; final checkpoint in {args.out}")


def _resolve_ckpt(path: str) -> str:
    """Accept a RUN DIRECTORY as --ckpt: resolve through selection.json
    (the unsupervised critic-equilibrium pick) when present, else the
    latest step.  Concrete step paths pass through unchanged."""
    if not os.path.isdir(path) or \
            os.path.basename(path.rstrip("/")).startswith("step_"):
        return path
    from mcmda_tpu.utils import checkpoint as ck
    sel = os.path.join(path, "selection.json")
    if os.path.exists(sel):
        with open(sel) as f:
            step = json.load(f)["best_step"]
        cand = os.path.join(path, f"step_{step:08d}")
        if os.path.isdir(cand) or os.path.exists(cand + ".npz"):
            print(f"using selected checkpoint step {step} (selection.json)")
            return cand
    step = ck.latest_step(path)
    if step is not None:
        return os.path.join(path, f"step_{step:08d}")
    return path


def _selected_weights(ckpt_path: str) -> str | None:
    """The weight variant ("live"/"avg") the selection probe ranked best —
    from selection.json in the run directory, iff ``ckpt_path`` IS the
    selected step.  None when no selection applies (other steps, no file,
    pre-variant selection.json)."""
    d = os.path.dirname(ckpt_path.rstrip("/"))
    base = os.path.basename(ckpt_path.rstrip("/"))
    sel = os.path.join(d, "selection.json")
    if not (base.startswith("step_") and os.path.exists(sel)):
        return None
    try:
        with open(sel) as f:
            rec = json.load(f)
        if base == f"step_{int(rec['best_step']):08d}":
            return rec.get("weights")
    except (KeyError, ValueError, OSError):
        pass
    return None


def _restore_eval_forward(cfg, args):
    """Restore the checkpoint named by ``args.ckpt`` (already resolved) and
    build the jitted eval forward — source-only or adapted, honoring
    ``--weights`` variant resolution, ``run.eval_bf16`` serving precision,
    and the fused-Pallas eval path.  Shared by ``evaluate`` and
    ``predict``."""
    import jax
    from mcmda_tpu import config as config_mod
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.train import adapt, source
    from mcmda_tpu.utils import checkpoint

    cfg = config_mod.eval_view(cfg)

    if args.source_only:
        state = source.init_state(jax.random.key(0), cfg)
        state = checkpoint.restore(args.ckpt, state)
        if cfg.run.use_pallas:
            return jax.jit(lambda img: segmenter.apply_fused_eval(
                state.params, state.bn_state, img, cfg.segmenter)[1])
        return jax.jit(lambda img: source.make_eval_forward(cfg)(
            state.params, state.bn_state, img))
    src_state = source.init_state(jax.random.key(0), cfg)
    state = adapt.init_state(jax.random.key(1), cfg, src_state.params,
                             src_state.bn_state)
    state = checkpoint.restore(args.ckpt, state)
    if args.weights == "auto":
        # prefer the variant the selection probe actually ranked best
        # (selection.json "weights", written by the adapt driver); fall
        # back to the dam_ema heuristic for pre-selection checkpoints
        rec = _selected_weights(args.ckpt)
        use_avg = (rec == "avg") if rec is not None \
            else cfg.adapt.dam_ema > 0
    else:
        use_avg = args.weights == "avg"
    if use_avg:
        print("evaluating EMA-averaged DAM weights "
              f"(adapt.dam_ema={cfg.adapt.dam_ema})")
    if cfg.run.use_pallas:
        dam, bn = adapt.eval_weights(state, use_avg)
        return jax.jit(lambda img: segmenter.apply_fused_eval(
            state.src_params, bn, img, cfg.segmenter,
            dam_params=dam, plug_depth=cfg.adapt.plug_depth)[1])
    return jax.jit(lambda img: adapt.adapted_forward(
        cfg, use_avg=use_avg)(state, img))


def cmd_evaluate(args):
    from mcmda_tpu.data import splits
    from mcmda_tpu.evaluation import report

    cfg = _load_config(args.config, args.set)
    args.ckpt = _resolve_ckpt(args.ckpt)
    _, _, (test_vols, test_labs) = _get_data(args, cfg, args.direction)
    fwd = _restore_eval_forward(cfg, args)
    from mcmda_tpu.evaluation import inference, postprocess as pp_mod
    tta = inference.get_tta(args.tta if args.tta is not None
                            else cfg.run.eval_tta)
    if tta is not None:
        fwd = tta(fwd)
    pp = pp_mod.get(args.postprocess if args.postprocess is not None
                    else cfg.run.eval_postprocess)
    agg = report.evaluate_volumes(fwd, test_vols, test_labs,
                                  context=cfg.data.context_slices,
                                  batch_size=cfg.data.batch_size,
                                  structures=splits.STRUCTURES,
                                  postprocess=pp)
    if pp is not None:
        print("raw predictions:")
        print(report.format_table(agg["raw"]))
        print("largest-connected-component filtered:")
    print(report.format_table(agg))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(agg, f, indent=2)
    return agg


_PREDICT_EXTS = (".nii", ".nii.gz", ".hdr", ".hdr.gz", ".img", ".img.gz",
                 ".npz", ".npy")


def cmd_predict(args):
    """Serving path: segmentation masks for UNLABELED volumes, written to
    disk (NIfTI/npz/npy, matching the input format by default) — the
    deployment counterpart of ``evaluate`` (which needs labels).  One
    scanned device dispatch per volume (E1)."""
    from mcmda_tpu.data import splits, volumes as vio
    from mcmda_tpu.evaluation import inference, postprocess as pp_mod

    cfg = _load_config(args.config, args.set)
    args.ckpt = _resolve_ckpt(args.ckpt)
    fwd = _restore_eval_forward(cfg, args)
    tta = inference.get_tta(args.tta if args.tta is not None
                            else cfg.run.eval_tta)
    if tta is not None:
        fwd = tta(fwd)
    pp = pp_mod.get(args.postprocess if args.postprocess is not None
                    else cfg.run.eval_postprocess)

    paths = []
    for inp in args.input:
        if os.path.isdir(inp):
            paths.extend(sorted(
                os.path.join(inp, f) for f in os.listdir(inp)
                if f.endswith(_PREDICT_EXTS)))
        else:
            paths.append(inp)
    if not paths:
        raise SystemExit(f"predict: no input volumes found in {args.input}")
    os.makedirs(args.out, exist_ok=True)

    written = []
    for p in paths:
        vol, spacing = vio.load_volume_with_spacing(p)
        if not args.no_normalize:
            vol = vio.normalize_volume(vol)
        pred = inference.predict_volume(
            fwd, vol, context=cfg.data.context_slices,
            batch_size=cfg.data.batch_size)
        if pp is not None:
            pred = pp(pred, splits.STRUCTURES)
        base = os.path.basename(p)
        for e in _PREDICT_EXTS:
            if base.endswith(e):
                stem = base[: -len(e)]
                # NIfTI-family inputs (incl. detached .hdr/.img) write
                # single-file .nii.gz; npz/npy keep their format
                ext = args.format or (
                    ".nii.gz" if e.startswith((".nii", ".hdr", ".img"))
                    else e)
                break
        out_path = os.path.join(args.out, f"{stem}_pred{ext}")
        vio.save_volume(out_path, pred.astype(np.uint8), spacing)
        vox = {splits.STRUCTURES.get(c, str(c)): int(n)
               for c, n in zip(*np.unique(pred, return_counts=True))
               if c != 0}
        print(f"{p} -> {out_path}  {vox}", flush=True)
        written.append(out_path)
    return written


def build_parser():
    p = argparse.ArgumentParser(prog="mcmda_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", default=None,
                        help="ExperimentConfig JSON (default: built-in)")
        sp.add_argument("--set", action="append", metavar="K.EY=VAL",
                        help="config override, e.g. adapt.plug_depth=rm2")
        sp.add_argument("--direction", default="mri2ct",
                        choices=["mri2ct", "ct2mri"])
        sp.add_argument("--data-root", default=None,
                        help="MMWHS root (see data/mmwhs.py layout)")
        sp.add_argument("--synthetic", action="store_true",
                        help="use the generated phantom dataset")
        sp.add_argument("--synthetic-volumes", type=int, default=4)
        sp.add_argument("--dp", type=int, default=0,
                        help="data-parallel over N devices")
        sp.add_argument("--multihost", action="store_true",
                        help="join a multi-process (pod) world via "
                             "jax.distributed; auto-detects on TPU pods")
        sp.add_argument("--coordinator", default=None,
                        help="coordinator address host:port (manual runs)")
        sp.add_argument("--num-processes", type=int, default=None)
        sp.add_argument("--process-id", type=int, default=None)
        sp.add_argument("--mh-cpu-gloo", action="store_true",
                        help="CPU tier: use gloo cross-process collectives")

    sp = sub.add_parser("train-source", help="config 2: supervised source")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--from-ckpt", default=None,
                    help="explicit resume checkpoint (default: --out latest)")
    sp.set_defaults(fn=cmd_train_source)

    sp = sub.add_parser("adapt", help="configs 3+4: pretrain + adaptation")
    common(sp)
    sp.add_argument("--source-ckpt", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--from-ckpt", default=None,
                    help="explicit resume checkpoint (default: --out latest)")
    sp.set_defaults(fn=cmd_adapt)

    sp = sub.add_parser("evaluate", help="configs 1+5: Dice/ASSD eval")
    common(sp)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--source-only", action="store_true")
    sp.add_argument("--json-out", default=None)
    sp.add_argument("--weights", default="auto",
                    choices=["auto", "live", "avg"],
                    help="adapted eval weights: EMA-averaged DAM (avg), the "
                         "live DAM (live), or avg iff adapt.dam_ema>0 (auto)")
    sp.add_argument("--postprocess", default=None, choices=["none", "cc"],
                    help="3D prediction post-processing: largest-connected-"
                         "component per structure (cc, the benchmark "
                         "lineage's practice) or none; default "
                         "run.eval_postprocess")
    sp.add_argument("--tta", default=None, choices=["none", "flip"],
                    help="test-time augmentation: average probabilities "
                         "over the horizontal flip; default run.eval_tta")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser(
        "predict", help="serving: write segmentation masks for unlabeled "
                        "volumes (NIfTI/npz/npy)")
    sp.add_argument("--config", default=None,
                    help="ExperimentConfig JSON (default: built-in)")
    sp.add_argument("--set", action="append", metavar="K.EY=VAL",
                    help="config override, e.g. run.use_pallas=true")
    sp.add_argument("--ckpt", required=True,
                    help="run dir (resolves selection.json) or checkpoint")
    sp.add_argument("--input", required=True, nargs="+",
                    help="volume file(s) or directory of volumes")
    sp.add_argument("--out", required=True, help="output directory")
    sp.add_argument("--source-only", action="store_true",
                    help="use the source segmenter (no DAM)")
    sp.add_argument("--weights", default="auto",
                    choices=["auto", "live", "avg"])
    sp.add_argument("--postprocess", default=None, choices=["none", "cc"],
                    help="default: run.eval_postprocess")
    sp.add_argument("--tta", default=None, choices=["none", "flip"],
                    help="default: run.eval_tta")
    sp.add_argument("--format", default=None,
                    choices=[".nii", ".nii.gz", ".npz", ".npy"],
                    help="output format (default: match the input)")
    sp.add_argument("--no-normalize", action="store_true",
                    help="input volumes are already normalized (benchmark "
                         "releases); default applies the training-time "
                         "per-volume normalization")
    sp.set_defaults(fn=cmd_predict)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    np.random.seed(0)
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    cfg_probe = _load_config(args.config, args.set)
    if cfg_probe.run.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    ret = args.fn(args)
    # command fns may return rich results (evaluate returns the metric
    # table for library callers); the PROCESS exit code is success/failure
    return ret if isinstance(ret, int) else 0


if __name__ == "__main__":
    sys.exit(main())
