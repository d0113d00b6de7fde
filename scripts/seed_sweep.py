"""Seed-robustness sweep for the adaptation benchmark (VERDICT r1 item 5).

Runs the shipped adaptation recipe over N seeds on the synthetic benchmark,
tracking the full quality curve per seed, and reports THREE numbers per seed:

  - final:    Dice of the end-of-run state (what a fixed-step recipe ships)
  - selected: Dice at the critic-equilibrium-selected checkpoint
              (train.adapt.EquilibriumSelector — unsupervised)
  - oracle:   best Dice over all evaluated checkpoints (upper bound; uses
              target labels, for validation only)

plus mean +/- spread aggregates. Honest-artifact rule: results/*.json records
the mean over seeds, never a best seed.

Usage (real TPU, ~30 min for 5 seeds):
    python scripts/seed_sweep.py --direction ct2mri --seeds 5 \
        --out results/ct2mri_seed_sweep.json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def device_dice(fwd_args_state, vol_stacks, true_onehot_sums, true_labels,
                fwd, num_classes):
    """Per-structure Dice + unsupervised signals fully on device: scanned
    forward -> argmax -> one-hot confusion sums, predicted class-voxel
    counts, and mean prediction entropy; ONE small readback."""
    def run(stacks, state):
        def body(ent_sum, xb):
            probs = fwd(state, xb)
            p = jnp.clip(probs.astype(jnp.float32), 1e-8, 1.0)
            ent = -jnp.sum(p * jnp.log(p), axis=-1)
            return ent_sum + jnp.sum(ent), \
                jnp.argmax(probs, -1).astype(jnp.int32)
        ent_total, preds = jax.lax.scan(body, jnp.float32(0.0), stacks)
        pred_oh = jax.nn.one_hot(preds.reshape(-1), num_classes,
                                 dtype=jnp.float32)
        true_oh = jax.nn.one_hot(true_labels.reshape(-1), num_classes,
                                 dtype=jnp.float32)
        inter = jnp.sum(pred_oh * true_oh, axis=0)
        psum = jnp.sum(pred_oh, axis=0)
        mean_ent = ent_total / pred_oh.shape[0]
        return inter, psum, mean_ent
    return run(vol_stacks, fwd_args_state)


def main():
    from mcmda_tpu.utils import jax_cache
    jax_cache.enable()
    p = argparse.ArgumentParser()
    p.add_argument("--direction", default="ct2mri",
                   choices=["mri2ct", "ct2mri"])
    p.add_argument("--config", default=None)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--volumes", type=int, default=5)
    p.add_argument("--depth", type=int, default=64)
    p.add_argument("--source-steps", type=int, default=None)
    p.add_argument("--adapt-steps", type=int, default=None)
    # probe/selection cadence: DEFAULTS TO THE CONFIG's select_every so a
    # sweep of a pinned recipe is the recipe (the per-block RNG fold makes
    # the cadence part of the trajectory, not just the probe schedule — a
    # mismatched override silently sweeps a DIFFERENT run)
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--set", action="append", metavar="K.EY=VAL",
                   help="config override, same syntax as the CLI "
                        "(e.g. --set adapt.tgt_feats_bf16=true)")
    p.add_argument("--out", default=None)
    p.add_argument("--first-seed", type=int, default=0,
                   help="first seed index (resume/shard a sweep)")
    p.add_argument("--merge", action="store_true",
                   help="preload per-seed rows from an existing --out and "
                        "merge (resume after a crash / add seeds)")
    args = p.parse_args()

    from mcmda_tpu import cli
    from mcmda_tpu.data import pipeline, synthetic, volumes as vio
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.train import adapt as adapt_mod, loop, source as source_mod

    cfg = cli._load_config(args.config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", f"{args.direction}.json"), getattr(args, "set", None))
    if args.source_steps:
        cfg = dataclasses.replace(cfg, source=dataclasses.replace(
            cfg.source, steps=args.source_steps))
    if args.adapt_steps:
        cfg = dataclasses.replace(cfg, adapt=dataclasses.replace(
            cfg.adapt, steps=args.adapt_steps))
    size = cfg.data.slice_size
    src_dom, tgt_dom = (("mri", "ct") if args.direction == "mri2ct"
                        else ("ct", "mri"))
    sv, sl = synthetic.make_dataset(0, src_dom, args.volumes + 1,
                                    args.depth, size)
    tv, tl = synthetic.make_dataset(0, tgt_dom, args.volumes + 1,
                                    args.depth, size)
    src_vols, src_labs = sv[:-1], sl[:-1]
    tgt_train = tv[:-1]
    test_vol, test_lab = tv[-1], tl[-1]
    nc = cfg.data.num_classes

    # ---- source training (once, device-resident scanned steps) ----
    print(f"[sweep] source training {cfg.source.steps} steps...", flush=True)
    t0 = time.time()
    src_ds = vio.volumes_to_slices(src_vols, src_labs,
                                   context=cfg.data.context_slices,
                                   drop_empty=True)
    src_data = pipeline.to_device_arrays(src_ds, nc)
    s_state = source_mod.init_state(jax.random.key(cfg.run.seed), cfg)
    inner = 50
    s_step = jax.jit(loop.scanned_step(
        source_mod.make_train_step(cfg, sample_from_device=True), inner),
        donate_argnums=(0,))
    import itertools
    s_state, _ = loop.run(s_step, s_state, itertools.repeat(src_data),
                          cfg.source.steps, seed=cfg.run.seed, log_every=0,
                          inner_steps=inner)
    print(f"[sweep] source done in {time.time() - t0:.0f}s", flush=True)

    # test volume as device-resident stacks + labels
    stacked = vio.stack_context(test_vol, cfg.data.context_slices)
    b = cfg.data.batch_size
    pad = (-stacked.shape[0]) % b
    if pad:
        stacked = np.concatenate([stacked,
                                  np.repeat(stacked[-1:], pad, 0)], 0)
    k = stacked.shape[0] // b
    vol_stacks = jnp.asarray(stacked.reshape((k, b) + stacked.shape[1:]))
    lab_pad = np.concatenate([test_lab, np.full((pad,) + test_lab.shape[1:],
                                                -1, test_lab.dtype)], 0) \
        if pad else test_lab
    true_labels = jnp.asarray(lab_pad.astype(np.int32))
    true_oh = jax.nn.one_hot(true_labels.reshape(-1), nc, dtype=jnp.float32)
    true_sums = jnp.sum(true_oh, axis=0)

    a_fwd = adapt_mod.adapted_forward(cfg)

    @jax.jit
    def probe_of(state):
        """(dice[C], pred class fractions[C], mean entropy) on the eval
        volume — dice needs labels (oracle); fractions/entropy do not."""
        inter, psum, ment = device_dice(state, vol_stacks, true_sums,
                                        true_labels, a_fwd, nc)
        d = 2.0 * inter / jnp.maximum(psum + true_sums, 1e-6)
        return d, psum / jnp.sum(psum), ment

    # the SHIPPED per-step EMA (adapt.dam_ema > 0: state.avg_* folded inside
    # the jitted train step, equilibrium-gated) — probed as its own variant
    # so a sweep with --set adapt.dam_ema=X prices the production dual
    # policy, not just the harness's block-level EMAs
    state_ema_on = cfg.adapt.dam_ema > 0.0
    if state_ema_on:
        a_fwd_avg = adapt_mod.adapted_forward(cfg, use_avg=True)

        @jax.jit
        def probe_state_ema(state):
            inter, psum, ment = device_dice(state, vol_stacks, true_sums,
                                            true_labels, a_fwd_avg, nc)
            d = 2.0 * inter / jnp.maximum(psum + true_sums, 1e-6)
            return d, psum / jnp.sum(psum), ment

    def dice_of(state):
        return probe_of(state)[0]  # [C]; classes 1..4 are the structures

    def fwd_tta(st, xb):
        p = a_fwd(st, xb)
        pf = a_fwd(st, xb[:, :, ::-1, :])
        return 0.5 * (p + pf[:, :, ::-1, :])

    @jax.jit
    def probe_tta(state):
        """(Dice[C], fracs[C], mean entropy) with flip-TTA
        (run.eval_tta="flip"): average the softmax over the horizontal
        flip — prices the eval-time TTA lever AND a TTA-robustified
        selection signal (VERDICT r4 item 4 candidate)."""
        inter, psum, ment = device_dice(state, vol_stacks, true_sums,
                                        true_labels, fwd_tta, nc)
        d = 2.0 * inter / jnp.maximum(psum + true_sums, 1e-6)
        return d, psum / jnp.sum(psum), ment

    @jax.jit
    def vol_prob_sums(state):
        """Per-slice softmax stack over the eval volume — accumulated on
        host across reservoir candidates for prediction ensembling."""
        def body(_, xb):
            return None, a_fwd(state, xb).astype(jnp.float32)
        _, probs = jax.lax.scan(body, None, vol_stacks)
        return probs  # [k, b, H, W, C]

    @jax.jit
    def dice_of_probs(probs):
        preds = jnp.argmax(probs, -1).astype(jnp.int32)
        pred_oh = jax.nn.one_hot(preds.reshape(-1), nc, dtype=jnp.float32)
        inter = jnp.sum(pred_oh * true_oh, axis=0)
        psum = jnp.sum(pred_oh, axis=0)
        return 2.0 * inter / jnp.maximum(psum + true_sums, 1e-6)

    # unsupervised reference: class-voxel fractions of the SOURCE labels
    # (a label-marginal prior from the labeled domain — no target labels)
    src_fracs = np.bincount(
        np.concatenate([l.reshape(-1) for l in src_labs]).astype(np.int64),
        minlength=nc).astype(np.float64)
    src_fracs /= src_fracs.sum()

    # source-only lower bound (through the un-adapted state)
    base_state = adapt_mod.init_state(jax.random.key(1), cfg,
                                      s_state.params, s_state.bn_state)
    no_adapt = float(jnp.mean(dice_of(base_state)[1:]))
    print(f"[sweep] no-adapt mean Dice: {no_adapt:.3f}", flush=True)

    # ---- adaptation sweep ----
    tgt_ds = vio.volumes_to_slices(tgt_train, context=cfg.data.context_slices)
    device_data = {"src": pipeline.to_device_arrays(src_ds),
                   "tgt": pipeline.to_device_arrays(tgt_ds)}
    ev = args.eval_every or cfg.adapt.select_every or 250
    n_blocks = cfg.adapt.steps // ev
    a_step = jax.jit(loop.scanned_step(adapt_mod.make_adapt_step(
        cfg, sample_from_device=True), ev), donate_argnums=(0,))

    # weight-averaged evaluation states: the minimax oscillates around a good
    # solution (adjacent-checkpoint Dice swings of +/-0.3 measured); an EMA of
    # the DAM + target-BN over the orbit is both better and far more stable
    # than any single checkpoint.  Variants: block-level EMA decay x optional
    # critic-equilibrium gate (fold a snapshot in only while the smoothed
    # |d_acc-0.5| is below tau — the late collapse shows up as the critic
    # winning decisively, measured r2).  All bias-corrected (raw EMA starts at
    # zero and is divided by the accumulated weight at eval).
    VARIANTS = {f"ema{d}" + (f"g{t}" if t else ""): (d, t)
                for d in (0.9, 0.95) for t in (None, 0.25, 0.2, 0.15)}

    @jax.jit
    def ema_update(ema_state, state, decay):
        new = (state.dam_params, state.tgt_bn)
        return jax.tree.map(lambda e, n: decay * e + (1 - decay) * n,
                            ema_state, new)

    path = args.out or os.path.join("results",
                                    f"{args.direction}_seed_sweep.json")

    def agg(key, sub=None):
        v = np.asarray([r[key][sub] if sub else r[key] for r in rows],
                       np.float64)
        return {"mean": round(float(v.mean()), 4),
                "std": round(float(v.std()), 4),
                "min": round(float(v.min()), 4),
                "max": round(float(v.max()), 4)}

    import subprocess
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip() or "unknown"
    except OSError:
        commit = "unknown"

    def write_out():
        """(Re)write the output JSON from the rows so far — called after
        EVERY seed, so a crashed/killed sweep loses at most the in-flight
        seed and can resume with --merge --first-seed."""
        out = {"direction": args.direction, "seeds": len(rows),
               # artifact provenance (ADVICE r3): which code produced this
               "commit": commit,
               "time": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
               "overrides": list(args.set or []),
               "no_adapt": round(no_adapt, 4),
               "final": agg("final"), "selected": agg("selected"),
               "selected_cr": agg("selected_cr"),
               "selected_dual": agg("selected_dual"),
               **({"selected_cr_ent": agg("selected_cr_ent")}
                  if rows and all("selected_cr_ent" in r for r in rows)
                  else {}),
               **({"selected_cfg": agg("selected_cfg")}
                  if rows and all("selected_cfg" in r for r in rows)
                  else {}),
               **({"selected_ship": agg("selected_ship"),
                   "state_ema_final": agg("state_ema_final")}
                  if rows and "selected_ship" in rows[0] else {}),
               "oracle": agg("oracle"),
               **{n: agg(n) for n in VARIANTS},
               **{f"{n}_best": agg(f"{n}_best") for n in VARIANTS},
               "tta_live": agg("tta", sub="live"),
               "src_fracs": [round(float(x), 5) for x in src_fracs],
               "per_seed": [{k: v for k, v in r.items() if k != "curve"}
                            for r in rows],
               "curves": {r["seed"]: r["curve"] for r in rows}}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, path)
        return out

    rows = []
    if args.merge and os.path.exists(path):
        prev = json.load(open(path))
        if prev.get("direction") != args.direction or \
                prev.get("overrides", []) != list(args.set or []):
            raise SystemExit(f"[sweep] refuse to merge into {path}: "
                             "direction/overrides mismatch")
        todo = set(range(args.first_seed, args.first_seed + args.seeds))
        rows = [{**r, "curve": prev["curves"][str(r["seed"])]}
                for r in prev["per_seed"] if r["seed"] not in todo]
        print(f"[sweep] merged {len(rows)} existing seed rows from {path}")
    for seed in range(args.first_seed, args.first_seed + args.seeds):
        t0 = time.time()
        scfg = dataclasses.replace(cfg, run=dataclasses.replace(
            cfg.run, seed=seed))
        state = adapt_mod.init_state(jax.random.key(seed + 2), scfg,
                                     s_state.params, s_state.bn_state)
        selector = adapt_mod.EquilibriumSelector(
            warmup_step=cfg.adapt.steps // 5)
        cr_sel = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg))
        # dual-variant selection (VERDICT r2 item 5): ONE unsupervised
        # class-ratio selector scoring the live DAM and every EMA-averaged
        # variant; picks (step, variant) jointly.  No label leakage — the
        # score is the same source-marginal prior the live selector uses.
        cr_dual = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg))
        dual_snapshot = None
        cr_ship = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg))
        ship_snapshot = None
        # the SHIPPED selection policy, LIVE in-loop (VERDICT r4 item 3):
        # the real cr_ent reservoir (class-ratio top-k + entropy rank
        # tie-break) updated with the same (fracs, ent) the production
        # make_select_bundle probe computes; its pick can move to an EARLIER
        # reservoir step on any tick, so the Dice is resolved from the curve
        # at read-out rather than snapshotted
        cr_ent_sel = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg),
            policy="cr_ent", topk=cfg.adapt.select_topk)
        # the CONFIG's exact shipped policy (policy + smoothing window as
        # pinned in the benchmark config), streaming LIVE — validates the
        # production ClassRatioSelector implementation in-loop, including
        # the smoothing resolution delay (results/policy_prereg_r5.json)
        cr_cfg_sel = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg),
            policy=cfg.adapt.select_policy, topk=cfg.adapt.select_topk,
            smooth_window=adapt_mod.smooth_window(cfg))
        # host-side weight stash of the live reservoir (mirrors
        # SelectionProbe's production stash) — enables pricing the
        # reservoir-ensemble tracking-gap candidates (VERDICT r4 item 4):
        # weight soup / prediction ensemble over the top-ranked picks
        res_stash: dict = {}
        # separate stash following the config policy's keep set (under
        # smoothing this includes unresolved pending ticks) — prices
        # run.eval_tta at the pick the SHIPPED config would serve
        cfg_stash: dict = {}
        # TTA-robustified selection signal: same cr_ent policy ranked on
        # flip-averaged fracs/entropy
        cr_ent_tta_sel = adapt_mod.ClassRatioSelector(
            src_fracs, warmup_step=adapt_mod.select_warmup(cfg),
            policy="cr_ent", topk=cfg.adapt.select_topk)
        # raw EMA trees start at ZERO (bias-corrected at eval); w tracks the
        # accumulated weight.  No aliasing with the donated train state.
        zeros = jax.tree.map(jnp.zeros_like, (state.dam_params, state.tgt_bn))
        emas = {name: [zeros, 0.0] for name in VARIANTS}
        curve, best_oracle, sel_snapshot = [], (0, -1.0), None
        cr_snapshot = None
        root = jax.random.key(1000 + seed)
        for blk in range(n_blocks):
            state, metrics = a_step(state, device_data,
                                    jax.random.fold_in(root, blk))
            step_i = (blk + 1) * ev
            d_live, fr_live, ent_live = probe_of(state)
            dmean = float(jnp.mean(d_live[1:]))
            rec = {"step": step_i, "dice": round(dmean, 4),
                   "d_acc": round(float(metrics["d_acc"]), 4),
                   "feat_div": round(float(metrics.get(
                       "feat_div", jnp.float32(0))), 6),
                   "fracs": [round(float(x), 5) for x in fr_live],
                   "ent": round(float(ent_live), 5)}
            rec["eq"] = round(selector.update(step_i, rec), 4)
            rec["cr"] = round(cr_sel.update(step_i, rec["fracs"]), 4)
            for name, (dec, tau) in VARIANTS.items():
                if tau is None or rec["eq"] < tau:
                    emas[name][0] = ema_update(emas[name][0], state, dec)
                    emas[name][1] = dec * emas[name][1] + (1 - dec)
                w = emas[name][1]
                if w > 0:
                    es = state.replace(
                        dam_params=jax.tree.map(lambda a: a / w,
                                                emas[name][0][0]),
                        tgt_bn=jax.tree.map(lambda a: a / w,
                                            emas[name][0][1]))
                    d_e, fr_e, ent_e = probe_of(es)
                    rec[f"dice_{name}"] = round(float(jnp.mean(d_e[1:])), 4)
                    rec[f"fracs_{name}"] = [round(float(x), 5) for x in fr_e]
                    rec[f"ent_{name}"] = round(float(ent_e), 5)
                else:
                    rec[f"dice_{name}"] = rec["dice"]
                    rec[f"fracs_{name}"] = rec["fracs"]
                    rec[f"ent_{name}"] = rec["ent"]
            if state_ema_on:
                d_se, fr_se, ent_se = probe_state_ema(state)
                rec["dice_state_ema"] = round(float(jnp.mean(d_se[1:])), 4)
                rec["fracs_state_ema"] = [round(float(x), 5) for x in fr_se]
                rec["ent_state_ema"] = round(float(ent_se), 5)
            cr_ent_sel.update(step_i, rec["fracs"], ent=rec["ent"])
            cr_cfg_sel.update(step_i, rec["fracs"], ent=rec["ent"])
            d_tta, fr_tta, ent_tta = probe_tta(state)
            rec["dice_tta"] = round(float(jnp.mean(d_tta[1:])), 4)
            cr_ent_tta_sel.update(
                step_i, [float(x) for x in fr_tta], ent=float(ent_tta))
            # stash/evict host weight copies for the live reservoir
            ks = cr_ent_sel.keep_steps()
            if (step_i, "live") in ks:
                res_stash[(step_i, "live")] = jax.device_get(
                    (state.dam_params, state.tgt_bn))
            for kk in list(res_stash):
                if kk not in ks:
                    del res_stash[kk]
            ks_cfg = cr_cfg_sel.keep_steps()
            if (step_i, "live") in ks_cfg:
                cfg_stash[(step_i, "live")] = res_stash.get(
                    (step_i, "live")) or jax.device_get(
                        (state.dam_params, state.tgt_bn))
            for kk in list(cfg_stash):
                if kk not in ks_cfg:
                    del cfg_stash[kk]
            cr_dual.update(step_i, rec["fracs"], variant="live")
            for name in VARIANTS:
                cr_dual.update(step_i, rec[f"fracs_{name}"], variant=name)
            if state_ema_on:
                # the production dual policy: live vs the in-state EMA only
                cr_ship.update(step_i, rec["fracs"], variant="live")
                cr_ship.update(step_i, rec["fracs_state_ema"],
                               variant="state_ema")
            curve.append(rec)
            if dmean > best_oracle[1]:
                best_oracle = (step_i, dmean)
            if selector.best_step == step_i:
                sel_snapshot = (step_i, dmean)
            if cr_sel.best_step == step_i:
                cr_snapshot = (step_i, dmean)
            if cr_dual.best_step == step_i:
                v = cr_dual.best_variant
                dual_snapshot = (step_i,
                                 rec["dice" if v == "live" else f"dice_{v}"],
                                 v)
            if state_ema_on and cr_ship.best_step == step_i:
                v = cr_ship.best_variant
                ship_snapshot = (step_i,
                                 rec["dice" if v == "live" else f"dice_{v}"],
                                 v)
        # TTA delta on the end-of-run states (live + each EMA variant):
        # prices `evaluate --tta flip` without re-running selection
        tta = {"live": round(float(jnp.mean(probe_tta(state)[0][1:])), 4)}
        for name in VARIANTS:
            w = emas[name][1]
            if w > 0:
                es = state.replace(
                    dam_params=jax.tree.map(lambda a: a / w,
                                            emas[name][0][0]),
                    tgt_bn=jax.tree.map(lambda a: a / w, emas[name][0][1]))
                tta[name] = round(float(jnp.mean(probe_tta(es)[0][1:])), 4)
        final = curve[-1]["dice"]
        # resolve the cr_ent pick's Dice from the curve (live variant only
        # at the shipped dam_ema=0)
        by_step = {c["step"]: c for c in curve}
        cr_cfg_sel.finalize()   # resolve the smoothing tail (no-op at w=1)
        cfg_snapshot = (
            (cr_cfg_sel.best_step, by_step[cr_cfg_sel.best_step]["dice"])
            if cr_cfg_sel.best_step is not None else None)
        cr_ent_snapshot = (
            (cr_ent_sel.best_step, by_step[cr_ent_sel.best_step]["dice"])
            if cr_ent_sel.best_step is not None else None)
        # ---- tracking-gap candidates over the stashed reservoir ----
        ranked = cr_ent_sel.ranked()
        gap = {}

        def stash_state(tree):
            dam, bn = tree
            return state.replace(dam_params=jax.tree.map(jnp.asarray, dam),
                                 tgt_bn=jax.tree.map(jnp.asarray, bn))

        if ranked:
            def soup_state(m):
                trees = [res_stash[(c["step"], c["variant"])]
                         for c in ranked[:m]]
                avg = jax.tree.map(
                    lambda *xs: np.mean(np.stack(xs), 0).astype(xs[0].dtype),
                    *trees)
                return stash_state(avg)

            for name, m in (("soup4", min(4, len(ranked))),
                            ("soup_all", len(ranked))):
                gap[name] = round(float(jnp.mean(
                    dice_of(soup_state(m))[1:])), 4)
            # prediction ensemble (softmax average) over the top-4 picks
            probs = None
            for c in ranked[:4]:
                p = vol_prob_sums(stash_state(
                    res_stash[(c["step"], c["variant"])]))
                probs = p if probs is None else probs + p
            gap["ens4"] = round(float(jnp.mean(dice_of_probs(probs)[1:])), 4)
            # flip-TTA evaluated AT the shipped pick (prices run.eval_tta
            # on the checkpoint users actually serve)
            sel_tree = res_stash.get((cr_ent_sel.best_step,
                                      cr_ent_sel.best_variant))
            if sel_tree is not None:
                gap["tta_sel"] = round(float(jnp.mean(
                    probe_tta(stash_state(sel_tree))[0][1:])), 4)
        # flip-TTA served at the CONFIG policy's pick (the checkpoint the
        # shipped recipe would actually serve)
        if cr_cfg_sel.best_step is not None:
            cfg_tree = cfg_stash.get((cr_cfg_sel.best_step,
                                      cr_cfg_sel.best_variant))
            if cfg_tree is not None:
                gap["tta_cfg"] = round(float(jnp.mean(
                    probe_tta(stash_state(cfg_tree))[0][1:])), 4)
        # TTA-robustified selection signal: pick by TTA fracs/ent, report
        # both the plain and TTA-served Dice at that pick
        if cr_ent_tta_sel.best_step is not None:
            c = by_step[cr_ent_tta_sel.best_step]
            gap["sel_tta_signal"] = c["dice"]
            gap["sel_tta_signal_ttad"] = c["dice_tta"]
        row = {"seed": seed, "final": final, "tta": tta, "gap": gap,
               "selected_cr_ent": cr_ent_snapshot[1] if cr_ent_snapshot
               else final,
               "selected_cr_ent_step": cr_ent_snapshot[0] if cr_ent_snapshot
               else cfg.adapt.steps,
               "selected_cfg": cfg_snapshot[1] if cfg_snapshot else final,
               "selected_cfg_step": cfg_snapshot[0] if cfg_snapshot
               else cfg.adapt.steps,
               "selected": sel_snapshot[1] if sel_snapshot else final,
               "selected_step": sel_snapshot[0] if sel_snapshot else
               cfg.adapt.steps,
               "selected_cr": cr_snapshot[1] if cr_snapshot else final,
               "selected_cr_step": cr_snapshot[0] if cr_snapshot else
               cfg.adapt.steps,
               "selected_dual": dual_snapshot[1] if dual_snapshot else final,
               "selected_dual_step": dual_snapshot[0] if dual_snapshot
               else cfg.adapt.steps,
               "selected_dual_variant": dual_snapshot[2] if dual_snapshot
               else "live",
               "oracle": best_oracle[1], "oracle_step": best_oracle[0],
               "curve": curve}
        if state_ema_on:
            row["selected_ship"] = ship_snapshot[1] if ship_snapshot \
                else final
            row["selected_ship_step"] = ship_snapshot[0] if ship_snapshot \
                else cfg.adapt.steps
            row["selected_ship_variant"] = ship_snapshot[2] if ship_snapshot \
                else "live"
            row["state_ema_final"] = curve[-1].get("dice_state_ema", final)
        for name in VARIANTS:
            row[name] = curve[-1][f"dice_{name}"]
            row[f"{name}_best"] = max(c[f"dice_{name}"] for c in curve)
        rows.append(row)
        ship_txt = (f"ship={row['selected_ship']:.3f}"
                    f"@{row['selected_ship_step']}"
                    f"/{row['selected_ship_variant']} "
                    if "selected_ship" in row else "")
        print(f"[sweep] seed {seed}: final={final:.3f} " + ship_txt +
              f"selected={row['selected']:.3f}@{row['selected_step']} "
              f"selected_cr={row['selected_cr']:.3f}"
              f"@{row['selected_cr_step']} "
              f"cr_ent={row['selected_cr_ent']:.3f}"
              f"@{row['selected_cr_ent_step']} "
              f"cfg={row['selected_cfg']:.3f}@{row['selected_cfg_step']} "
              f"dual={row['selected_dual']:.3f}"
              f"@{row['selected_dual_step']}"
              f"/{row['selected_dual_variant']} "
              f"oracle={row['oracle']:.3f}@{row['oracle_step']} "
              f"tta_live={tta['live']:.3f} "
              + " ".join(f"{n}={row[n]:.3f}" for n in VARIANTS)
              + f" ({time.time() - t0:.0f}s)", flush=True)
        rows.sort(key=lambda r: r["seed"])
        out = write_out()
        print(f"[sweep] wrote {path} ({len(rows)} seeds)", flush=True)

    print(json.dumps({k: out[k] for k in
                      ("no_adapt", "final", "selected", "selected_cr",
                       "selected_cr_ent", "selected_dual", "oracle")
                      if k in out}))


if __name__ == "__main__":
    main()
