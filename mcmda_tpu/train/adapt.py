"""T2 + T3: PnP-AdaNet adversarial adaptation as a SINGLE jitted train step.

The reference alternated two ``sess.run`` calls (k_d critic steps, then k_g
DAM steps) per iteration (SURVEY section 3.2).  Here both phases live inside
one jitted function — the inner k_d/k_g repeats are statically unrolled, each
with fresh augmentation randomness — so the whole minimax update is one XLA
program per step (the north star's "single jitted train step").

Frozen/trainable split (M2): gradients are taken ONLY wrt ``dam_params`` (the
target Domain Adaptation Module — a pytree filter of the first stages) and
``critic_params``; the source path and the Higher-Layer Module read
``src_params`` and are frozen by construction (never touched by an optimizer).

Checkpoint handoff (K1): ``init_state`` copies the phase-1 source checkpoint
into BOTH the frozen source path and the DAM initialization [P1 SIII].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mcmda_tpu.config import ExperimentConfig
from mcmda_tpu.data import pipeline
from mcmda_tpu.models import critic as critic_mod
from mcmda_tpu.models import segmenter
from mcmda_tpu.ops import losses
from mcmda_tpu.train import optim


@struct.dataclass
class AdaptState:
    src_params: Any      # frozen source segmenter (full tree)
    src_bn: Any          # frozen source running stats
    dam_params: Any      # trainable target DAM (stages <= plug_depth)
    tgt_bn: Any          # target-path BN state (its own running stats)
    critic_params: Any
    opt_g_state: Any
    opt_d_state: Any
    step: jnp.ndarray
    # Weight averaging over the minimax orbit (cfg.adapt.dam_ema): RAW
    # (bias-uncorrected) EMA trees starting at zero, the accumulated EMA
    # weight (divide by it at eval — ``eval_weights``), and the smoothed
    # critic-equilibrium distance driving the fold-in gate.
    avg_dam: Any = None
    avg_bn: Any = None
    ema_w: Any = None      # scalar in [0, 1); 0 = nothing folded in yet
    eq_smooth: Any = None  # smoothed |d_acc - 0.5|


def make_txs(cfg: ExperimentConfig):
    a = cfg.adapt
    total = a.pretrain_steps + a.steps
    tx_g = optim.make_optimizer(a.lr_g, a.beta1, a.beta2,
                                schedule=a.lr_schedule, total_steps=total)
    tx_d = optim.make_optimizer(a.lr_d, a.beta1, a.beta2,
                                schedule=a.lr_schedule, total_steps=total)
    return tx_g, tx_d


def init_state(rng, cfg: ExperimentConfig, src_params, src_bn) -> AdaptState:
    """Boot adaptation from a phase-1 source checkpoint (K1 handoff).

    The source trees are COPIED: training steps donate the whole AdaptState,
    and sharing buffers with the caller's checkpoint would invalidate it
    after the first step (a real footgun when running several adaptations
    off one source state, e.g. ablations).
    """
    src_params = jax.tree.map(jnp.array, src_params)
    src_bn = jax.tree.map(jnp.array, src_bn)
    dam = segmenter.dam_init_from_source(src_params, cfg.segmenter,
                                         cfg.adapt.plug_depth)
    critic_params = critic_mod.init(rng, cfg.critic, cfg.segmenter)
    tx_g, tx_d = make_txs(cfg)
    # the weight-average trees exist ONLY when the knob is on: with
    # dam_ema=0 (the shipped default) zero-filled DAM-sized tensors would be
    # pure dead weight in every checkpoint and donation cycle (VERDICT r2).
    # None fields are empty pytree subtrees, so jit/donate/checkpoint all
    # skip them; cross-config restore (ema on<->off) is not supported.
    ema_on = cfg.adapt.dam_ema > 0.0
    return AdaptState(
        src_params=src_params,
        src_bn=src_bn,
        dam_params=dam,
        tgt_bn=jax.tree.map(jnp.array, src_bn),
        critic_params=critic_params,
        opt_g_state=tx_g.init(dam),
        opt_d_state=tx_d.init(critic_params),
        step=jnp.zeros((), jnp.int32),
        avg_dam=jax.tree.map(jnp.zeros_like, dam) if ema_on else None,
        avg_bn=jax.tree.map(jnp.zeros_like, src_bn) if ema_on else None,
        ema_w=jnp.zeros((), jnp.float32) if ema_on else None,
        # neutral prior: the gate stays closed until the minimax actually
        # nears equilibrium, excluding the poor early-adaptation weights
        eq_smooth=jnp.full((), 0.25, jnp.float32) if ema_on else None,
    )


def make_adapt_step(cfg: ExperimentConfig, axis_name: str | None = None,
                    train_g: bool = True, augment: bool = True,
                    sample_from_device: bool = False):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch = {"src_image": [B,H,W,C], "tgt_image": [B,H,W,C]} (both unlabeled —
    the critic sees only features [P1 SIII-B]); with ``sample_from_device``
    it is instead {"src": device_arrays, "tgt": device_arrays} from
    ``pipeline.to_device_arrays`` and batches gather on device (zero per-step
    host transfer).  ``train_g=False`` is the discriminator-pretrain phase
    (T3 / BASELINE config 3).
    """
    a = cfg.adapt
    seg_cfg = cfg.segmenter
    cr_cfg = cfg.critic
    tx_g, tx_d = make_txs(cfg)
    d_loss_fn, g_loss_fn = losses.gan_losses(a.gan_loss)
    bn_train_stages = (frozenset(segmenter.dam_stage_names(seg_cfg, a.plug_depth))
                       if a.hlm_bn == "frozen" else None)

    # The frozen source path carries NO gradient (it only feeds the critic),
    # so it can run at bf16 with zero effect on DAM gradients — only the
    # critic's view of source features moves by bf16 rounding.  ~7.7 ms of
    # the ~22 ms step is this forward (scripts/profile_step.py).
    src_seg_cfg = seg_cfg if not a.src_feats_bf16 else \
        dataclasses.replace(seg_cfg, compute_dtype=jnp.bfloat16)

    def src_taps(src_params, src_bn, x):
        # frozen source path; batch-stat features (stats not persisted) keep
        # the two critic inputs statistically comparable
        _, _, taps, _ = segmenter.apply(src_params, src_bn, x, src_seg_cfg,
                                        train=True, axis_name=axis_name)
        return {k: v.astype(jnp.float32) for k, v in taps.items()}

    def tgt_forward(dam_params, state: AdaptState, x, cfg_fwd=seg_cfg):
        _, _, taps, new_bn = segmenter.apply(
            state.src_params, state.tgt_bn, x, cfg_fwd, train=True,
            axis_name=axis_name, dam_params=dam_params,
            plug_depth=a.plug_depth, bn_train_stages=bn_train_stages)
        return taps, new_bn

    # D-phase target forward: computed OUTSIDE the critic-loss grad (below),
    # so like the frozen source path it carries no DAM gradient and can run
    # bf16 harmlessly — only the critic's view of target features rounds.
    # Its BN stats are discarded (the G-phase persists them), and taps cast
    # back to f32 for statistical comparability with the source features.
    d_seg_cfg = seg_cfg if not a.tgt_feats_bf16 else \
        dataclasses.replace(seg_cfg, compute_dtype=jnp.bfloat16)

    def tgt_taps_d(dam_params, state: AdaptState, x):
        taps, _ = tgt_forward(dam_params, state, x, cfg_fwd=d_seg_cfg)
        return {k: v.astype(jnp.float32) for k, v in taps.items()}

    # ONE target forward per step (r4): within a step the k_d critic updates
    # never touch ``dam_params``, so the D-phase target features and the
    # first G-step's forward are the SAME function at the SAME point.  When
    # the two phases share a dtype (tgt_feats_bf16 off — the shipped recipe;
    # the bf16 D-view was measured a quality cliff, docs/roadmap.md), the
    # step computes the target forward once under ``jax.vjp``: the primal
    # feeds every D-phase critic input and the pullback closes the first
    # G-step, saving a full DAM+HLM forward per step with bit-identical
    # math.  ``adapt.share_tgt_fwd=false`` restores the two-forward oracle.
    share_fwd = a.share_tgt_fwd and not a.tgt_feats_bf16

    def d_step(state: AdaptState, x_src, f_tgt):
        f_src = src_taps(state.src_params, state.src_bn, x_src)
        # the critic's D-phase view is always f32 (statistical comparability
        # with the f32-cast source taps), whatever dtype the forward ran at
        f_tgt = {k: v.astype(jnp.float32) for k, v in f_tgt.items()}

        def loss(critic_params):
            if a.batch_critic:
                # one apply on [f_src; f_tgt]: per-sample math (convs +
                # instance norm), so identical logits up to fp summation
                # order, at twice the batch for the small critic convs
                n = f_src[cr_cfg.taps[0]].shape[0]
                f_both = {t: jnp.concatenate([f_src[t], f_tgt[t]], axis=0)
                          for t in cr_cfg.taps}
                l = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_both, cr_cfg))
                l_s, l_t = l[:n], l[n:]
            else:
                l_s = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_src, cr_cfg))
                l_t = critic_mod.flatten_logits(
                    critic_mod.apply(critic_params, f_tgt, cr_cfg))
            dl = d_loss_fn(l_s, l_t, a.label_smooth)
            if a.r1_gamma > 0:
                # R1: penalize the critic's gradient norm on real (source)
                # features — nested grad, fully inside the jitted step
                def d_sum(taps):
                    sel = {t: taps[t] for t in cr_cfg.taps}
                    return jnp.sum(critic_mod.flatten_logits(
                        critic_mod.apply(critic_params, sel, cr_cfg)))
                gf = jax.grad(d_sum)({t: f_src[t] for t in cr_cfg.taps})
                n = f_src[cr_cfg.taps[0]].shape[0]
                r1 = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(gf)) / n
                dl = dl + 0.5 * a.r1_gamma * r1
            return dl, (l_s, l_t)

        (dl, (l_s, l_t)), grads = jax.value_and_grad(loss, has_aux=True)(
            state.critic_params)
        acc = losses.critic_accuracy(l_s, l_t,
                                     losses.decision_boundary(a.gan_loss))
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            # GLOBAL accuracy: every replica must make the same throttle
            # decision or critic params silently diverge under DP
            acc = jax.lax.pmean(acc, axis_name)
        updates, new_opt = tx_d.update(grads, state.opt_d_state,
                                       state.critic_params)
        if a.d_acc_cap < 1.0:
            # throttle: while the critic is too far ahead the step is a TRUE
            # no-op — parameters AND optimizer state (Adam moments, schedule
            # count) are held, so a gated critic resumes exactly where it
            # paused rather than with stale momentum / decayed LR
            gate = acc <= a.d_acc_cap
            updates = jax.tree.map(
                lambda u: u * gate.astype(u.dtype), updates)
            new_opt = jax.tree.map(lambda n, o: jnp.where(gate, n, o),
                                   new_opt, state.opt_d_state)
        new_critic = jax.tree.map(lambda p, u: p + u, state.critic_params,
                                  updates)
        # observability: feature-space divergence between source and target
        # tap statistics — label-free adaptation-progress signals
        # complementing d_acc (per-shard under DP; monitoring only).
        #   feat_div: first moments only (channel means), the r2 signal;
        #   feat_mmd: linear-kernel MMD^2 with phi(x)=(x, x^2) — adds the
        #   second moment, so a DAM that matches means but not variances
        #   (a common partial-alignment failure) still reads as distant.
        def _moments(f):
            x = f.astype(jnp.float32)
            return jnp.mean(x, axis=(0, 1, 2)), \
                jnp.mean(jnp.square(x), axis=(0, 1, 2))

        fd = ft = 0.0
        for t in cr_cfg.taps:
            mu_s, m2_s = _moments(f_src[t])
            mu_t, m2_t = _moments(f_tgt[t])
            fd = fd + jnp.mean(jnp.square(mu_s - mu_t))
            ft = ft + jnp.mean(jnp.square(m2_s - m2_t))
        fd = fd / len(cr_cfg.taps)
        fmmd = fd + ft / len(cr_cfg.taps)
        return state.replace(critic_params=new_critic, opt_d_state=new_opt), \
            {"d_loss": dl, "d_acc": acc, "feat_div": fd, "feat_mmd": fmmd}

    def _g_update(state: AdaptState, gl, grads, new_bn):
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = tx_g.update(grads, state.opt_g_state,
                                       state.dam_params)
        new_dam = jax.tree.map(lambda p, u: p + u, state.dam_params, updates)
        return state.replace(dam_params=new_dam, opt_g_state=new_opt,
                             tgt_bn=new_bn), {"g_loss": gl}

    def g_step(state: AdaptState, x_tgt):
        def loss(dam_params):
            f_tgt, new_bn = tgt_forward(dam_params, state, x_tgt)
            l_t = critic_mod.flatten_logits(
                critic_mod.apply(state.critic_params, f_tgt, cr_cfg))
            return g_loss_fn(l_t), new_bn

        (gl, new_bn), grads = jax.value_and_grad(loss, has_aux=True)(
            state.dam_params)
        return _g_update(state, gl, grads, new_bn)

    def g_step_shared(state: AdaptState, f_tgt, pullback, new_bn):
        # first G-step off the shared forward: grad of the GAN loss wrt the
        # target features (critic params are the POST-d_step ones), closed
        # through the saved DAM+HLM linearization
        def critic_loss(f):
            l_t = critic_mod.flatten_logits(
                critic_mod.apply(state.critic_params, f, cr_cfg))
            return g_loss_fn(l_t)

        gl, df = jax.value_and_grad(critic_loss)(f_tgt)
        (grads,) = pullback(df)
        return _g_update(state, gl, grads, new_bn)

    def step(state: AdaptState, batch, rng):
        if sample_from_device:
            r_s, r_t, rng = jax.random.split(rng, 3)
            bs = cfg.data.batch_size
            batch = {
                "src_image": pipeline.sample_device_batch(batch["src"], r_s,
                                                          bs)["image"],
                "tgt_image": pipeline.sample_device_batch(batch["tgt"], r_t,
                                                          bs)["image"],
            }
        # ONE augmentation kernel per step on the concatenated src+tgt batch;
        # the D and G phases share the augmented views (standard GAN-loop
        # practice, and the warp is the dominant cost on TPU — see
        # scripts/profile_step.py)
        if augment:
            both = jnp.concatenate([batch["src_image"], batch["tgt_image"]], 0)
            both = pipeline.augment_images(rng, both, cfg.data)
            n_src = batch["src_image"].shape[0]
            x_s, x_t = both[:n_src], both[n_src:]
        else:
            x_s, x_t = batch["src_image"], batch["tgt_image"]
        metrics = {}
        # target features once per step: dam_params are constant across the
        # k_d critic updates (and, in pretrain, across the whole step)
        pull = new_bn = None
        if share_fwd and train_g and a.k_g > 0:
            f_tgt, pull, new_bn = jax.vjp(
                lambda dp: tgt_forward(dp, state, x_t), state.dam_params,
                has_aux=True)
        else:
            f_tgt = tgt_taps_d(state.dam_params, state, x_t)
        for _i in range(a.k_d):
            state, m = d_step(state, x_s, f_tgt)
            metrics.update(m)
        if train_g:
            if pull is not None:
                state, m = g_step_shared(state, f_tgt, pull, new_bn)
                metrics.update(m)
            for _i in range(a.k_g - (1 if pull is not None else 0)):
                state, m = g_step(state, x_t)
                metrics.update(m)
            if a.dam_ema > 0.0:
                # weight averaging over the minimax orbit (see AdaptConfig):
                # bias-corrected EMA, folded in only while the smoothed
                # critic-equilibrium distance is under the gate (the late
                # collapse shows up as the critic winning decisively)
                dec = jnp.float32(a.dam_ema)
                q = jnp.float32(a.ema_gate_smooth)
                eq = jnp.abs(metrics["d_acc"].astype(jnp.float32) - 0.5)
                eq_s = q * state.eq_smooth + (1 - q) * eq
                gate = (eq_s < a.ema_gate).astype(jnp.float32) \
                    if a.ema_gate > 0 else jnp.float32(1.0)

                def fold(e, n):
                    new = dec * e + (1 - dec) * n.astype(e.dtype)
                    return gate.astype(e.dtype) * new \
                        + (1 - gate.astype(e.dtype)) * e

                state = state.replace(
                    avg_dam=jax.tree.map(fold, state.avg_dam,
                                         state.dam_params),
                    avg_bn=jax.tree.map(fold, state.avg_bn, state.tgt_bn),
                    ema_w=gate * (dec * state.ema_w + (1 - dec))
                    + (1 - gate) * state.ema_w,
                    eq_smooth=eq_s)
        return state.replace(step=state.step + 1), metrics

    return step


class _BestScoreSelector:
    """Track the checkpoint with the lowest score of an unsupervised signal
    (lower = better); persists the choice to ``selection.json``."""

    signal = "score"

    def __init__(self, warmup_step: int = 0):
        self.warmup_step = warmup_step
        self.best_step = None
        self.best_score = float("inf")
        # which weight variant scored best at best_step: "live" (the raw
        # DAM) or "avg" (the equilibrium-gated EMA, cfg.adapt.dam_ema>0) —
        # evaluation must use the SAME variant the probe selected
        self.best_variant = "live"

    def _record(self, step: int, score: float,
                variant: str = "live") -> float:
        if step >= self.warmup_step and score < self.best_score:
            self.best_score = score
            self.best_step = step
            self.best_variant = variant
        return score

    def save(self, out_dir: str) -> None:
        import json
        import os
        if self.best_step is None:
            return
        with open(os.path.join(out_dir, "selection.json"), "w") as f:
            json.dump({"signal": self.signal,
                       "best_step": int(self.best_step),
                       "best_score": self.best_score,
                       "weights": self.best_variant}, f)


class EquilibriumSelector(_BestScoreSelector):
    """Unsupervised adaptation-checkpoint selection via critic equilibrium.

    Adaptation quality peaks mid-run and then collapses (docs/design.md
    section 5b, measured); the reference picked a fixed iteration.  Signal:
    the critic-equilibrium distance |d_acc - 0.5|, EMA-smoothed.  After
    discriminator pretraining the critic separates source from unadapted
    target features (d_acc high); as the DAM adapts, d_acc falls toward
    chance, and when the DAM drifts/collapses the critic separates easily
    again.  No target labels involved.
    """

    signal = "critic_equilibrium"

    def __init__(self, ema: float = 0.7, warmup_step: int = 0):
        super().__init__(warmup_step)
        self.ema = ema
        self.value = None

    def update(self, step: int, metrics) -> float:
        d = abs(float(metrics.get("d_acc", 0.5)) - 0.5)
        self.value = d if self.value is None else \
            self.ema * self.value + (1.0 - self.ema) * d
        return self._record(step, self.value)


class ClassRatioSelector(_BestScoreSelector):
    """Unsupervised adaptation-checkpoint selection via the class-ratio
    prior: L1 distance between the PREDICTED class-voxel fractions on
    (unlabeled) target slices and the class fractions of the SOURCE-domain
    labels.  Oscillation/collapse of the minimax makes structures shrink or
    vanish, which this distance detects directly; measured on the 5-seed
    reverse benchmark it selects 0.790+/-0.030 mean Dice against an oracle
    of 0.828+/-0.025 (results/ct2mri_seed_sweep_sig.json) — far better than
    any critic-side signal.  Uses source labels (available) and target
    images only.
    """

    signal = "class_ratio"

    def __init__(self, ref_fracs, warmup_step: int = 0,
                 policy: str = "cr", topk: int = 16,
                 smooth_window: int = 1):
        super().__init__(warmup_step)
        import numpy as np
        self.ref_fracs = np.asarray(ref_fracs, np.float64)
        self.policy = policy
        self.topk = max(1, topk)
        # cr_ent reservoir: the topk lowest-cr candidates seen so far, each
        # {step, variant, cr, ent}; the current pick is re-derived after
        # every update by rank-combining 2*rank(cr) + rank(ent) WITHIN the
        # reservoir (config.AdaptConfig.select_policy).
        self.reservoir: list = []
        # Probe-noise denoising (config.AdaptConfig.select_smooth_span,
        # results/policy_prereg_r5.json): with smooth_window=w>1 (odd), each
        # tick's signal is replaced by the centered w-tick boxcar mean of
        # the raw (fracs, ent) streams before scoring, so a tick's score
        # RESOLVES w//2 ticks late (edges use the available shorter window,
        # the tail at finalize()).  Per-variant raw history; ~5 floats/tick.
        self.smooth_window = max(1, int(smooth_window))
        self._hist: dict = {}   # variant -> [(step, fracs, ent), ...]
        self._next: dict = {}   # variant -> first unresolved index

    def keep_steps(self):
        """Candidate (step, variant) pairs whose weights must stay stashed:
        the whole reservoir under cr_ent / just the best under cr, PLUS any
        tick still awaiting smoothing resolution (it may become the pick)."""
        if self.policy == "cr_ent":
            keep = {(c["step"], c["variant"]) for c in self.reservoir}
        else:
            keep = ({(self.best_step, self.best_variant)}
                    if self.best_step is not None else set())
        for variant, hist in self._hist.items():
            for step, _fr, _ent in hist[self._next.get(variant, 0):]:
                keep.add((step, variant))
        return keep

    def ranked(self) -> list:
        """Reservoir candidates sorted by the cr_ent combined rank score
        (2*rank(cr) + rank(ent), ascending — best first)."""
        import numpy as np
        if not self.reservoir:
            return []
        crs = np.asarray([c["cr"] for c in self.reservoir])
        ents = np.asarray([c["ent"] for c in self.reservoir])
        score = 2.0 * crs.argsort().argsort() + ents.argsort().argsort()
        return [self.reservoir[i]
                for i in np.argsort(score, kind="stable")]

    def _repick(self) -> None:
        order = self.ranked()
        if not order:
            return
        best = order[0]
        self.best_step = best["step"]
        self.best_score = best["cr"]
        self.best_variant = best["variant"]

    def _ingest(self, step: int, score: float, variant: str,
                ent: float | None) -> float:
        """Score one (possibly smoothed) tick into the pick machinery."""
        if self.policy != "cr_ent" or ent is None:
            if self.policy == "cr_ent":
                # the production bundle always supplies ent; a mixed
                # with/without-ent sequence would leave best_step outside
                # the reservoir and break SelectionProbe's stash lookup
                import warnings
                warnings.warn(
                    "ClassRatioSelector(policy='cr_ent') got ent=None; "
                    "falling back to plain class-ratio recording for this "
                    "update — selection quality may degrade", stacklevel=2)
            return self._record(step, score, variant)
        if step < self.warmup_step:
            return score
        self.reservoir.append({"step": step, "variant": variant,
                               "cr": score, "ent": float(ent)})
        self.reservoir.sort(key=lambda c: c["cr"])
        del self.reservoir[self.topk:]
        self._repick()
        return score

    def _resolve(self, variant: str, i: int, n_avail: int) -> None:
        """Feed history index ``i`` with its centered window mean (clipped
        to the ``n_avail`` ticks seen so far)."""
        import numpy as np
        h = self.smooth_window // 2
        win = self._hist[variant][max(0, i - h):min(n_avail, i + h + 1)]
        fr = np.mean([w[1] for w in win], axis=0)
        ents = [w[2] for w in win]
        ent = None if any(e is None for e in ents) else float(np.mean(ents))
        step = self._hist[variant][i][0]
        self._ingest(step, float(np.abs(fr - self.ref_fracs).sum()),
                     variant, ent)

    def update(self, step: int, pred_fracs, variant: str = "live",
               ent: float | None = None) -> float:
        import numpy as np
        fr = np.asarray(pred_fracs, np.float64)
        score = float(np.abs(fr - self.ref_fracs).sum())
        if self.smooth_window <= 1:
            return self._ingest(step, score, variant, ent)
        if step < self.warmup_step:
            # pre-warmup ticks are excluded from smoothing windows too, so
            # the online pick matches the offline warmup-filtered replay
            return score
        hist = self._hist.setdefault(variant, [])
        hist.append((step, fr, None if ent is None else float(ent)))
        h = self.smooth_window // 2
        nxt = self._next.get(variant, 0)
        while nxt + h < len(hist):
            self._resolve(variant, nxt, len(hist))
            nxt += 1
        self._next[variant] = nxt
        return score

    def finalize(self) -> None:
        """Resolve the trailing ticks (shorter windows at the stream end) —
        call once after the last update; mirrors the offline replay's edge
        handling exactly."""
        for variant, hist in self._hist.items():
            for i in range(self._next.get(variant, 0), len(hist)):
                self._resolve(variant, i, len(hist))
            self._next[variant] = len(hist)

    def save(self, out_dir: str) -> None:
        import json
        import os
        if self.best_step is None:
            return
        payload = {"signal": self.signal, "policy": self.policy,
                   "best_step": int(self.best_step),
                   "best_score": self.best_score,
                   "weights": self.best_variant}
        if self.smooth_window > 1:
            payload["smooth_window"] = self.smooth_window
        if self.policy == "cr_ent":
            payload["reservoir"] = [
                {"step": int(c["step"]), "variant": c["variant"],
                 "cr": c["cr"], "ent": c["ent"]} for c in self.reservoir]
        with open(os.path.join(out_dir, "selection.json"), "w") as f:
            json.dump(payload, f)


def select_warmup(cfg: ExperimentConfig) -> int:
    """Warmup step for ClassRatioSelector: pretrain + cfg.adapt.select_warmup
    clamped to a fifth of the run (so short/smoke runs still select)."""
    a = cfg.adapt
    return a.pretrain_steps + min(a.select_warmup, a.steps // 5)


def smooth_window(cfg: ExperimentConfig) -> int:
    """Selection-signal smoothing window in TICKS from the configured span
    in STEPS (config.AdaptConfig.select_smooth_span): round(span / cadence),
    forced odd by rounding DOWN (under-smooth on ties), min 1 (= off).  At
    the shipped ct2mri cadence (span 300 / select_every 100) this is 3; at
    mri2ct's coarser 250-step cadence the same span rounds to 1 (no-op)."""
    a = cfg.adapt
    ev = a.select_every or cfg.run.ckpt_every or 1
    w = int(round(a.select_smooth_span / max(1, ev)))
    if w % 2 == 0:
        w -= 1
    return max(1, w)


def label_fractions(labels, num_classes: int):
    """Class-voxel fractions of a label array set (the source-domain
    marginal prior for ClassRatioSelector)."""
    import numpy as np
    counts = np.bincount(np.concatenate(
        [np.asarray(l).reshape(-1) for l in labels]).astype(np.int64),
        minlength=num_classes).astype(np.float64)
    return counts / counts.sum()


def make_class_ratio_probe(cfg: ExperimentConfig, probe_images,
                           use_avg: bool = False):
    """Jitted ``state -> (predicted class fractions[C], mean prediction
    entropy)`` on a fixed stack of (unlabeled) target probe slices — ONE
    device dispatch per checkpoint interval.  ``probe_images``: [N,H,W,ctx]
    array, N a multiple of the batch size (pad by repeating the last
    slice).  The entropy (mean per-pixel -sum p log p over valid rows) is
    the confidence signal the "cr_ent" selection policy ranks with."""
    fwd = adapted_forward(cfg, use_avg=use_avg)
    b = cfg.data.batch_size
    n = probe_images.shape[0]
    pad = (-n) % b
    if pad:
        probe_images = jnp.concatenate(
            [jnp.asarray(probe_images),
             jnp.repeat(jnp.asarray(probe_images[-1:]), pad, 0)], 0)
    stacks = jnp.asarray(probe_images).reshape(
        (-1, b) + tuple(probe_images.shape[1:]))
    nc = cfg.data.num_classes
    # padding rows (repeats of the last slice) must NOT count toward the
    # predicted class fractions — they would bias the selection score toward
    # the last probe slice's content (ADVICE r2)
    valid = (jnp.arange(stacks.shape[0] * b) < n).astype(
        jnp.float32).reshape(stacks.shape[0], b, 1, 1)

    @jax.jit
    def probe(state):
        def body(ent_sum, args):
            xb, vb = args
            probs = fwd(state, xb)
            p = jnp.clip(probs.astype(jnp.float32), 1e-8, 1.0)
            ent = -jnp.sum(p * jnp.log(p), axis=-1)      # [b, H, W]
            return ent_sum + jnp.sum(ent * vb), \
                jnp.argmax(probs, -1).astype(jnp.int32)

        ent_total, preds = jax.lax.scan(body, jnp.float32(0.0),
                                        (stacks, valid))  # [nb, b, H, W]
        oh = jax.nn.one_hot(preds, nc, dtype=jnp.float32)
        counts = jnp.sum(oh * valid[..., None], axis=(0, 1, 2, 3))
        n_valid = jnp.float32(n) * stacks.shape[2] * stacks.shape[3]
        return counts / jnp.sum(counts), ent_total / n_valid

    return probe


def make_select_bundle(cfg: ExperimentConfig, probe_images,
                       dual: bool = False):
    """Everything one selection tick needs, as ONE jitted dispatch with NO
    host sync: predicted class fractions for the live (and, when ``dual``,
    the EMA-average) weight variant, plus device COPIES of each variant's
    eval weights — the stash candidates.  Copies (``jnp.copy``) because the
    train steps donate the state, so pass-through references into it would
    be invalidated by the next dispatch.

    Pair with :class:`SelectionProbe`, which reads the returned device
    values one tick LATER so the probe never stalls the dispatch pipeline.
    """
    probe_live = make_class_ratio_probe(cfg, probe_images)
    probe_avg = make_class_ratio_probe(cfg, probe_images, use_avg=True) \
        if dual else None

    @jax.jit
    def bundle(state: AdaptState) -> dict:
        fracs, ent = probe_live(state)
        out = {"fracs_live": fracs, "ent_live": ent,
               "weights_live": jax.tree.map(jnp.copy,
                                            eval_weights(state, False))}
        if probe_avg is not None:
            fracs_a, ent_a = probe_avg(state)
            out["fracs_avg"] = fracs_a
            out["ent_avg"] = ent_a
            out["weights_avg"] = jax.tree.map(jnp.copy,
                                              eval_weights(state, True))
        return out

    return bundle


class SelectionProbe:
    """Deferred-by-one-tick selection bookkeeping (loop ``probe=``).

    Calling the probe launches the device work for THIS tick (one jitted
    ``bundle`` dispatch) and host-reads the PREVIOUS tick's results — so the
    training loop's dispatch pipeline never waits on a probe: by the next
    tick (``select_every`` steps later) the values have long materialized.
    ``flush()`` after the loop retires the final pending tick.  Selector
    updates, the best-weights stash, and selection.json writes all happen at
    read time with the step they were probed at; the only observable
    difference from the synchronous path is that ``selection.json`` and the
    prune-protection set lag one tick mid-run (both are settled by flush).

    ``metrics`` may be device scalars — they are kept unread until flush
    (they are step OUTPUTS, which donation does not invalidate).
    """

    def __init__(self, bundle, primary, cr_selector,
                 eq_selector=None, logger=None, save_dir: str | None = None,
                 save_ok: bool = True):
        self._bundle = bundle
        self.primary = primary          # the selector driving best_step
        self._cr = cr_selector
        self._eq = eq_selector
        self._logger = logger
        self._save_dir = save_dir
        self._save_ok = save_ok
        self._pending = None
        self.best_stash: dict = {}
        # host copies of every candidate the cr reservoir still holds,
        # keyed (step, variant); pruned as candidates are evicted
        self._stash: dict = {}

    def __call__(self, step: int, state, metrics=None) -> None:
        out = self._bundle(state)       # async dispatch; no host sync
        self.flush()
        d_acc = None if not metrics else metrics.get("d_acc")
        self._pending = (step, out, d_acc)

    def flush(self) -> None:
        """Host-read the pending tick (if any) and update all bookkeeping."""
        if self._pending is None:
            return
        step, out, d_acc = self._pending
        self._pending = None
        scalars = {}
        if self._eq is not None and d_acc is not None:
            scalars["equilibrium_dist"] = self._eq.update(
                step, {"d_acc": float(d_acc)})
        scalars["class_ratio_dist"] = self._cr.update(
            step, np.asarray(out["fracs_live"]),
            ent=float(out["ent_live"]) if "ent_live" in out else None)
        if "ent_live" in out:
            scalars["probe_entropy"] = float(out["ent_live"])
        if "fracs_avg" in out:
            scalars["class_ratio_dist_avg"] = self._cr.update(
                step, np.asarray(out["fracs_avg"]), variant="avg",
                ent=float(out["ent_avg"]) if "ent_avg" in out else None)
        if self._logger is not None:
            self._logger.log(step, scalars)
        # stash host copies of any candidate the selector still wants (the
        # whole cr_ent reservoir; just the current best under "cr"/eq) and
        # prune the evicted ones, then point best_stash (mutated IN PLACE —
        # callers hold a reference) at the current pick
        # only the cr selector as primary ever consumes these stashed
        # candidates (best_stash lookup + protect_steps); skip the per-tick
        # device_get of reservoir weights under other primaries
        ks = self._cr.keep_steps() if (self.primary is self._cr and
                                       hasattr(self._cr, "keep_steps")) \
            else set()
        for variant, wkey in (("live", "weights_live"),
                              ("avg", "weights_avg")):
            if wkey in out and (step, variant) in ks:
                self._stash[(step, variant)] = jax.device_get(out[wkey])
        for k in list(self._stash):
            if k not in ks:
                del self._stash[k]
        bk = (self.primary.best_step,
              getattr(self.primary, "best_variant", "live"))
        if bk in self._stash:
            dam, bn = self._stash[bk]
            self.best_stash["dam_params"] = dam
            self.best_stash["tgt_bn"] = bn
        elif self.primary.best_step == step:
            # primary without a reservoir (EquilibriumSelector)
            dam, bn = out["weights_avg" if bk[1] == "avg"
                          else "weights_live"]
            self.best_stash["dam_params"] = jax.device_get(dam)
            self.best_stash["tgt_bn"] = jax.device_get(bn)
        if self._save_dir and self._save_ok:
            self.primary.save(self._save_dir)

    def finalize(self) -> None:
        """Retire the final deferred tick AND resolve the selector's
        smoothing tail (ClassRatioSelector.finalize) — the last w//2 ticks
        only score once the stream ends, and the pick may move onto one of
        them.  Call once after the training loop."""
        self.flush()
        if not hasattr(self._cr, "finalize"):
            return
        self._cr.finalize()
        if self.primary is self._cr and hasattr(self._cr, "keep_steps"):
            ks = self._cr.keep_steps()
            for k in list(self._stash):
                if k not in ks:
                    del self._stash[k]
        bk = (self.primary.best_step,
              getattr(self.primary, "best_variant", "live"))
        if bk in self._stash:
            dam, bn = self._stash[bk]
            self.best_stash["dam_params"] = dam
            self.best_stash["tgt_bn"] = bn
        if self._save_dir and self._save_ok:
            self.primary.save(self._save_dir)

    def protect_steps(self):
        """Prune-protection set for ``loop.run(protect_steps=)``."""
        if hasattr(self.primary, "keep_steps"):
            return {s for s, _v in self.primary.keep_steps()}
        return ({self.primary.best_step}
                if self.primary.best_step is not None else ())


def eval_weights(state: AdaptState, use_avg: bool = False):
    """(dam_params, bn) to evaluate with: the live DAM, or the bias-corrected
    weight average (``avg_* / ema_w``).  Falls back to the live weights while
    nothing has been folded in yet (``ema_w == 0`` — gate never opened) and
    when the averaging trees were never allocated (``dam_ema=0`` states, or a
    selection-materialized checkpoint whose dam_params ARE the chosen
    weights)."""
    if not use_avg or state.ema_w is None:
        return state.dam_params, state.tgt_bn
    w = state.ema_w
    nz = (w > 0).astype(jnp.float32)
    inv = nz / jnp.maximum(w, jnp.float32(1e-12))

    def debias(avg, live):
        return avg * inv.astype(avg.dtype) \
            + (1 - nz).astype(live.dtype) * live

    return (jax.tree.map(debias, state.avg_dam, state.dam_params),
            jax.tree.map(debias, state.avg_bn, state.tgt_bn))


def adapted_forward(cfg: ExperimentConfig, use_avg: bool = False):
    """E1 inference path of the ADAPTED net: target DAM + frozen HLM,
    eval-mode BN from the target-path running stats.  ``use_avg`` evaluates
    the equilibrium-gated weight average (cfg.adapt.dam_ema) instead of the
    live DAM."""
    def fwd(state: AdaptState, image):
        dam, bn = eval_weights(state, use_avg)
        _, probs, _, _ = segmenter.apply(
            state.src_params, bn, image, cfg.segmenter, train=False,
            dam_params=dam, plug_depth=cfg.adapt.plug_depth)
        return probs
    return fwd
