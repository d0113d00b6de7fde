"""Config system (SURVEY.md C1c).

The reference used ``tf.app.flags`` plus hardcoded dicts for: learning rates,
batch size, iteration counts, the plug-and-play adaptation depth ``d``, the
multi-level feature-tap selection, the discriminator:generator step ratio, and
checkpoint paths.  Here every knob is a frozen dataclass field, JSON
round-trippable, with the paper's ablation axes (``plug_depth``,
``critic.taps``) first-class.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One stage of the dilated-residual segmenter (SURVEY M1).

    The paper's backbone downsamples x8 via strided residual modules, then
    holds 1/8 resolution with dilation-2 (and deeper dilation-4) residual
    modules [P1 Fig.2].
    """

    name: str
    features: int
    stride: int = 1
    dilation: int = 1
    blocks: int = 2


# Paper-faithful default backbone: widths grow 16 -> 512, x8 total stride,
# dilated tail at 1/8 resolution [P1 Fig.2; SURVEY M1].
DEFAULT_STAGES: Tuple[StageSpec, ...] = (
    StageSpec("stem", 16, stride=1, dilation=1, blocks=1),
    StageSpec("rm1", 32, stride=2, dilation=1, blocks=2),
    StageSpec("rm2", 64, stride=2, dilation=1, blocks=2),
    StageSpec("rm3", 128, stride=2, dilation=1, blocks=2),
    StageSpec("rm4", 256, stride=1, dilation=2, blocks=2),
    StageSpec("rm5", 512, stride=1, dilation=2, blocks=2),
    StageSpec("rm6", 512, stride=1, dilation=4, blocks=2),
)


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    """M1: 2D dilated-residual FCN. 256x256x3 in, 5-class softmax out."""

    in_channels: int = 3
    num_classes: int = 5
    stages: Tuple[StageSpec, ...] = DEFAULT_STAGES
    bn_momentum: float = 0.99
    bn_eps: float = 1e-5
    # Compute dtype for conv/matmul inputs; params + BN stats stay f32.
    compute_dtype: Any = jnp.float32
    # Execution layout of the THIN high-res stages:
    # "s2d"  — space-to-depth stem + rm1 ENTRY: dense MXU convs over slot
    #          channels; exact (fwd+bwd 0.8 ms vs 2.0 ms measured;
    #          ops/s2d.py). Falls back automatically when shapes don't
    #          divide by 2.
    # "s2d2" — additionally keeps every thin stage whose slot width fits a
    #          VREG lane group (4*features <= 128, i.e. rm1 at the default
    #          widths) s2d-RESIDENT through its body, and feeds the next
    #          stage's entry from the s2d view: the 128^2/32ch convs and
    #          their 4-13 TF/s backward passes become [3,3,128,128] dense
    #          contractions (r5; results/adapt_topops.json).  Exact.
    #          MEASURED (r5, real chip, production adapt geometry):
    #          11.70 ms/step vs 14.01 — x1.20, shipped default.
    # "nhwc" — stock XLA convs (the r2 behavior; also the test oracle).
    thin_layout: str = "s2d2"
    # Training-mode execution of the WIDE dilated-tail blocks (rm4-rm6):
    # "pallas" — fused conv + BN-statistics kernel (kernels/train_conv.py):
    #            the batch-stats reduction rides the conv's VMEM epilogue,
    #            saving one full HBM read of every tail conv output per
    #            training step.  Exact (incl. DP sync-BN; tested vs oracle).
    # "none"   — stock XLA conv + bn_apply (the oracle).
    train_fused: str = "none"

    @property
    def total_stride(self) -> int:
        s = 1
        for st in self.stages:
            s *= st.stride
        return s

    def stage_names(self) -> Tuple[str, ...]:
        return tuple(st.name for st in self.stages)


@dataclasses.dataclass(frozen=True)
class CriticConfig:
    """M3 + M4: feature-space PatchGAN domain critic over multi-level taps.

    ``taps`` selects WHICH frozen-layer activations feed the critic
    (SURVEY M4); each tap is 1x1-compressed to ``compress_features`` channels,
    resized to the coarsest tap's spatial grid, and concatenated.
    """

    taps: Tuple[str, ...] = ("rm4", "rm6")
    compress_features: int = 64
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    strides: Tuple[int, ...] = (2, 2, 2, 1)
    lrelu_slope: float = 0.2
    # "multi" = one critic per tap with summed losses (BASELINE config 5);
    # "concat" = single critic over channel-concatenated taps.
    mode: str = "concat"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """L1/D1-D4: slice geometry, batching, augmentation."""

    slice_size: int = 256
    context_slices: int = 3  # adjacent slices stacked as channels [P1 SIV]
    num_classes: int = 5
    batch_size: int = 8
    # Augmentation (D3): joint image+label random flip / rotate / zoom.
    flip: bool = True
    rotate_degrees: float = 15.0
    zoom_range: Tuple[float, float] = (0.9, 1.1)
    shift_pixels: float = 10.0
    # warp implementation: "xla" (packed single-gather, runs everywhere) or
    # "pallas" (gather-free MXU kernel, TPU-only; kernels/warp.py)
    warp: str = "xla"


@dataclasses.dataclass(frozen=True)
class SourceTrainConfig:
    """T1: supervised source-segmenter training (weighted xent + soft Dice)."""

    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    steps: int = 20000
    xent_weight: float = 1.0
    dice_weight: float = 1.0
    # Per-class weights for the cross-entropy (background down-weighted);
    # None = auto inverse-frequency from the batch.
    class_weights: Tuple[float, ...] | None = None
    lr_schedule: str = "constant"  # "constant" | "cosine"


@dataclasses.dataclass(frozen=True)
class AdaptConfig:
    """T2/T3: PnP-AdaNet adversarial adaptation.

    ``plug_depth`` names the LAST stage included in the DAM (the paper's
    ablated depth ``d``; "middle" plug-in was best [P1 SV]).  ``k_d``/``k_g``
    set the alternating critic:generator step ratio inside the single fused
    train step.  ``pretrain_steps`` is the discriminator warm-up phase
    (BASELINE config 3).
    """

    plug_depth: str = "rm3"
    k_d: int = 1
    k_g: int = 1
    lr_d: float = 1e-4
    lr_g: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.999
    steps: int = 10000
    pretrain_steps: int = 0
    gan_loss: str = "nonsat"  # "nonsat" | "lsgan"
    label_smooth: float = 0.0
    # R1 gradient penalty on real (source) features — 0 disables. Stabilizes
    # the critic on hard real-data runs; not in the reference (rebuild knob).
    r1_gamma: float = 0.0
    # Critic throttle: skip the D update while its patch accuracy exceeds
    # this cap (1.0 = never skip). Keeps the minimax in the regime where the
    # DAM still receives useful gradients (rebuild stabilizer knob).
    d_acc_cap: float = 1.0
    # LR schedule for BOTH optimizers over `steps` ("constant" | "cosine").
    # Cosine decay locks in the adversarial equilibrium instead of letting
    # the minimax oscillate away from it on long runs (measured: Dice peaks
    # then collapses with constant lr).
    lr_schedule: str = "constant"
    # BN handling in the frozen higher-layer module on the target path:
    # "batch"  — frozen params but batch statistics from target activations
    # "frozen" — use the source running statistics everywhere
    hlm_bn: str = "batch"
    # Compute the target forward ONCE per step (jax.vjp): the primal feeds
    # the D-phase critic inputs, the pullback closes the first G-step —
    # bit-identical math, one fewer DAM+HLM forward per step.  false
    # restores the two-forward oracle (also forced off by tgt_feats_bf16,
    # where the two phases deliberately run at different dtypes).
    share_tgt_fwd: bool = True
    # Apply the critic ONCE per D-step on the batch-concatenated
    # [f_src; f_tgt] features instead of twice at batch B: the critic is
    # per-sample math end-to-end (convs + instance norm), so the logits are
    # identical up to fp summation order (gradient-exact at r1_gamma=0,
    # tests/test_train.py::test_batch_critic_grad_equivalence).  MEASURED
    # (r5, results/batching_bench.json): +0.2% step time — performance-
    # NEUTRAL at production geometry, so the two-apply oracle stays the
    # default; the concat path remains available and tested.
    batch_critic: bool = False
    # Per-step EMA decay for the averaged DAM weights (0 disables).  The
    # minimax orbits a good solution (adjacent-checkpoint Dice swings of
    # +/-0.3 measured on the benchmark); evaluating a weight average of the
    # DAM + target-BN is both better and far more seed-stable than any single
    # checkpoint (rebuild knob; see scripts/seed_sweep.py artifacts).  The
    # average is bias-corrected (raw EMA from zero, divided by accumulated
    # weight at eval) so long windows are usable.
    dam_ema: float = 0.0
    # Equilibrium gate for the weight average (0 disables): fold a step's
    # weights in only while the smoothed |d_acc - 0.5| is below this — the
    # late-run collapse shows up as the critic winning decisively, and gating
    # keeps those degraded weights out of the average (measured r2 sweeps).
    ema_gate: float = 0.0
    # smoothing decay for the gate's |d_acc - 0.5| tracker
    ema_gate_smooth: float = 0.9986
    # Run the FROZEN source-path forward (critic input only; carries no
    # gradient) at bf16 — ~15% step speedup with no effect on DAM gradients
    # (taps cast back to f32 before the critic).
    src_feats_bf16: bool = False
    # Run the D-phase TARGET forward at bf16 too: computed outside the
    # critic-loss grad, it carries no DAM gradient (exactly like the frozen
    # source path), so bf16 rounds only the critic's view of target
    # features.  The G-phase forward/backward — the precision-critical
    # pathway (the r2 bf16-everywhere cliff; the critic itself always
    # computes f32, ops/layers.py conv default) — stays at
    # segmenter.compute_dtype.
    tgt_feats_bf16: bool = False
    # Unsupervised checkpoint-selection signal (train/adapt.py selectors):
    # "class_ratio"  — L1 distance of predicted target class fractions to the
    #                  source label marginals (measured best: near-oracle)
    # "equilibrium"  — smoothed critic-equilibrium distance |d_acc - 0.5|
    select_signal: str = "class_ratio"
    # Steps (after pretrain) before selection may fire; clamped to steps/5
    # for short runs.  500 measured best across BOTH benchmark directions
    # (docs/design.md section 5c): the very first checkpoints can
    # accidentally match the prior, while MRI->CT peaks as early as ~750.
    select_warmup: int = 500
    # Selection-probe cadence in steps, independent of run.ckpt_every: the
    # probe is one cheap device dispatch, and the selected weights are
    # stashed host-side (DAM + target BN only, ~MBs) and materialized as a
    # checkpoint at run end — so selection keeps its measured 250-step
    # granularity (0.78/0.80 mean Dice vs 0.69/0.78 at 1000) without 4x
    # checkpoint I/O.  0 falls back to the ckpt_every cadence.
    select_every: int = 250
    # Final-pick policy over class-ratio-selected candidates:
    # "cr"     — argmin class-ratio distance (the r2/r3 behavior)
    # "cr_ent" — keep the ``select_topk`` lowest-cr candidates and pick by
    #            rank-combined 2*rank(cr) + rank(mean prediction entropy):
    #            among prior-plausible checkpoints, prefer the most
    #            confident predictions.  Offline-validated over 54 seeds /
    #            14 sweep artifacts (scripts/analyze_selection.py shapes):
    #            +0.030 ct2mri ev100 / +0.013 mri2ct r3 mean Dice, min seed
    #            never worse (docs/design.md section 5c).
    select_policy: str = "cr_ent"
    # Reservoir size for select_policy="cr_ent" (16 measured: matches the
    # full-curve rank policy on every sweep; host stash is topk small
    # DAM+BN copies)
    select_topk: int = 16
    # Probe-noise denoising for the selection signal: centered boxcar over
    # the predicted-fracs/entropy streams spanning ~this many TRAINING
    # STEPS (window in ticks = round(span / select_every), forced odd —
    # rounds DOWN to no-op when the cadence is coarser than the span).
    # Mechanism + measurement: results/policy_prereg_r5.json — one noisy
    # probe tick can win argmin catastrophically (ct2mri seed 2: picked
    # 0.530 vs oracle 0.722 two ticks apart); a +-1-tick average halves
    # probe-noise variance while quality drifts slowly at the ~300-step
    # scale.  0 = off (the r4 behavior).
    select_smooth_span: int = 0


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Rebuild-added: data-parallel over an ICI mesh (SURVEY S2 table)."""

    data_axis: str = "data"
    sync_bn: bool = True


@dataclasses.dataclass(frozen=True)
class RunConfig:
    seed: int = 0
    log_every: int = 50
    ckpt_every: int = 1000
    ckpt_dir: str = "checkpoints"
    metrics_path: str = "metrics.jsonl"
    use_pallas: bool = False
    donate: bool = True
    debug_nans: bool = False  # dev-mode jax_debug_nans (SURVEY section 5)
    # 3D eval post-processing: "cc" keeps each structure's largest connected
    # component (the benchmark lineage's reported-number practice — kills
    # distant false-positive islands that blow up ASSD), "none" reports raw
    # predictions.  evaluate --postprocess overrides.
    eval_postprocess: str = "none"
    # Test-time augmentation at eval/serving: "flip" averages class
    # probabilities over the horizontal flip (2 forwards/slice; training
    # draws flips too, data.flip).  evaluate/predict --tta overrides.
    eval_tta: str = "none"
    # Serving/eval-only bf16 compute: evaluate/predict build their forward
    # with segmenter.compute_dtype=bfloat16, leaving the TRAINING dtype
    # untouched (adversarial training is precision-sensitive — the measured
    # bf16 quality cliffs in docs/roadmap.md — but the eval-mode forward is
    # not; decision data in results/serving_paths.json).
    eval_bf16: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Bundle of everything; JSON round-trippable."""

    segmenter: SegmenterConfig = SegmenterConfig()
    critic: CriticConfig = CriticConfig()
    data: DataConfig = DataConfig()
    source: SourceTrainConfig = SourceTrainConfig()
    adapt: AdaptConfig = AdaptConfig()
    parallel: ParallelConfig = ParallelConfig()
    run: RunConfig = RunConfig()

    # ------------------------------------------------------------------ JSON
    def to_json(self) -> str:
        def enc(o):
            if dataclasses.is_dataclass(o):
                return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
            if isinstance(o, (tuple, list)):
                return [enc(v) for v in o]
            if isinstance(o, dict):
                return {k: enc(v) for k, v in o.items()}
            if not isinstance(o, (str, int, float, bool, type(None))):
                # dtype-like leaves: jnp.float32 (a jax _ScalarMeta),
                # ml_dtypes.bfloat16 (a numpy scalar type from from_json), …
                try:
                    return jnp.dtype(o).name
                except (TypeError, ValueError):
                    pass
            return o

        return json.dumps(enc(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        return ExperimentConfig(
            segmenter=_seg_from(raw.get("segmenter", {})),
            critic=_mk(CriticConfig, raw.get("critic", {})),
            data=_mk(DataConfig, raw.get("data", {})),
            source=_mk(SourceTrainConfig, raw.get("source", {})),
            adapt=_mk(AdaptConfig, raw.get("adapt", {})),
            parallel=_mk(ParallelConfig, raw.get("parallel", {})),
            run=_mk(RunConfig, raw.get("run", {})),
        )


def _tupled(v):
    return tuple(v) if isinstance(v, list) else v


def _mk(cls, d):
    fields = {f.name for f in dataclasses.fields(cls)}
    kw = {k: _tupled(v) for k, v in d.items() if k in fields}
    return cls(**kw)


def _seg_from(d):
    d = dict(d)
    if "stages" in d:
        d["stages"] = tuple(_mk(StageSpec, s) for s in d["stages"])
    if "compute_dtype" in d and isinstance(d["compute_dtype"], str):
        d["compute_dtype"] = jnp.dtype(d["compute_dtype"]).type
    return _mk(SegmenterConfig, d)


def eval_view(cfg: ExperimentConfig) -> ExperimentConfig:
    """The config the eval/serving forward should be built with: applies
    ``run.eval_bf16`` (serving-only bf16 compute) without touching the
    training dtype.  Every evaluate/predict entry point (cli, api) builds
    its forward through this view."""
    if not cfg.run.eval_bf16 or cfg.segmenter.compute_dtype == jnp.bfloat16:
        return cfg
    return dataclasses.replace(
        cfg, segmenter=dataclasses.replace(cfg.segmenter,
                                           compute_dtype=jnp.bfloat16))
