"""M1 + M2 + M4: dilated-residual segmenter with plug-and-play DAM split.

Architecture [P1 Fig.2; SURVEY M1]: entry conv -> strided residual modules
(x8 total downsampling) -> dilated (rate 2, then 4) residual modules holding
1/8 resolution -> 1x1 classifier conv (5 classes) -> x8 bilinear upsample ->
softmax.  Widths 16 -> 512.

The PnP-AdaNet mechanism (M2) [P1 SIII-A]: during adaptation the first
stages up to ``plug_depth`` — the Domain Adaptation Module (DAM) — are
duplicated for the target domain (initialized from source weights) and are
the ONLY trainable part of the segmentation path; the Higher-Layer Module
(HLM) stays frozen and shared.  Because params live in a per-stage dict
pytree, the split is ``dam_split``/``dam_merge`` — a filter, not surgery.

Multi-level taps (M4): ``apply`` returns every stage's activation in a dict;
the critic config selects which feed the discriminator.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mcmda_tpu.config import SegmenterConfig
from mcmda_tpu.ops import blocks, layers, s2d


def init(key, cfg: SegmenterConfig):
    """Returns (params, state) dict pytrees keyed by stage name + 'head'."""
    keys = jax.random.split(key, len(cfg.stages) + 1)
    params: Dict = {}
    state: Dict = {}
    cin = cfg.in_channels
    for i, spec in enumerate(cfg.stages):
        if spec.name == "stem":
            # entry conv + BN (no residual) — the reference's first conv layer
            p = {"conv": layers.conv_init(keys[i], 3, 3, cin, spec.features)}
            s = {}
            p["bn"], s["bn"] = layers.bn_init(spec.features)
            params[spec.name], state[spec.name] = p, s
        else:
            params[spec.name], state[spec.name] = blocks.stage_init(keys[i], cin, spec)
        cin = spec.features
    params["head"] = layers.conv_init(keys[-1], 1, 1, cin, cfg.num_classes,
                                      use_bias=True)
    return params, state


def apply(
    params,
    state,
    x,
    cfg: SegmenterConfig,
    *,
    train: bool = False,
    axis_name=None,
    dam_params=None,
    plug_depth: str | None = None,
    bn_train_stages: frozenset | None = None,
):
    """Forward pass.

    If ``dam_params`` is given, stages up to and including ``plug_depth`` read
    weights from it (the target-domain DAM) while later stages read the
    (frozen) ``params`` — this implements the plug-and-play swap without a
    second graph.  ``state`` always carries the BN statistics for the path
    being run (source state for the source path; a target-path copy during
    adaptation).

    ``bn_train_stages`` (static) restricts which stages use batch statistics
    when ``train=True`` — the ``hlm_bn="frozen"`` adaptation policy passes the
    DAM stage names here so the frozen HLM keeps its source running stats
    (SURVEY section 7 hard-part (b)).

    Returns (logits, probs, taps, new_state):
      logits [N,H,W,C] at input resolution, probs = softmax(logits),
      taps = {stage_name: activation} for M4.
    """
    taps: Dict[str, jnp.ndarray] = {}
    new_state: Dict = {}
    in_dam = dam_params is not None
    h = x.astype(cfg.compute_dtype)
    h_s2d = None  # space-to-depth view of the previous stage's output
    for spec in cfg.stages:
        p_src = dam_params if in_dam else params
        p = p_src[spec.name]
        stage_train = train and (bn_train_stages is None
                                 or spec.name in bn_train_stages)
        if spec.name == "stem":
            if (cfg.thin_layout in ("s2d", "s2d2") and h.shape[1] % 2 == 0
                    and h.shape[2] % 2 == 0):
                # thin-stage fast path (ops/s2d.py): dense MXU convs over
                # slot channels; exact vs the NHWC path (tested)
                y2 = s2d.stem_conv(s2d.space_to_depth(h), p["conv"]["w"],
                                   cfg.compute_dtype)
                y2, bn_s = s2d.bn_relu(p["bn"], state[spec.name]["bn"], y2,
                                       spec.features, stage_train,
                                       cfg.bn_momentum, cfg.bn_eps, axis_name)
                h_s2d = y2
                # NHWC view: XLA dead-code-eliminates this when no consumer
                # (taps/critic) actually reads the stem activation
                h = s2d.depth_to_space(y2, spec.features)
            else:
                h = layers.conv_apply(p["conv"], h,
                                      compute_dtype=cfg.compute_dtype)
                h, bn_s = layers.bn_apply(p["bn"], state[spec.name]["bn"], h,
                                          stage_train, cfg.bn_momentum,
                                          cfg.bn_eps, axis_name)
                h = layers.relu(h)
            new_state[spec.name] = {"bn": bn_s}
        else:
            if h_s2d is not None and spec.stride == 2 and spec.dilation == 1:
                # "s2d2": keep this stage s2d-RESIDENT when its slot width
                # still fits one VREG lane group (4*features <= 128) and the
                # half-res grid blocks 2x2 again — the next stage's entry
                # then consumes the s2d view directly, so the thin 32-lane
                # convs (and their 4-13 TF/s backwards) never materialize.
                keep_s2d = (cfg.thin_layout == "s2d2"
                            and 4 * spec.features <= 128
                            and h_s2d.shape[1] % 2 == 0
                            and h_s2d.shape[2] % 2 == 0)
                out, st = blocks.stage_apply_s2d_entry(
                    p, state[spec.name], h_s2d, spec, train=stage_train,
                    momentum=cfg.bn_momentum, eps=cfg.bn_eps,
                    axis_name=axis_name, compute_dtype=cfg.compute_dtype,
                    out_s2d=keep_s2d)
                if keep_s2d:
                    h_s2d = out
                    # NHWC view for taps; DCE'd when no tap consumer reads it
                    h = s2d.depth_to_space(out, spec.features)
                else:
                    h = out
                    h_s2d = None
            else:
                h, st = blocks.stage_apply(p, state[spec.name], h, spec,
                                           train=stage_train,
                                           momentum=cfg.bn_momentum,
                                           eps=cfg.bn_eps,
                                           axis_name=axis_name,
                                           compute_dtype=cfg.compute_dtype,
                                           fused_train=(cfg.train_fused
                                                        == "pallas"))
                h_s2d = None
            new_state[spec.name] = st
        taps[spec.name] = h
        if in_dam and plug_depth is not None and spec.name == plug_depth:
            in_dam = False  # hand off to the frozen HLM
    logits_low = layers.conv_apply(params["head"], h, compute_dtype=cfg.compute_dtype)
    # losses/softmax want f32; upsample in compute dtype (cheaper), then cast
    logits = layers.bilinear_upsample(logits_low, cfg.total_stride)
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return logits, probs, taps, new_state


# ------------------------------------------------------- fused inference path
def apply_fused_eval(params, state, x, cfg: SegmenterConfig, *,
                     dam_params=None, plug_depth: str | None = None,
                     use_pallas: bool = True):
    """Eval-mode forward on the Pallas-fused path (E1 hot loop).

    Every stride-1 residual block runs as two fused conv+BN-affine+activation
    kernels (the second carrying the residual add); strided blocks, 1x1s and
    the head stay on XLA.  Exactly matches ``apply(..., train=False)`` up to
    float reassociation — tested in tests/test_kernels.py.

    Returns (logits, probs).
    """
    from mcmda_tpu.kernels import fused_conv as fk

    conv_bn_act = (fk.conv_bn_act_auto if use_pallas
                   else fk.conv_bn_act_reference)
    in_dam = dam_params is not None
    h = x
    for spec in cfg.stages:
        p_src = dam_params if in_dam else params
        p = p_src[spec.name]
        st = state[spec.name]
        if spec.name == "stem":
            scale, bias = fk.fold_bn(p["bn"], st["bn"], cfg.bn_eps)
            h = conv_bn_act(h, p["conv"]["w"], scale, bias,
                            dilation=1, activation="relu")
        else:
            for i in range(spec.blocks):
                bp, bs = p[f"b{i}"], st[f"b{i}"]
                stride = spec.stride if i == 0 else 1
                if stride != 1:
                    # strided block: XLA path (eval-mode BN)
                    h, _ = blocks.residual_block_apply(
                        bp, bs, h, stride=stride, dilation=spec.dilation,
                        train=False, eps=cfg.bn_eps,
                        compute_dtype=cfg.compute_dtype)
                    continue
                s1, b1 = fk.fold_bn(bp["bn1"], bs["bn1"], cfg.bn_eps)
                s2, b2 = fk.fold_bn(bp["bn2"], bs["bn2"], cfg.bn_eps)
                h1 = conv_bn_act(h, bp["conv1"]["w"], s1, b1,
                                 dilation=spec.dilation, activation="relu")
                if "proj" in bp:
                    sp_, bp_ = fk.fold_bn(bp["bn_p"], bs["bn_p"], cfg.bn_eps)
                    sc = layers.conv_apply(bp["proj"], h) * sp_ + bp_
                else:
                    sc = h
                h = conv_bn_act(h1, bp["conv2"]["w"], s2, b2,
                                dilation=spec.dilation, activation="relu",
                                residual=sc)
        if in_dam and plug_depth is not None and spec.name == plug_depth:
            in_dam = False
    logits_low = layers.conv_apply(params["head"], h,
                                   compute_dtype=cfg.compute_dtype)
    logits = layers.bilinear_upsample(logits_low, cfg.total_stride)
    return logits, jax.nn.softmax(logits, axis=-1)


# ------------------------------------------------------------- DAM plumbing
def dam_stage_names(cfg: SegmenterConfig, plug_depth: str) -> Tuple[str, ...]:
    names = []
    for spec in cfg.stages:
        names.append(spec.name)
        if spec.name == plug_depth:
            return tuple(names)
    raise ValueError(f"plug_depth {plug_depth!r} not a stage of the segmenter")


def dam_split(params, cfg: SegmenterConfig, plug_depth: str):
    """Split a full param tree into (dam, hlm) sub-trees by stage name.

    Mirrors the reference's variable-scope filtering (SURVEY K1: the source
    checkpoint restores into BOTH the source path and the DAM init).
    """
    dam_names = set(dam_stage_names(cfg, plug_depth))
    dam = {k: v for k, v in params.items() if k in dam_names}
    hlm = {k: v for k, v in params.items() if k not in dam_names}
    return dam, hlm


def dam_init_from_source(params, cfg: SegmenterConfig, plug_depth: str):
    """Target DAM initialization = copy of the source stages [P1 SIII-A]."""
    dam, _ = dam_split(params, cfg, plug_depth)
    return jax.tree.map(jnp.array, dam)


def dam_merge(dam_params, hlm_params):
    return {**hlm_params, **dam_params}


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
