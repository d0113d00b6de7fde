"""Residual / dilated-residual blocks (SURVEY L2, M1 building units).

Post-activation residual unit: conv-BN-ReLU -> conv-BN, identity (or strided
1x1 projection) skip, final ReLU.  Dilation applies to both convs — this is
the "dilated residual module" of the PnP-AdaNet backbone [P1 Fig.2].

Pytree layout per block::

    params = {"conv1": {...}, "bn1": {...}, "conv2": {...}, "bn2": {...},
              ["proj": {...}, "bn_p": {...}]}
    state  = {"bn1": {...}, "bn2": {...}, ["bn_p": {...}]}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcmda_tpu.ops import layers


def residual_block_init(key, cin: int, cout: int, stride: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"conv1": layers.conv_init(k1, 3, 3, cin, cout),
              "conv2": layers.conv_init(k2, 3, 3, cout, cout)}
    state = {}
    params["bn1"], state["bn1"] = layers.bn_init(cout)
    params["bn2"], state["bn2"] = layers.bn_init(cout)
    if stride != 1 or cin != cout:
        params["proj"] = layers.conv_init(k3, 1, 1, cin, cout)
        params["bn_p"], state["bn_p"] = layers.bn_init(cout)
    return params, state


def residual_block_apply(
    params,
    state,
    x,
    *,
    stride: int = 1,
    dilation: int = 1,
    train: bool = False,
    momentum: float = 0.99,
    eps: float = 1e-5,
    axis_name=None,
    compute_dtype=jnp.float32,
    fused_train: bool = False,
):
    new_state = {}

    def _fused_ok(inp, cin: int, cout: int, s: int) -> bool:
        # training-mode conv+BN-stats Pallas fusion (kernels/train_conv.py):
        # stride-1 f32 convs of the wide dilated tail
        if not (fused_train and train and s == 1
                and compute_dtype == jnp.float32):
            return False
        from mcmda_tpu.kernels import train_conv
        n, hh, ww, _ = inp.shape
        return train_conv.fits((n, hh, ww, cin), (3, 3, cin, cout),
                               dilation, jnp.float32)

    c1 = params["conv1"]["w"].shape
    if _fused_ok(x, c1[2], c1[3], stride):
        from mcmda_tpu.kernels import train_conv
        h, new_state["bn1"] = train_conv.conv_bn_act_train(
            params["conv1"], params["bn1"], state["bn1"],
            x.astype(jnp.float32), dilation=dilation, activation="relu",
            momentum=momentum, eps=eps, axis_name=axis_name)
    else:
        h = layers.conv_apply(params["conv1"], x, stride=stride,
                              dilation=dilation, compute_dtype=compute_dtype)
        h, new_state["bn1"] = layers.bn_apply(params["bn1"], state["bn1"], h,
                                              train, momentum, eps, axis_name)
        h = layers.relu(h)

    if "proj" in params:
        sc = layers.conv_apply(params["proj"], x, stride=stride,
                               compute_dtype=compute_dtype)
        sc, new_state["bn_p"] = layers.bn_apply(params["bn_p"], state["bn_p"], sc,
                                                train, momentum, eps, axis_name)
    else:
        sc = x

    c2 = params["conv2"]["w"].shape
    if _fused_ok(h, c2[2], c2[3], 1):
        from mcmda_tpu.kernels import train_conv
        out, new_state["bn2"] = train_conv.conv_bn_act_train(
            params["conv2"], params["bn2"], state["bn2"],
            h.astype(jnp.float32), dilation=dilation, activation="relu",
            momentum=momentum, eps=eps, axis_name=axis_name,
            residual=sc.astype(jnp.float32))
        return out, new_state
    h = layers.conv_apply(params["conv2"], h, stride=1, dilation=dilation,
                          compute_dtype=compute_dtype)
    h, new_state["bn2"] = layers.bn_apply(params["bn2"], state["bn2"], h, train,
                                          momentum, eps, axis_name)
    return layers.relu(h + sc), new_state


def residual_block_apply_s2d_entry(
    params,
    state,
    s2_in,
    *,
    train: bool = False,
    momentum: float = 0.99,
    eps: float = 1e-5,
    axis_name=None,
    compute_dtype=jnp.float32,
    out_s2d: bool = False,
):
    """Stride-2 entry residual block consuming a SPACE-TO-DEPTH input
    (ops/s2d.py): conv1 runs as the dense 2x2 s2d kernel, the 1x1 stride-2
    projection reads block slot (0,0); both land on the natural
    half-resolution NHWC grid.  With ``out_s2d=False`` conv2 and everything
    after are stock NHWC.  With ``out_s2d=True`` (the "s2d2" layout) conv2
    runs as a dense s2d body conv and the block RETURNS an s2d tensor
    [N,H/2,W/2,4*cout] — the residual add and final ReLU are elementwise,
    so doing them in s2d order is exact.  Either way exact ==
    ``residual_block_apply(stride=2, dilation=1)`` on the depth-to-space
    of ``s2_in`` (up to float reassociation in the BN reductions)."""
    from mcmda_tpu.ops import s2d

    new_state = {}
    h = s2d.entry_conv(s2_in, params["conv1"]["w"], compute_dtype)
    h, new_state["bn1"] = layers.bn_apply(params["bn1"], state["bn1"], h, train,
                                          momentum, eps, axis_name)
    h = layers.relu(h)
    sc = s2d.proj_conv(s2_in, params["proj"]["w"], compute_dtype)
    sc, new_state["bn_p"] = layers.bn_apply(params["bn_p"], state["bn_p"], sc,
                                            train, momentum, eps, axis_name)
    if out_s2d:
        k = params["conv2"]["w"].shape[3]
        y2 = s2d.body_conv(s2d.space_to_depth(h), params["conv2"]["w"],
                           compute_dtype)
        y2, new_state["bn2"] = s2d.bn_relu(
            params["bn2"], state["bn2"], y2, k, train, momentum, eps,
            axis_name, relu=False)
        return layers.relu(y2 + s2d.space_to_depth(sc)), new_state
    h = layers.conv_apply(params["conv2"], h, stride=1, dilation=1,
                          compute_dtype=compute_dtype)
    h, new_state["bn2"] = layers.bn_apply(params["bn2"], state["bn2"], h, train,
                                          momentum, eps, axis_name)
    return layers.relu(h + sc), new_state


def residual_block_apply_s2d(
    params,
    state,
    x2,
    k: int,
    *,
    train: bool = False,
    momentum: float = 0.99,
    eps: float = 1e-5,
    axis_name=None,
    compute_dtype=jnp.float32,
):
    """Stride-1 dilation-1 residual block executed ENTIRELY in s2d space
    (no proj: cin == cout).  x2 [N,H',W',4k]; both convs are dense
    [3,3,4k,4k] kernel embeddings (ops/s2d.py body_conv), BN folds the 4
    block slots into its per-original-channel reduction, and the identity
    skip / final ReLU are elementwise so s2d order is exact.  Exact ==
    ``residual_block_apply(stride=1, dilation=1)`` on depth_to_space(x2)."""
    from mcmda_tpu.ops import s2d

    new_state = {}
    h2 = s2d.body_conv(x2, params["conv1"]["w"], compute_dtype)
    h2, new_state["bn1"] = s2d.bn_relu(params["bn1"], state["bn1"], h2, k,
                                       train, momentum, eps, axis_name)
    h2 = s2d.body_conv(h2, params["conv2"]["w"], compute_dtype)
    h2, new_state["bn2"] = s2d.bn_relu(params["bn2"], state["bn2"], h2, k,
                                       train, momentum, eps, axis_name,
                                       relu=False)
    return layers.relu(h2 + x2), new_state


def stage_apply_s2d_entry(params, state, s2_in, spec, *, train=False,
                          momentum=0.99, eps=1e-5, axis_name=None,
                          compute_dtype=jnp.float32, out_s2d=False):
    """``stage_apply`` whose FIRST (stride-2) block consumes an s2d tensor.

    ``out_s2d=True`` keeps the WHOLE stage s2d-resident (entry block emits
    s2d, later blocks run as dense slot-channel convs) and returns an s2d
    tensor [N,H/2,W/2,4*features] — the caller depth_to_spaces it for taps
    and hands it to the next stage's s2d entry."""
    assert not (out_s2d and spec.dilation != 1), \
        "s2d-resident bodies are stride-1/dilation-1 only"
    new_state = {}
    x, new_state["b0"] = residual_block_apply_s2d_entry(
        params["b0"], state["b0"], s2_in, train=train, momentum=momentum,
        eps=eps, axis_name=axis_name, compute_dtype=compute_dtype,
        out_s2d=out_s2d)
    for i in range(1, spec.blocks):
        if out_s2d:
            x, new_state[f"b{i}"] = residual_block_apply_s2d(
                params[f"b{i}"], state[f"b{i}"], x, spec.features,
                train=train, momentum=momentum, eps=eps,
                axis_name=axis_name, compute_dtype=compute_dtype)
        else:
            x, new_state[f"b{i}"] = residual_block_apply(
                params[f"b{i}"], state[f"b{i}"], x, stride=1,
                dilation=spec.dilation, train=train, momentum=momentum,
                eps=eps, axis_name=axis_name, compute_dtype=compute_dtype)
    return x, new_state


def stage_init(key, cin: int, spec):
    """A stage = `spec.blocks` residual blocks; the first carries the stride/
    channel change."""
    keys = jax.random.split(key, spec.blocks)
    params, state = {}, {}
    c = cin
    for i in range(spec.blocks):
        bp, bs = residual_block_init(keys[i], c, spec.features,
                                     stride=spec.stride if i == 0 else 1)
        params[f"b{i}"] = bp
        state[f"b{i}"] = bs
        c = spec.features
    return params, state


def stage_apply(params, state, x, spec, *, train=False, momentum=0.99, eps=1e-5,
                axis_name=None, compute_dtype=jnp.float32, fused_train=False):
    new_state = {}
    for i in range(spec.blocks):
        x, new_state[f"b{i}"] = residual_block_apply(
            params[f"b{i}"], state[f"b{i}"], x,
            stride=spec.stride if i == 0 else 1,
            dilation=spec.dilation,
            train=train, momentum=momentum, eps=eps,
            axis_name=axis_name, compute_dtype=compute_dtype,
            fused_train=fused_train)
    return x, new_state
