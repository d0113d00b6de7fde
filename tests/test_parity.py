"""Cross-framework parity: the jax ops must match the reference lineage's
(torch/TF-style) conv/BN/residual semantics with copied weights — the
closest available stand-in for "reproduce reference per-slice softmax"
(SURVEY section 4 parity tier) while the reference mount is empty.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mcmda_tpu.ops import blocks, layers  # noqa: E402


def _to_torch_conv(w_hwio):
    # HWIO -> OIHW
    return torch.tensor(np.transpose(np.asarray(w_hwio), (3, 2, 0, 1)))


@pytest.mark.parametrize("dilation,stride", [(1, 1), (2, 1), (4, 1), (1, 2)])
def test_conv_same_padding_matches_torch(dilation, stride):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    p = layers.conv_init(jax.random.key(0), 3, 3, 4, 8)
    y_jax = np.asarray(layers.conv_apply(p, jnp.asarray(x), stride=stride,
                                         dilation=dilation))
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    # torch SAME for stride 1: pad=dilation; for stride 2 emulate TF SAME
    if stride == 1:
        yt = torch.nn.functional.conv2d(xt, _to_torch_conv(p["w"]),
                                        padding=dilation, dilation=dilation)
    else:
        # TF/XLA SAME with stride 2, even input: pad total = 1 -> (0,1) each dim
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        yt = torch.nn.functional.conv2d(xt, _to_torch_conv(p["w"]),
                                        stride=stride)
    yt = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(y_jax, yt, atol=2e-5)


def test_bn_eval_matches_torch():
    rng = np.random.default_rng(1)
    c = 6
    x = rng.normal(size=(2, 5, 5, c)).astype(np.float32)
    params = {"scale": jnp.asarray(rng.normal(size=c).astype(np.float32)),
              "bias": jnp.asarray(rng.normal(size=c).astype(np.float32))}
    state = {"mean": jnp.asarray(rng.normal(size=c).astype(np.float32)),
             "var": jnp.asarray(np.abs(rng.normal(size=c)).astype(np.float32))}
    y_jax, _ = layers.bn_apply(params, state, jnp.asarray(x), train=False,
                               eps=1e-5)
    bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(np.asarray(params["scale"])))
        bn.bias.copy_(torch.tensor(np.asarray(params["bias"])))
        bn.running_mean.copy_(torch.tensor(np.asarray(state["mean"])))
        bn.running_var.copy_(torch.tensor(np.asarray(state["var"])))
        yt = bn(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(y_jax),
                               np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               atol=2e-5)


def test_residual_block_matches_torch():
    """Full post-activation residual unit, dilation 2, eval BN."""
    rng = np.random.default_rng(2)
    cin = cout = 8
    x = rng.normal(size=(1, 10, 10, cin)).astype(np.float32)
    params, state = blocks.residual_block_init(jax.random.key(1), cin, cout)
    # randomize BN stats so eval BN is non-trivial
    for bn in ("bn1", "bn2"):
        state[bn] = {"mean": jnp.asarray(rng.normal(size=cout)
                                         .astype(np.float32)),
                     "var": jnp.asarray(np.abs(rng.normal(size=cout))
                                        .astype(np.float32) + 0.5)}
    y_jax, _ = blocks.residual_block_apply(params, state, jnp.asarray(x),
                                           dilation=2, train=False)

    def tconv(w, xt, dil):
        return torch.nn.functional.conv2d(xt, _to_torch_conv(w), padding=dil,
                                          dilation=dil)

    def tbn(pname, sname, xt):
        p, s = params[pname], state[sname]
        m = torch.tensor(np.asarray(s["mean"]))[None, :, None, None]
        v = torch.tensor(np.asarray(s["var"]))[None, :, None, None]
        g = torch.tensor(np.asarray(p["scale"]))[None, :, None, None]
        b = torch.tensor(np.asarray(p["bias"]))[None, :, None, None]
        return (xt - m) / torch.sqrt(v + 1e-5) * g + b

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    h = torch.relu(tbn("bn1", "bn1", tconv(params["conv1"]["w"], xt, 2)))
    h = tbn("bn2", "bn2", tconv(params["conv2"]["w"], h, 2))
    yt = torch.relu(h + xt)
    np.testing.assert_allclose(np.asarray(y_jax),
                               np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               atol=5e-5)
