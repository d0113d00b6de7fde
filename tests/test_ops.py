"""Unit tests for the ops layer (SURVEY section 4: kernels vs lax reference,
BN semantics, losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmda_tpu.ops import blocks, layers, losses


def test_conv_matches_explicit_dilation():
    key = jax.random.key(0)
    p = layers.conv_init(key, 3, 3, 4, 8)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    y1 = layers.conv_apply(p, x, dilation=2)
    # explicit reference: conv with manually dilated kernel
    w = p["w"]
    wd = jnp.zeros((5, 5, 4, 8)).at[::2, ::2].set(w)
    y2 = jax.lax.conv_general_dilated(x, wd, (1, 1), "SAME",
                                      dimension_numbers=layers.DIMSPEC)
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_conv_stride_shape():
    p = layers.conv_init(jax.random.key(0), 3, 3, 3, 8)
    y = layers.conv_apply(p, jnp.ones((1, 32, 32, 3)), stride=2)
    assert y.shape == (1, 16, 16, 8)


def test_bn_train_normalizes_and_updates_state():
    params, state = layers.bn_init(4)
    x = jax.random.normal(jax.random.key(0), (8, 6, 6, 4)) * 3.0 + 2.0
    y, new_state = layers.bn_apply(params, state, x, train=True, momentum=0.5)
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    assert float(jnp.abs(new_state["mean"]).sum()) > 0.1


def test_bn_eval_uses_running_stats():
    params, state = layers.bn_init(2)
    state = {"mean": jnp.array([1.0, -1.0]), "var": jnp.array([4.0, 4.0])}
    x = jnp.zeros((1, 2, 2, 2))
    y, st = layers.bn_apply(params, state, x, train=False)
    np.testing.assert_allclose(y[0, 0, 0], [-0.5, 0.5], atol=1e-3)
    assert st is state


def test_residual_block_identity_shape_and_grad():
    p, s = blocks.residual_block_init(jax.random.key(0), 8, 16, stride=2)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8))

    def f(p):
        y, _ = blocks.residual_block_apply(p, s, x, stride=2, train=True)
        return jnp.sum(y ** 2)

    g = jax.grad(f)(p)
    assert all(np.isfinite(v).all() for v in jax.tree.leaves(g))


def test_upsample_shape():
    y = layers.bilinear_upsample(jnp.ones((1, 4, 4, 5)), 8)
    assert y.shape == (1, 32, 32, 5)


def test_avg_pool_matches_mean():
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 2))
    y = layers.avg_pool(x, 4)
    np.testing.assert_allclose(y[0, 0, 0, 0],
                               x[0, :4, :4, 0].mean(), atol=1e-5)


# ----------------------------------------------------------------- losses
def test_xent_perfect_prediction_low_loss():
    labels = jax.nn.one_hot(jnp.zeros((2, 8, 8), jnp.int32), 5)
    logits = labels * 20.0
    loss = losses.weighted_cross_entropy(logits, labels)
    assert float(loss) < 1e-3


def test_dice_loss_range():
    probs = jax.nn.one_hot(jnp.ones((2, 8, 8), jnp.int32), 5)
    labels = probs
    assert float(losses.soft_dice_loss(probs, labels)) < 0.01
    # disjoint predictions: classes 1,2 fully wrong (dice~0), classes 3,4
    # absent from both (dice=1 via smoothing) -> loss ~ 0.5
    wrong = jax.nn.one_hot(2 * jnp.ones((2, 8, 8), jnp.int32), 5)
    assert 0.4 < float(losses.soft_dice_loss(probs, wrong)) < 0.6


@pytest.mark.parametrize("kind", ["nonsat", "lsgan"])
def test_gan_losses_directionality(kind):
    d_fn, g_fn = losses.gan_losses(kind)
    strong_src = jnp.full((4, 10), 5.0)
    strong_tgt = jnp.full((4, 10), -5.0)
    # confident correct critic -> low d loss, high g loss
    assert float(d_fn(strong_src, strong_tgt, 0.0)) < \
        float(d_fn(strong_tgt, strong_src, 0.0))
    assert float(g_fn(strong_tgt)) > float(g_fn(strong_src))


def test_critic_accuracy_equilibrium():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(64, 32)))
    acc = losses.critic_accuracy(logits, logits)
    assert 0.4 < float(acc) < 0.6


def test_decision_boundary_per_loss():
    """VERDICT r2 weak-1: LSGAN regresses src->1 / tgt->0, so the critic
    decision point is 0.5, not 0.  A confidently-separated LSGAN critic must
    score d_acc ~1.0 with the per-loss boundary (it scored ~0.75 with the
    old fixed 0 threshold: half the tgt logits in [0, 0.5) read as wrong)."""
    from mcmda_tpu.ops import losses
    assert losses.decision_boundary("nonsat") == 0.0
    assert losses.decision_boundary("lsgan") == 0.5
    with pytest.raises(ValueError):
        losses.decision_boundary("wgan")
    # separated LSGAN critic: src ~ 0.9, tgt ~ 0.1 +- noise
    k = jax.random.key(0)
    src = 0.9 + 0.05 * jax.random.normal(k, (64,))
    tgt = 0.1 + 0.05 * jax.random.normal(jax.random.key(1), (64,))
    acc_right = losses.critic_accuracy(src, tgt,
                                       losses.decision_boundary("lsgan"))
    acc_wrong = losses.critic_accuracy(src, tgt, 0.0)
    assert float(acc_right) == 1.0
    assert float(acc_wrong) < 0.8  # tgt side is ~all misread at boundary 0
