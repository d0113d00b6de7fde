"""Distributed tests on the 8-device CPU mesh (SURVEY section 4): DP step
equivalence with single-device training, sharded eval forward."""


import jax
import jax.numpy as jnp
import numpy as np

from mcmda_tpu.data import synthetic, volumes
from mcmda_tpu.parallel import dp, mesh as mesh_mod
from mcmda_tpu.train import adapt, source
from mcmda_tpu.models import segmenter


def _big_batch(cfg, n, domain="mri"):
    vols, labs = synthetic.make_dataset(0, domain, 2, depth=8, size=32)
    ds = volumes.volumes_to_slices(vols, labs)
    reps = int(np.ceil(n / len(ds)))
    idx = np.tile(np.arange(len(ds)), reps)[:n]
    return {"image": jnp.asarray(ds.images[idx]),
            "label": jnp.asarray(np.eye(5, dtype=np.float32)[ds.labels[idx]])}


def test_dp_matches_single_device(tiny_config, eight_devices):
    """One DP step over 8 shards == one single-device step on the full batch
    (same grads via pmean; sync BN via psum)."""
    cfg = tiny_config
    m = mesh_mod.make_mesh(8)
    batch = _big_batch(cfg, 16)

    s0 = source.init_state(jax.random.key(0), cfg)
    single = jax.jit(source.make_train_step(cfg, augment=False))
    s_single, m_single = single(s0, batch, jax.random.key(9))

    s0b = source.init_state(jax.random.key(0), cfg)
    dp_step = dp.data_parallel_step(
        source.make_train_step(cfg, axis_name="data", augment=False), m,
        donate=False)
    s_dp, m_dp = dp_step(s0b, batch, jax.random.key(9))

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    # Adam's g/(sqrt(v)+eps) amplifies float reduction-order noise for tiny
    # grads; 5e-4 on params after one step is well inside that envelope.
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_single.bn_state),
                    jax.tree.leaves(s_dp.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_adapt_step_matches_single_device(tiny_config, eight_devices):
    """Adaptation DP == single-device: GAN losses are batch means (pmean
    exact), BN stats sync'd, grads pmean'd."""
    cfg = tiny_config
    m = mesh_mod.make_mesh(8)
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    batch = {"src_image": _big_batch(cfg, 16)["image"],
             "tgt_image": _big_batch(cfg, 16, "ct")["image"]}

    s0 = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    single = jax.jit(adapt.make_adapt_step(cfg, augment=False))
    s_single, m_single = single(s0, batch, jax.random.key(2))

    s0b = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    step = dp.data_parallel_step(
        adapt.make_adapt_step(cfg, axis_name="data", augment=False), m,
        donate=False)
    s_dp, m_dp = step(s0b, batch, jax.random.key(2))

    np.testing.assert_allclose(float(m_single["d_loss"]),
                               float(m_dp["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_single["g_loss"]),
                               float(m_dp["g_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_single.dam_params),
                    jax.tree.leaves(s_dp.dam_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # Adam's g/(sqrt(v)+eps) amplifies reduction-order noise when v ~ 0 at
    # step 1; 2e-3 is within that envelope for the critic
    for a, b in zip(jax.tree.leaves(s_single.critic_params),
                    jax.tree.leaves(s_dp.critic_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_dp_adapt_throttled_matches_single_device(tiny_config, eight_devices):
    """With d_acc_cap < 1 the throttle gate must use the GLOBAL critic
    accuracy (pmean) — per-shard gating would silently diverge critic params
    across replicas (check_vma=False hides it)."""
    import dataclasses
    cfg = dataclasses.replace(
        tiny_config, adapt=dataclasses.replace(tiny_config.adapt,
                                               d_acc_cap=0.5))
    m = mesh_mod.make_mesh(8)
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    batch = {"src_image": _big_batch(cfg, 16)["image"],
             "tgt_image": _big_batch(cfg, 16, "ct")["image"]}

    s0 = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    single = jax.jit(adapt.make_adapt_step(cfg, augment=False))
    s_single, m_single = single(s0, batch, jax.random.key(2))

    s0b = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    step = dp.data_parallel_step(
        adapt.make_adapt_step(cfg, axis_name="data", augment=False), m,
        donate=False)
    s_dp, m_dp = step(s0b, batch, jax.random.key(2))

    np.testing.assert_allclose(float(m_single["d_acc"]), float(m_dp["d_acc"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.critic_params),
                    jax.tree.leaves(s_dp.critic_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    # replicas must agree exactly with each other (the actual divergence bug):
    # a replicated output is only self-consistent if all shards computed the
    # same values; fetching succeeds and is deterministic here, and the opt
    # state must equal the single-device one when the gate held
    for a, b in zip(jax.tree.leaves(s_single.opt_d_state),
                    jax.tree.leaves(s_dp.opt_d_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_sharded_eval_forward(tiny_config, eight_devices):
    cfg = tiny_config
    m = mesh_mod.make_mesh(8)
    params, bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    fwd = source.make_eval_forward(cfg)
    sharded = dp.data_parallel_forward(fwd, m)
    imgs = jnp.ones((16, 32, 32, 3))
    probs = sharded(params, bn, imgs)
    ref = jax.jit(fwd)(params, bn, imgs)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref), atol=1e-5)


def test_sharded_eval_forward_compiles_once(tiny_config, eight_devices):
    """Serving path: repeated volume evals through data_parallel_forward
    reuse ONE traced callable (no per-call shard_map re-wrap / re-trace)."""
    cfg = tiny_config
    m = mesh_mod.make_mesh(8)
    params, bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    traces = {"n": 0}
    raw = source.make_eval_forward(cfg)

    def counting_fwd(p, b, img):
        traces["n"] += 1
        return raw(p, b, img)

    sharded = dp.data_parallel_forward(counting_fwd, m)
    imgs = jnp.ones((16, 32, 32, 3))
    for _ in range(3):
        jax.block_until_ready(sharded(params, bn, imgs))
    assert traces["n"] == 1, f"re-traced {traces['n']} times"


def test_rng_per_shard_differs(tiny_config, eight_devices):
    """Augmentation rng is folded with axis_index: shards see different keys."""
    m = mesh_mod.make_mesh(8)
    from functools import partial
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=m, in_specs=(P(),), out_specs=P("data"),
             check_vma=False)
    def keys_fn(rng):
        k = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return jax.random.uniform(k, (1,))

    vals = np.asarray(keys_fn(jax.random.key(0)))
    assert len(np.unique(vals)) == 8


def test_make_mesh_falls_back_to_cpu(eight_devices):
    """make_mesh(n) with n > default-platform devices uses the virtual CPU
    platform instead of a confusing short slice."""
    m = mesh_mod.make_mesh(8)
    assert len(m.devices.ravel()) == 8
    import pytest
    with pytest.raises(ValueError, match="make_mesh"):
        mesh_mod.make_mesh(4096)


def test_predict_volume_sharded_matches_single(tiny_config, eight_devices):
    """Mesh-sharded volume eval (one scanned dispatch, batch sharded over the
    mesh) == unsharded, and the sharded forward is cached across volumes."""
    from mcmda_tpu.evaluation import inference
    cfg = tiny_config
    m = mesh_mod.make_mesh(8)
    params, bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    raw = source.make_eval_forward(cfg)

    def fwd(img, p, b):
        return raw(p, b, img)

    vol = np.asarray(jax.random.normal(jax.random.key(1), (12, 32, 32)),
                     np.float32)
    ref = inference.predict_volume(fwd, vol, context=3, batch_size=8,
                                   fwd_args=(params, bn))
    n0 = len(inference._shard_cache)
    out = inference.predict_volume(fwd, vol, context=3, batch_size=8,
                                   fwd_args=(params, bn), mesh=m)
    out2 = inference.predict_volume(fwd, vol, context=3, batch_size=8,
                                    fwd_args=(params, bn), mesh=m)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out2, ref)
    assert len(inference._shard_cache) == n0 + 1  # one cached wrapper


def test_shard_dataset_partitions(monkeypatch):
    """multihost.shard_dataset: trims to a device-count multiple and the
    per-process ranges partition the trimmed dataset disjointly."""
    from mcmda_tpu.parallel import multihost
    vols, labs = synthetic.make_dataset(0, "mri", 2, depth=8, size=16)
    ds = volumes.volumes_to_slices(vols, labs)
    n_dev, n_proc = 8, 2
    got = []
    for pid in range(n_proc):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        monkeypatch.setattr(jax, "process_count", lambda: n_proc)
        sub = multihost.shard_dataset(ds, n_dev)
        assert len(sub) % (n_dev // n_proc) == 0
        got.append(sub)
    total = sum(len(s) for s in got)
    assert total == (len(ds) // n_dev) * n_dev
    rec = np.concatenate([s.images for s in got], axis=0)
    np.testing.assert_array_equal(rec, ds.images[:total])
