"""Shared execution-strategy plumbing for the CLI and the library API.

One place decides HOW a train step runs — single device, single-process
data-parallel over a device mesh, or multi-host (pod) data-parallel — and
HOW batches reach it (host sampler + double-buffered feed, or device-
resident dataset with on-device sampling inside a scanned step).  cli.py
and api.py are thin frontends over these helpers, so `--dp 8` on the
command line and ``api.adapt(cfg, ..., dp=8)`` execute identically
(SURVEY L4 public-interface parity; VERDICT r2 item 7).
"""

from __future__ import annotations


def multihost_active() -> bool:
    import jax
    return jax.process_count() > 1


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def feed(sampler_pairs, prefetch: int = 2, sharding=None):
    from mcmda_tpu.data import pipeline
    return pipeline.prefetch_to_device(sampler_pairs, prefetch, sharding)


def host_seed(seed: int) -> int:
    """Per-host sampler seed: under multi-host each process must draw
    DIFFERENT batches (otherwise the assembled global batch is N copies of
    one host's draw and effective batch diversity silently drops N-fold)."""
    import jax
    return seed + 100003 * jax.process_index()


def feed_plumbing(cfg, dp: int = 0):
    """(per-host global batch size, feed transform) — the input half of
    ``wrap_dp``, for callers that build their step separately (e.g. a
    pretrain and a main step over one shared sampler stream)."""
    import jax
    if multihost_active():
        from mcmda_tpu.parallel import multihost
        mesh = multihost.global_mesh()
        return cfg.data.batch_size * jax.local_device_count(), \
            lambda s: (multihost.global_batch(b, mesh) for b in s)
    if dp and dp > 1:
        from mcmda_tpu.parallel import mesh as mesh_mod
        shd = mesh_mod.batch_sharding(mesh_mod.make_mesh(dp))
        return cfg.data.batch_size * dp, lambda s: feed(s, sharding=shd)
    return cfg.data.batch_size, lambda s: feed(s)


def pick_inner(*counts, cap: int = 50) -> int:
    """Largest dispatch-fusion factor <= cap dividing every phase length and
    the logging grain (so scanned steps land exactly on boundaries)."""
    import math
    g = 0
    for c in counts:
        if c:
            g = math.gcd(g, c)
    if g <= 0:
        return 1
    for d in range(min(cap, g), 0, -1):
        if g % d == 0:
            return d
    return 1


def wrap_dp(cfg, make_step, dp: int = 0, **mk_kwargs):
    """Returns (step_fn, per-host global batch size, feed transform).

    Multi-host: the mesh spans every process's devices; each host samples
    its per-host share of the global batch and ``multihost.global_batch``
    assembles the global arrays; state/rng are replicated lazily on first
    step; psum/pmean inside the step ride ICI (and DCN across slices).
    """
    import jax
    if multihost_active():
        from mcmda_tpu.parallel import dp as dp_mod, multihost
        mesh = multihost.global_mesh()
        inner = dp_mod.data_parallel_step(
            make_step(cfg, axis_name=cfg.parallel.data_axis, **mk_kwargs),
            mesh, donate=False)

        def mh_step(state, batch, rng):
            state = multihost.ensure_replicated(state, mesh)
            rng = multihost.replicate(rng, mesh)
            return inner(state, batch, rng)

        per_host = cfg.data.batch_size * jax.local_device_count()

        def to_global(stream):
            return (multihost.global_batch(b, mesh) for b in stream)

        return mh_step, per_host, to_global
    if dp and dp > 1:
        from mcmda_tpu.parallel import dp as dp_mod, mesh as mesh_mod
        mesh = mesh_mod.make_mesh(dp)
        step = dp_mod.data_parallel_step(
            make_step(cfg, axis_name=cfg.parallel.data_axis, **mk_kwargs),
            mesh, donate=cfg.run.donate)
        shd = mesh_mod.batch_sharding(mesh)
        return step, cfg.data.batch_size * dp, \
            lambda s: feed(s, sharding=shd)
    return jax.jit(make_step(cfg, **mk_kwargs),
                   donate_argnums=(0,) if cfg.run.donate else ()), \
        cfg.data.batch_size, lambda s: feed(s)


def device_resident_dp(cfg, make_step, dp: int, inner, data_builder,
                       **mk_kwargs):
    """Device-resident dataset + scanned on-device-sampling step; the dataset
    shards across replicas under dp>1 (each shard samples locally — the
    single-process form of per-host input sharding).

    Multi-host: the mesh spans every process's devices, each host
    materializes only ITS rows of the dataset (``data_builder`` receives the
    global batch sharding and is expected to pre-shard with
    ``multihost.shard_dataset``), and each device samples from its local
    block inside the shard_map'd step — per-host input sharding with zero
    per-step host transfer."""
    import jax
    from mcmda_tpu.train import loop
    if multihost_active():
        from mcmda_tpu.parallel import dp as dp_mod, mesh as mesh_mod, \
            multihost
        mesh = multihost.global_mesh()
        data = data_builder(mesh_mod.batch_sharding(mesh))
        inner_step = dp_mod.data_parallel_step(
            loop.scanned_step(
                make_step(cfg, axis_name=cfg.parallel.data_axis,
                          sample_from_device=True, **mk_kwargs), inner),
            mesh, donate=False)

        def mh_step(state, batch, rng):
            state = multihost.ensure_replicated(state, mesh)
            rng = multihost.replicate(rng, mesh)
            return inner_step(state, batch, rng)

        return mh_step, data
    if dp and dp > 1:
        from mcmda_tpu.parallel import dp as dp_mod, mesh as mesh_mod
        mesh = mesh_mod.make_mesh(dp)
        data = data_builder(mesh_mod.batch_sharding(mesh))
        step = dp_mod.data_parallel_step(
            loop.scanned_step(
                make_step(cfg, axis_name=cfg.parallel.data_axis,
                          sample_from_device=True, **mk_kwargs), inner),
            mesh, donate=cfg.run.donate)
        return step, data
    data = data_builder(None)
    step = jax.jit(
        loop.scanned_step(make_step(cfg, sample_from_device=True,
                                    **mk_kwargs), inner),
        donate_argnums=(0,) if cfg.run.donate else ())
    return step, data


def batch_sharding_for(dp: int = 0):
    """Batch sharding for feeding device-resident datasets: the multihost
    global mesh when active, a dp-way mesh when dp>1, else None."""
    if multihost_active():
        from mcmda_tpu.parallel import mesh as mesh_mod, multihost
        return mesh_mod.batch_sharding(multihost.global_mesh())
    if dp and dp > 1:
        from mcmda_tpu.parallel import mesh as mesh_mod
        return mesh_mod.batch_sharding(mesh_mod.make_mesh(dp))
    return None
