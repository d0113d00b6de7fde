"""Multi-host (pod) data parallelism (SURVEY §1 re-layering: "per-host input
sharding"; §2 parallelism table).

Single-controller-per-host JAX SPMD: every process runs the same program,
``jax.distributed`` wires the coordination service, the mesh spans ALL
processes' devices, and each host feeds only its own shard of the global
batch (``global_batch``).  Inside the jitted step nothing changes — the same
``psum``/``pmean`` collectives now ride ICI within a slice and DCN across
slices, lowered by XLA.

Artifact writes (checkpoints, metric files) are gated to process 0 — see
``utils.checkpoint.save`` and the CLI wiring.

Testable without a pod: ``tests/test_multihost.py`` launches real multiple
processes on the virtual CPU platform with gloo collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               cpu_gloo: bool = False) -> bool:
    """Wire ``jax.distributed`` for a multi-process run; returns True when a
    multi-process world was joined.

    On Cloud TPU pods all three args are auto-detected (pass nothing).  For
    the CPU simulation tier, pass them explicitly and set ``cpu_gloo`` BEFORE
    any backend init so the CPU client is built with cross-process gloo
    collectives.
    """
    if cpu_gloo:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None and num_processes is None \
            and process_id is None:
        try:  # TPU-pod auto-detection; harmless no-op off-pod
            jax.distributed.initialize()
        except Exception:
            return False
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the one process that writes checkpoints/metrics."""
    return jax.process_index() == 0


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    arr = mesh_utils.create_device_mesh((jax.device_count(),))
    return Mesh(arr, (axis,))


def host_shard_range(n: int) -> tuple[int, int]:
    """Contiguous [lo, hi) slice of ``range(n)`` this process should load —
    per-host INPUT sharding, so each host reads only its part of the dataset
    (e.g. its subset of volumes/slices) instead of everything."""
    p, k = jax.process_index(), jax.process_count()
    per = n // k
    extra = n % k
    lo = p * per + min(p, extra)
    return lo, lo + per + (1 if p < extra else 0)


def shard_dataset(ds, n_total_devices: int):
    """Per-host input sharding of a deterministic-order SliceDataset: trim to
    a multiple of the GLOBAL device count (so every device gets an equal
    block under a P("data") sharding), then keep only this process's
    contiguous range.  Every host must pass the identical dataset."""
    import dataclasses
    n = (len(ds) // n_total_devices) * n_total_devices
    lo, hi = host_shard_range(n)
    return dataclasses.replace(
        ds, images=ds.images[lo:hi],
        labels=None if ds.labels is None else ds.labels[lo:hi],
        volume_ids=ds.volume_ids[lo:hi], slice_ids=ds.slice_ids[lo:hi])


def global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a global batch-sharded jax.Array pytree from each process's
    LOCAL batch arrays (host-local shard in, global array out).  The local
    leading dim must be global_batch_size / process_count on every host."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a host-identical pytree (params, train state, PRNG keys)
    onto every device of the global mesh as global jax.Arrays."""
    sharding = NamedSharding(mesh, P())

    def rep(a):
        if hasattr(a, "dtype") and jax.dtypes.issubdtype(a.dtype,
                                                         jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(a)))
            return jax.jit(jax.random.wrap_key_data,
                           out_shardings=sharding)(data)
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))

    return jax.tree.map(rep, tree)


def ensure_replicated(tree, mesh: Mesh):
    """Idempotent ``replicate``: pass through trees whose leaves are already
    global (multi-process) arrays — lets a train loop feed either the initial
    host state or a previous step's output."""
    leaves = jax.tree.leaves(tree)
    if leaves and isinstance(leaves[0], jax.Array) \
            and not leaves[0].is_fully_addressable:
        return tree
    return replicate(tree, mesh)


def fetch_replicated(tree):
    """Device->host for replicated global arrays (every process can read its
    addressable shard; values are identical across processes)."""
    return jax.tree.map(
        lambda a: np.asarray(a.addressable_shards[0].data)
        if isinstance(a, jax.Array) and not a.is_fully_addressable
        else np.asarray(a), tree)
