"""Data-parallel step wrapper: shard_map over the ICI mesh.

Batches shard along the "data" axis; state is replicated; gradients and BN
batch statistics are pmean'd INSIDE the wrapped step (the step fn receives
``axis_name``), so XLA lowers one fused all-reduce per step onto ICI.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P


def data_parallel_step(step_fn, mesh: Mesh, axis: str = "data",
                       donate: bool = True):
    """Wrap step(state, batch, rng) built with axis_name=axis.

    Per-shard augmentation randomness: the replicated rng is folded with the
    shard's axis index so each replica augments its slice differently.
    """
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(axis), P()),
             out_specs=(P(), P()), check_vma=False)
    def sharded(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        new_state, metrics = step_fn(state, batch, rng)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        return new_state, metrics

    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def data_parallel_forward(fwd_fn, fwd_mesh: Mesh, axis: str = "data"):
    """Shard a pure forward (params..., image) over the batch axis for
    high-throughput eval (SURVEY: shard a volume's slice axis across devices).

    The shard_map'd + jitted callable is built ONCE per argument count and
    reused across calls, so repeated volume evals over a mesh pay zero
    re-tracing (serving path; jit itself caches per concrete shape).
    """
    compiled: dict[int, callable] = {}

    def wrapped(*args):
        f = compiled.get(len(args))
        if f is None:
            in_specs = tuple([P()] * (len(args) - 1) + [P(axis)])
            f = jax.jit(jax.shard_map(fwd_fn, mesh=fwd_mesh,
                                      in_specs=in_specs, out_specs=P(axis),
                                      check_vma=False))
            compiled[len(args)] = f
        return f(*args)

    return wrapped
