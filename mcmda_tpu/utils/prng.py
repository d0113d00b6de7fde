"""PRNG discipline: one root key per run, split by (purpose, step).

JAX's functional PRNG replaces the reference's implicit TF1 op-level seeds;
``step_key`` is fold_in-based so any step's randomness is reproducible
without replaying the stream.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(root: jax.Array, step, purpose: int = 0) -> jax.Array:
    k = jax.random.fold_in(root, purpose)
    return jax.random.fold_in(k, step)
