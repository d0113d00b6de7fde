"""Persistent XLA compilation cache.

Full-size compiles through a remote-attached TPU take O(10 min); the
persistent cache makes every re-run (benchmarks, sweeps, CLI restarts,
resumed training) hit disk instead of recompiling.  Keyed by HLO +
topology + compiler version, so stale entries are never reused.
"""

from __future__ import annotations

import os


def enable(path: str = "~/.cache/mcmda_tpu/xla") -> None:
    """Idempotently point JAX's compilation cache at a durable directory
    (no-op if the user already configured one)."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    p = os.path.expanduser(path)
    try:
        os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        # only persist compiles that actually hurt (skip trivial kernels)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # never let caching break a run
        pass
