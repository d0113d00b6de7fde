"""Generic training-loop driver: step dispatch, metric logging (O1),
periodic checkpointing + restart-from-latest (K1), double-buffered feeds."""

from __future__ import annotations

import os
import signal
from typing import Callable, Iterator

import jax

from mcmda_tpu.utils import checkpoint, logging as mlog, prng


class _PreemptionGuard:
    """SIGTERM/SIGINT-aware flag so a preempted TPU-VM run checkpoints before
    dying (SURVEY section 5: failure detection / elastic recovery)."""

    def __init__(self):
        self.fired = False
        self._prev = {}

    def __enter__(self):
        def handler(signum, frame):
            self.fired = True
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, handler)
            except ValueError:  # non-main thread (tests)
                pass
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False


def run(step_fn: Callable, state, batches: Iterator, num_steps: int, *,
        seed: int = 0, log_every: int = 50, ckpt_every: int = 0,
        ckpt_dir: str | None = None, logger: mlog.MetricsLogger | None = None,
        start_step: int = 0, callback: Callable | None = None,
        keep_checkpoints: int = 3):
    """Drive ``step_fn(state, batch, rng)`` for ``num_steps``.

    The rng handed to each step derives from (seed, step) so a resumed run
    replays identical augmentation randomness from its restart point.
    ``callback(step, state)`` fires at every checkpoint interval (qualitative
    snapshot dumps, eval probes — the reference's periodic T2 side effects).
    """
    logger = logger or mlog.MetricsLogger(echo=False)
    root = prng.root_key(seed)
    last_metrics = {}
    with _PreemptionGuard() as guard:
        for step in range(start_step, num_steps):
            batch = next(batches)
            state, metrics = step_fn(state, batch, prng.step_key(root, step))
            if log_every and (step % log_every == 0 or step == num_steps - 1):
                last_metrics = {k: float(v) for k, v in
                                jax.device_get(metrics).items()}
                logger.log(step, last_metrics)
            if ckpt_every and step > 0 and step % ckpt_every == 0:
                if ckpt_dir:
                    checkpoint.save(os.path.join(ckpt_dir), state, step=step)
                    checkpoint.prune(ckpt_dir, keep_checkpoints)
                if callback is not None:
                    callback(step, state)
            if guard.fired:
                if ckpt_dir:
                    checkpoint.save(os.path.join(ckpt_dir), state,
                                    step=step + 1)
                    print(f"[loop] preemption signal: checkpointed at step "
                          f"{step + 1} and stopped", flush=True)
                return state, last_metrics
    if ckpt_dir:
        checkpoint.save(os.path.join(ckpt_dir), state, step=num_steps)
    return state, last_metrics


def maybe_resume(ckpt_dir: str | None, state):
    """Restart-from-latest (failure recovery; SURVEY section 5)."""
    if not ckpt_dir:
        return state, 0
    step = checkpoint.latest_step(ckpt_dir)
    if step is None:
        return state, 0
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    return checkpoint.restore(path, state), step
