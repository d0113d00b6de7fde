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


def scanned_step(step_fn: Callable, inner_steps: int) -> Callable:
    """Fuse ``inner_steps`` consecutive train steps into ONE device dispatch
    via lax.scan (state carried; per-inner-step rng folded from the outer
    key).  Requires the batch argument to be loop-invariant — i.e. a
    device-resident dataset (pipeline.to_device_arrays) whose sampling
    happens inside the step.  On remote-attached chips this hides dispatch
    latency entirely (see BASELINE.md methodology notes).

    Returns a step with the same (state, batch, rng) signature reporting the
    LAST inner step's metrics.
    """
    import jax.numpy as jnp

    def fused(state, batch, rng):
        def body(st, k):
            st, m = step_fn(st, batch, jax.random.fold_in(rng, k))
            return st, m
        state, ms = jax.lax.scan(body, state, jnp.arange(inner_steps))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return fused


def run(step_fn: Callable, state, batches: Iterator, num_steps: int, *,
        seed: int = 0, log_every: int = 50, ckpt_every: int = 0,
        ckpt_dir: str | None = None, logger: mlog.MetricsLogger | None = None,
        start_step: int = 0, callback: Callable | None = None,
        keep_checkpoints: int = 3, inner_steps: int = 1,
        protect_steps: Callable | None = None,
        probe_every: int = 0, probe: Callable | None = None):
    """Drive ``step_fn(state, batch, rng)`` for ``num_steps`` TRAIN steps.

    The rng handed to each dispatch derives from (seed, step) so a resumed
    run replays identical augmentation randomness from its restart point.
    Metric logging is deferred one log tick (flushed on every exit path) so
    the dispatch pipeline never waits on a host readback of step metrics.
    ``callback(step, state, metrics)`` fires at every checkpoint interval
    (qualitative snapshot dumps, eval probes, checkpoint selection — the
    reference's periodic T2 side effects); ``metrics`` is that step's metric
    dict (host floats).

    ``inner_steps > 1``: ``step_fn`` must be a ``scanned_step`` advancing
    that many train steps per call; num_steps/start_step/log_every/
    ckpt_every stay in TRAIN-step units (rounded to multiples).

    ``probe(step, state, metrics)`` fires every ``probe_every`` train steps
    — a cadence INDEPENDENT of checkpointing, for cheap periodic device
    probes (e.g. the unsupervised selection signal).  Unlike ``callback``,
    the probe's ``metrics`` are raw DEVICE values so a deferred probe
    (adapt.SelectionProbe) never forces a host sync on the hot path.
    """
    logger = logger or mlog.MetricsLogger(echo=False)
    root = prng.root_key(seed)
    last_metrics = {}
    k = max(1, inner_steps)
    # metric logging is deferred one log tick: host-reading a tick's device
    # metrics immediately would stall the dispatch pipeline on the step just
    # issued, while by the NEXT tick (log_every steps later) they have long
    # materialized.  The pending tick is flushed on every exit path.
    pending_log = None

    def _flush_log():
        nonlocal pending_log, last_metrics
        if pending_log is None:
            return
        s, m = pending_log
        pending_log = None
        last_metrics = {kk: float(v) for kk, v in
                        jax.device_get(m).items()}
        logger.log(s, last_metrics)

    with _PreemptionGuard() as guard:
        for outer in range(start_step // k, num_steps // k):
            step = (outer + 1) * k - 1  # index of the last train step done
            batch = next(batches)
            state, metrics = step_fn(state, batch, prng.step_key(root, outer))
            if log_every and (step % log_every < k or step >= num_steps - k):
                _flush_log()
                pending_log = (step, metrics)
            if probe is not None and probe_every and \
                    (step + 1) % probe_every < k:
                # metrics stay DEVICE values: a probe that host-read them
                # here would stall the dispatch pipeline on the step just
                # issued.  SelectionProbe defers the read by one tick;
                # convert lazily (float()) if you consume them.
                probe(step + 1, state, metrics)
            if ckpt_every and step + 1 < num_steps and \
                    (step + 1) % ckpt_every < k:
                if ckpt_dir:
                    checkpoint.save(os.path.join(ckpt_dir), state,
                                    step=step + 1)
                    checkpoint.prune(ckpt_dir, keep_checkpoints,
                                     protect=(protect_steps()
                                              if protect_steps else ()),
                                     newest=step + 1)
                if callback is not None:
                    cb_metrics = {kk: float(v) for kk, v in
                                  jax.device_get(metrics).items()}
                    callback(step + 1, state, cb_metrics)
            if guard.fired:
                _flush_log()
                if ckpt_dir:
                    checkpoint.save(os.path.join(ckpt_dir), state,
                                    step=step + 1, block=True)
                    print(f"[loop] preemption signal: checkpointed at step "
                          f"{step + 1} and stopped", flush=True)
                return state, last_metrics
    _flush_log()
    if ckpt_dir:
        # the FINAL save must commit before return: an async save racing
        # interpreter shutdown can lose the atexit barrier to Python's own
        # executor teardown and leave an uncommitted .orbax-checkpoint-tmp
        # (observed on the full benchmark run)
        checkpoint.save(os.path.join(ckpt_dir), state, step=num_steps,
                        block=True)
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
