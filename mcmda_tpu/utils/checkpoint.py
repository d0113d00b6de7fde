"""Checkpoint / restore (SURVEY K1).

Replaces ``tf.train.Saver`` with Orbax (async-capable, TPU-sharding-aware)
plus a dependency-free npz fallback.  The critical reference semantic is
preserved at the call sites (train/adapt.py): the phase-1 source checkpoint
restores into BOTH the frozen source path and the target DAM initialization
[P1 SIII; SURVEY K1].
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np

try:  # orbax is in the image; fallback keeps tests hermetic
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

_async_ckptr = None


def _checkpointer():
    """Process-wide async checkpointer: saves overlap the next train steps;
    ``wait_pending()`` (called before restore/prune/exit) is the barrier."""
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        import atexit
        atexit.register(wait_pending)
    return _async_ckptr


def wait_pending() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def _flatten(tree) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}


def save(path: str, tree: Any, step: int | None = None,
         block: bool = False) -> str:
    """Save a pytree (async under Orbax unless ``block``). Returns the
    concrete checkpoint path."""
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    if jax.process_count() > 1:
        # Multi-host: train state is REPLICATED, so process 0 writes a
        # barrier-free npz for everyone.  (Orbax's multihost path inserts
        # cross-process sync collectives on every save — correct for sharded
        # state, pure overhead + a divergence hazard for replicated state if
        # any process skips a save.)
        if jax.process_index() != 0:
            return path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # atomic publish: peers discover checkpoints by filename (poll or
        # latest_step) and must never see a half-written npz
        tmp = path + ".npz.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **_flatten(tree))
        os.replace(tmp, path + ".npz")
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if _HAVE_ORBAX:
        ckptr = _checkpointer()
        # host copy is synchronous (device buffers are safe to donate right
        # after return); the disk write proceeds in the background
        ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(
            jax.tree.map(np.asarray, tree)), force=True)
        if block:
            ckptr.wait_until_finished()
    else:  # pragma: no cover
        np.savez(path + ".npz", **_flatten(tree))
    return path


def restore(path: str, like: Any) -> Any:
    """Restore a pytree with the structure/dtypes of ``like``."""
    wait_pending()
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, like)
        out = ckptr.restore(os.path.abspath(path), target=target)
        return jax.tree.map(jax.numpy.asarray, out)
    flat = np.load(path + ".npz" if not path.endswith(".npz") else path)
    leaves, _ = jax.tree_util.tree_flatten_with_path(like)

    def pick(kp, fallback):
        # forward compat: state fields added after a checkpoint was written
        # (e.g. the r2 weight-average trees) keep their init values
        key = jax.tree_util.keystr(kp)
        if key in flat:
            return jax.numpy.asarray(flat[key])
        import warnings
        warnings.warn(f"checkpoint {path} lacks {key}; keeping init value")
        return jax.numpy.asarray(fallback)

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like),
        [pick(kp, v) for kp, v in leaves])


def prune(ckpt_dir: str, keep: int = 3, protect=(),
          newest: int | None = None) -> None:
    """Delete all but the newest ``keep`` step_XXXXXXXX checkpoints.
    Steps in ``protect`` (e.g. the unsupervised-selection best) survive.

    ``newest``: the step of a save issued just before this call.  An async
    save may not have materialized ANY directory yet when we listdir (the
    AsyncCheckpointer's background thread creates it), so without this hint
    the inventory undercounts and prune keeps one extra old step per miss
    (observed as a racy test failure).  Callers that prune right after a
    save should always pass the step they just saved."""
    import shutil
    if not os.path.isdir(ckpt_dir) or keep <= 0:
        return
    # No barrier needed: AsyncCheckpointer serializes saves (at most one in
    # flight = the NEWEST step), and prune never deletes the newest ``keep``.
    # An in-flight step's ".orbax-checkpoint-tmp" dir COUNTS toward the
    # inventory when present (it will commit) but is never itself deleted.
    steps = sorted({int(m.group(1)) for n in os.listdir(ckpt_dir)
                    if (m := re.match(r"step_(\d+)(\.npz$|$|\.orbax)", n))}
                   | ({newest} if newest is not None else set()))
    for s in steps[:-keep]:
        if s in protect:
            continue
        path = os.path.join(ckpt_dir, f"step_{s:08d}")
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path + ".npz"):
            os.remove(path + ".npz")
        # stale ".orbax-checkpoint-tmp" dirs (a crashed run's in-flight save)
        # count toward the inventory above but are unrestorable; once their
        # step is pruned, delete them too or they pin a keep slot forever.
        # Safe without a barrier: an in-flight save is at most the NEWEST
        # step (AsyncCheckpointer serializes), which is never pruned.
        prefix = f"step_{s:08d}.orbax-checkpoint-tmp"
        for n in os.listdir(ckpt_dir):
            if n.startswith(prefix):
                shutil.rmtree(os.path.join(ckpt_dir, n), ignore_errors=True)


def latest_step(ckpt_dir: str) -> int | None:
    """Find the newest COMMITTED step_XXXXXXXX checkpoint for
    restart-from-latest (in-flight ``.orbax-checkpoint-tmp`` dirs — e.g.
    left by a crashed run — are not restorable and are skipped)."""
    wait_pending()  # commit this process's own in-flight saves first
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for n in os.listdir(ckpt_dir)
             if (m := re.match(r"step_(\d+)(\.npz)?$", n))]
    return max(steps) if steps else None
