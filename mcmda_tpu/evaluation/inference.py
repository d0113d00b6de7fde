"""E1: per-slice inference -> 3D volume predictions.

The reference looped ``sess.run(softmax)`` per slice (SURVEY section 3.3);
here all slices of a volume run as fixed-shape device batches (padded to a
multiple of the batch size so jit compiles once), optionally sharded over the
mesh's data axis — the TPU answer to "3D volume context" throughput
(SURVEY parallelism table).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mcmda_tpu.data import volumes as vol_io


_scan_cache = {}
_SCAN_CACHE_MAX = 32  # LRU bound: long-lived serving processes must not
# accumulate one compiled executable per (forward, shape) forever


def _scanned_argmax(forward, shape_key, context: int, batch_size: int):
    """jit(stack_context + scan(forward)) over a RAW [S,H,W] volume — ONE
    device dispatch per volume (the per-batch Python loop pays host<->device
    dispatch latency per call, which dominates on remote-attached chips).

    Context stacking happens ON DEVICE (a clamped slice gather — the jnp
    mirror of ``data.volumes.stack_context``), so the host->device transfer
    is the raw volume bytes, not ``context``x that (the stacked tensor
    repeats every slice ``context`` times; at the shipped context=3 this
    cuts e2e upload traffic 3x).  Pad rows repeat the last slice's stack,
    exactly like the host path.

    Cached per (forward object, volume shape, context, batch); keying by the
    object (not id()) avoids stale entries when ids are recycled after GC.
    LRU-bounded (move-to-end on hit).
    """
    key = (forward, shape_key, context, batch_size)
    run = _scan_cache.pop(key, None)  # pop+reinsert = move to MRU end
    if run is None:
        half = context // 2

        def run_fn(vol, *fargs):
            s = vol.shape[0]
            pad = (-s) % batch_size
            base = jnp.concatenate(
                [jnp.arange(s), jnp.full((pad,), s - 1, jnp.int32)])
            idx = jnp.clip(base[:, None]
                           + jnp.arange(-half, half + 1)[None, :], 0, s - 1)
            stacks = jnp.transpose(vol[idx], (0, 2, 3, 1))  # [S+p,H,W,ctx]
            stacks = stacks.reshape((-1, batch_size) + stacks.shape[1:])

            def body(_, xb):
                return None, jnp.argmax(forward(xb, *fargs),
                                        -1).astype(jnp.int32)
            _, preds = jax.lax.scan(body, None, stacks)
            return preds
        run = jax.jit(run_fn)
        while len(_scan_cache) >= _SCAN_CACHE_MAX:
            del _scan_cache[next(iter(_scan_cache))]  # evict LRU (dict order)
    _scan_cache[key] = run
    return run


_shard_cache = {}


def _sharded_forward(forward, mesh, axis: str, n_args: int):
    """shard_map the per-batch forward over the mesh's batch axis, cached per
    (forward, mesh, arg-count) so repeated volume evals reuse one traced fn
    (the mesh analogue of dp.data_parallel_forward, but composed INSIDE the
    single-dispatch scan so a sharded eval still costs one dispatch/volume)."""
    from jax.sharding import PartitionSpec as P
    key = (forward, mesh, axis, n_args)
    f = _shard_cache.get(key)
    if f is None:
        f = jax.shard_map(forward, mesh=mesh,
                          in_specs=(P(axis),) + (P(),) * n_args,
                          out_specs=P(axis), check_vma=False)
        while len(_shard_cache) >= _SCAN_CACHE_MAX:
            del _shard_cache[next(iter(_shard_cache))]
        _shard_cache[key] = f
    return f


_tta_cache = {}


def tta_flip(forward):
    """Test-time augmentation wrapper: average class probabilities over the
    horizontal flip (W axis of [B,H,W,ctx] inputs).

    Flip is the one shipped augmentation whose transform maps the pixel grid
    onto itself exactly (no resampling), and training draws it too
    (``config.data.flip``), so the model sees both chiralities — averaging
    the two softmaxes is the benchmark lineage's standard variance-reduction
    trick at eval.  Costs a second forward per slice, executed as ONE
    double-batch forward (original and flipped concatenated on the batch
    axis): the MXU sees 2B-row matmuls instead of two B-row dispatches, and
    a mesh-sharded forward splits the doubled batch the same way.  Memoized
    per forward object so ``predict_volume``'s scan/compile caches stay warm
    across volumes and checkpoints.
    """
    f = _tta_cache.get(forward)
    if f is None:
        def f(xb, *fargs):
            b = xb.shape[0]
            p2 = forward(jnp.concatenate([xb, xb[:, :, ::-1, :]]), *fargs)
            return 0.5 * (p2[:b] + p2[b:][:, :, ::-1, :])
        while len(_tta_cache) >= _SCAN_CACHE_MAX:
            del _tta_cache[next(iter(_tta_cache))]
        _tta_cache[forward] = f
    return f


def get_tta(name: str | None):
    """Resolve a TTA mode name to a forward wrapper (or None for "none") —
    mirrors ``evaluation.postprocess.get``."""
    if name in (None, "", "none"):
        return None
    if name == "flip":
        return tta_flip
    raise ValueError(f"unknown TTA mode {name!r} (expected none|flip)")


def predict_volume(forward, volume: np.ndarray, *, context: int = 3,
                   batch_size: int = 8, single_dispatch: bool = True,
                   fwd_args: tuple = (), mesh=None,
                   axis: str = "data") -> np.ndarray:
    """Run ``forward(images[B,H,W,ctx], *fwd_args) -> probs[B,H,W,K]`` over
    every slice of [S,H,W] ``volume``; returns the stitched label volume
    [S,H,W] int32.

    With ``single_dispatch`` (default) ``forward`` must be jittable
    (single-device or mesh-sharded) and the whole volume runs as ONE scanned
    device dispatch (E1 hot loop).  ``single_dispatch=False`` loops batches
    on the host for non-traceable forwards (test oracles).

    ``fwd_args`` (e.g. params/BN state) are passed as jit ARGUMENTS, not
    closed over: callers evaluating a stream of checkpoints keep ONE stable
    ``forward`` and compile once, instead of recompiling (and leaking device
    buffers through the cache) per checkpoint.

    ``mesh``: shard each per-batch forward over the mesh's ``axis`` (batch
    sharded, fwd_args replicated) — mesh eval keeps the same
    one-scanned-dispatch-per-volume treatment; ``batch_size`` must divide by
    the mesh size.
    """
    if mesh is not None:
        forward = _sharded_forward(forward, mesh, axis, len(fwd_args))
    s = volume.shape[0]
    if single_dispatch:
        # raw volume upload; context stacking + padding happen on device
        # inside the same dispatch (see _scanned_argmax)
        vol_dev = jnp.asarray(volume)
        run = _scanned_argmax(forward, (volume.shape, str(vol_dev.dtype)),
                              context, batch_size)
        preds = np.asarray(jax.device_get(run(vol_dev, *fwd_args)), np.int32)
        return preds.reshape((-1,) + preds.shape[2:])[:s]
    stacked = vol_io.stack_context(volume, context)  # [S,H,W,ctx]
    pad = (-s) % batch_size
    if pad:
        stacked = np.concatenate([stacked, np.repeat(stacked[-1:], pad, 0)], 0)
    preds = []
    for i in range(0, stacked.shape[0], batch_size):
        probs = forward(jnp.asarray(stacked[i:i + batch_size]), *fwd_args)
        preds.append(np.asarray(jax.device_get(jnp.argmax(probs, -1)),
                                np.int32))
    return np.concatenate(preds, 0)[:s]


def predict_volume_probs(forward, volume: np.ndarray, *, context: int = 3,
                         batch_size: int = 8) -> np.ndarray:
    """Same but returns the full softmax volume [S,H,W,K] (parity checks)."""
    stacked = vol_io.stack_context(volume, context)
    s = stacked.shape[0]
    pad = (-s) % batch_size
    if pad:
        stacked = np.concatenate([stacked, np.repeat(stacked[-1:], pad, 0)], 0)
    out = []
    for i in range(0, stacked.shape[0], batch_size):
        out.append(np.asarray(jax.device_get(
            forward(jnp.asarray(stacked[i:i + batch_size])))))
    return np.concatenate(out, 0)[:s]
