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


def predict_volume(forward, volume: np.ndarray, *, context: int = 3,
                   batch_size: int = 8) -> np.ndarray:
    """Run ``forward(images[B,H,W,ctx]) -> probs[B,H,W,K]`` over every slice
    of [S,H,W] ``volume``; returns the stitched label volume [S,H,W] int32.

    ``forward`` is any jitted callable (single-device or mesh-sharded); shapes
    are padded to full batches so one compilation serves all volumes.
    """
    stacked = vol_io.stack_context(volume, context)  # [S,H,W,ctx]
    s = stacked.shape[0]
    pad = (-s) % batch_size
    if pad:
        stacked = np.concatenate([stacked, np.repeat(stacked[-1:], pad, 0)], 0)
    preds = []
    for i in range(0, stacked.shape[0], batch_size):
        probs = forward(jnp.asarray(stacked[i:i + batch_size]))
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
