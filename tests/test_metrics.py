"""Metric parity tests: device Dice vs numpy, surface distances vs
brute-force reference (the medpy-parity requirement, SURVEY section 4)."""

import jax.numpy as jnp
import numpy as np

from mcmda_tpu.evaluation import metrics3d
from mcmda_tpu.ops import metrics as dev_metrics


def test_device_dice_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 5, (4, 16, 16))
    true = rng.integers(0, 5, (4, 16, 16))
    d = np.asarray(dev_metrics.dice_per_class(jnp.asarray(pred),
                                              jnp.asarray(true), 5))
    for c in range(5):
        expect = metrics3d.dice(pred == c, true == c)
        np.testing.assert_allclose(d[c], expect, atol=1e-6)


def test_dice_perfect_and_disjoint():
    a = np.zeros((4, 4, 4), bool)
    a[1:3] = True
    assert metrics3d.dice(a, a) == 1.0
    assert metrics3d.dice(a, ~a) == 0.0


def test_surface_distance_known_geometry():
    """Two unit cubes offset by 3 voxels along x: every surface distance
    between facing faces is known."""
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2, 5, 5] = True
    b[6, 5, 5] = True
    # single-voxel objects: surface == object; distance = 4
    assert metrics3d.asd(a, b) == 4.0
    assert metrics3d.assd(a, b) == 4.0


def test_assd_brute_force_parity():
    rng = np.random.default_rng(1)
    a = np.zeros((12, 12, 12), bool)
    b = np.zeros((12, 12, 12), bool)
    a[3:7, 3:7, 3:7] = True
    b[5:10, 4:8, 2:6] = True

    def brute_directed(x, y):
        sx = np.argwhere(metrics3d._surface(x))
        sy = np.argwhere(metrics3d._surface(y))
        d = np.sqrt(((sx[:, None, :] - sy[None, :, :]) ** 2).sum(-1))
        return d.min(1)

    expect = np.concatenate([brute_directed(a, b), brute_directed(b, a)]).mean()
    np.testing.assert_allclose(metrics3d.assd(a, b), expect, atol=1e-6)
    del rng


def test_spacing_honored():
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool)
    a[2, 4, 4] = True
    b[4, 4, 4] = True
    assert metrics3d.asd(a, b, spacing=(2.0, 1.0, 1.0)) == 4.0


def test_per_structure_table():
    pred = np.zeros((4, 8, 8), np.int32)
    true = np.zeros((4, 8, 8), np.int32)
    pred[1, 2:5, 2:5] = 1
    true[1, 2:5, 2:5] = 1
    true[2, 1:3, 1:3] = 2
    out = metrics3d.per_structure(pred, true, {1: "AA", 2: "LAC"})
    assert out["AA"]["dice"] == 1.0
    assert out["LAC"]["dice"] == 0.0
