"""Test harness: simulate an 8-device TPU mesh on CPU (SURVEY section 4 —
JAX's fake-backend mechanism) BEFORE jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS=axon (TPU tunnel) in a way that wins
# over os.environ mutation; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from mcmda_tpu import config as cfg_mod  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config() -> cfg_mod.ExperimentConfig:
    """Small-but-real config: 32x32 slices, thin stages, same topology."""
    stages = (
        cfg_mod.StageSpec("stem", 8, 1, 1, 1),
        cfg_mod.StageSpec("rm1", 8, 2, 1, 1),
        cfg_mod.StageSpec("rm2", 16, 2, 1, 1),
        cfg_mod.StageSpec("rm3", 16, 2, 1, 1),
        cfg_mod.StageSpec("rm4", 24, 1, 2, 1),
        cfg_mod.StageSpec("rm5", 24, 1, 2, 1),
    )
    return cfg_mod.ExperimentConfig(
        segmenter=cfg_mod.SegmenterConfig(stages=stages),
        critic=cfg_mod.CriticConfig(taps=("rm4", "rm5"), compress_features=8,
                                    widths=(8, 16), strides=(2, 1)),
        data=cfg_mod.DataConfig(slice_size=32, batch_size=4, shift_pixels=2.0),
        source=cfg_mod.SourceTrainConfig(lr=1e-3, steps=20),
        adapt=cfg_mod.AdaptConfig(plug_depth="rm2", steps=10,
                                  lr_d=1e-3, lr_g=1e-3),
    )


@pytest.fixture(scope="session")
def eight_devices():
    assert jax.device_count() >= 8, "conftest failed to fake 8 CPU devices"
    return jax.devices()[:8]
