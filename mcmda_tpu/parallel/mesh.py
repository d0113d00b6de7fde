"""Device mesh construction + sharding helpers."""

from __future__ import annotations

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_WARNED: set = set()


def _warn_once(msg: str) -> None:
    """stderr warning, deduped per process (mesh construction is cheap and
    callers legitimately repeat it — the fallback warning should not)."""
    import sys
    if msg not in _WARNED:
        _WARNED.add(msg)
        print(msg, file=sys.stderr)


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over ``num_devices`` devices (all by default).

    If the default platform has too few devices, falls back to the virtual
    CPU platform (the test/dryrun mesh, 8 devices under
    ``--xla_force_host_platform_device_count=8``) rather than failing with a
    confusing slice; raises a clear error if no platform has enough.
    """
    devs = jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= num_devices:
                _warn_once(
                    f"WARNING: make_mesh({num_devices}): default platform "
                    f"{devs[0].platform!r} has only {len(devs)} device(s); "
                    f"falling back to the VIRTUAL CPU platform ({len(cpus)} "
                    "devices). Fine for tests/dryruns — on real hardware "
                    "this means you are NOT training on the accelerator; "
                    "check --dp against the chip count.")
                devs = cpus
            else:
                raise ValueError(
                    f"make_mesh({num_devices}): default platform "
                    f"{devs[0].platform!r} has {len(devs)} device(s) and the "
                    f"CPU platform has {len(cpus)}; set "
                    "--xla_force_host_platform_device_count (or "
                    "jax_num_cpu_devices) for a virtual mesh")
        devs = devs[:num_devices]
    arr = mesh_utils.create_device_mesh((len(devs),), devices=devs)
    return Mesh(arr, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
