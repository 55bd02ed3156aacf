"""Device mesh helpers (SURVEY §2.9, §5.8).

The evaluation domain is the unit of sharding (the workload's "sequence"
axis, SURVEY §5.7): a 1-D mesh axis ``"shard"`` carries contiguous blocks
of the domain.  On real hardware the mesh is built over TPU devices and
collectives ride ICI; tests build it over virtual CPU devices
(xla_force_host_platform_device_count).  Multi-host runs call
``jax.distributed.initialize()`` first (see stark_tpu.dist.multihost).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None, backend=None) -> Mesh:
    """A 1-D mesh over the first `n_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def shard_spec() -> P:
    return P(SHARD_AXIS)


def sharded(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding placing axis 0 on the shard axis (extra axes
    replicated)."""
    return NamedSharding(mesh, P(SHARD_AXIS, *axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
