"""Device-mesh utilities.

The reference is a single-process CPU system (SURVEY.md §2.4: no
NCCL/MPI/anything — its only parallelism is two init threads and
SIMD).  The TPU-native framework's scale-out story instead follows
BASELINE.json's north star: shard landmark/observation blocks over a
`jax.sharding.Mesh`, reduce camera-block Hessians with psum over ICI,
and keep host orchestration in Python.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


LANDMARK_AXIS = "lm"


def make_mesh(n_devices: int | None = None, axis: str = LANDMARK_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are visible (set XLA_FLAGS="
                f"--xla_force_host_platform_device_count=N for CPU "
                f"emulation)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_spec(mesh: Mesh, *axes: str | None) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
