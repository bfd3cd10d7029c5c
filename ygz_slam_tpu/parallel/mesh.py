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
HOST_AXIS = "host"   # DCN (cross-host) mesh axis for 2-D meshes


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


def make_mesh_2d(n_hosts: int, chips_per_host: int) -> Mesh:
    """2-D (host, chip) mesh: the DCN story for multi-host pods.

    Landmark blocks shard over BOTH axes flattened (host-major), so
    per-landmark work never crosses a boundary; the one collective per
    BA iteration — the psum of the O(K^2) reduced camera system — is
    taken over ("host", "lm") as a tuple, which XLA lowers
    hierarchically: reduce over ICI within each host first, then the
    (K*6)^2-sized partial over DCN.  Cross-host traffic per iteration
    is therefore ~(6K)^2 * 4 bytes * (n_hosts-1)/n_hosts — for the
    10-keyframe window that is ~14 KB, far below DCN bandwidth at any
    realistic iteration rate, which is why the >= 0.7 two-host scaling
    target is structurally safe.

    Device order: jax.devices() is host-major on multi-host
    deployments, so reshape(n_hosts, chips_per_host) aligns the host
    axis with physical hosts.
    """
    devs = jax.devices()
    need = n_hosts * chips_per_host
    if len(devs) < need:
        raise ValueError(
            f"requested a {n_hosts}x{chips_per_host} mesh but only "
            f"{len(devs)} devices are visible"
        )
    arr = np.asarray(devs[:need]).reshape(n_hosts, chips_per_host)
    return Mesh(arr, (HOST_AXIS, LANDMARK_AXIS))


def landmark_axes(mesh: Mesh):
    """The axis name (1-D mesh) or tuple of names (2-D mesh) that the
    landmark dimension shards over — valid for PartitionSpec entries
    and for lax.psum axis_name."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def shard_spec(mesh: Mesh, *axes: str | None) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
