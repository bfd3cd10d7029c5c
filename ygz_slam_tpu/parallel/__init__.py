"""Distribution layer: device meshes and mesh-sharded BA (net-new
TPU-native design; the reference is single-process, SURVEY.md §2.4)."""
from . import batch_tracking, mesh, sharded_ba
from .mesh import make_mesh, make_mesh_2d, LANDMARK_AXIS, HOST_AXIS
from .sharded_ba import sharded_local_ba, partition_observations
from .batch_tracking import (
    batched_sparse_align, batched_align2d, batched_track_step,
    sharded_batch_align,
)

__all__ = [
    "batch_tracking",
    "mesh",
    "sharded_ba",
    "make_mesh",
    "make_mesh_2d",
    "LANDMARK_AXIS",
    "HOST_AXIS",
    "sharded_local_ba",
    "partition_observations",
    "batched_sparse_align",
    "batched_align2d",
    "batched_track_step",
    "sharded_batch_align",
]
