"""Distribution layer: device meshes and mesh-sharded BA (net-new
TPU-native design; the reference is single-process, SURVEY.md §2.4)."""
from . import mesh, sharded_ba
from .mesh import make_mesh, LANDMARK_AXIS
from .sharded_ba import sharded_local_ba, partition_observations

__all__ = [
    "mesh",
    "sharded_ba",
    "make_mesh",
    "LANDMARK_AXIS",
    "sharded_local_ba",
    "partition_observations",
]
