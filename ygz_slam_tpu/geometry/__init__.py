"""Geometry core: SO(3)/SE(3) manifolds, pinhole camera, triangulation,
analytic projection Jacobians.  Replaces the reference's Sophus +
PinholeCamera + cvutils math (SURVEY.md stage 1)."""
from . import so3, se3, sim3, jacobians, triangulation
from .se3 import SE3
from .sim3 import Sim3
from .camera import PinholeCamera

__all__ = [
    "so3",
    "se3",
    "sim3",
    "Sim3",
    "jacobians",
    "triangulation",
    "SE3",
    "PinholeCamera",
]
