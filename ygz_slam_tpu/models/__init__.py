"""Pipeline modules (reference L3): frontend compute steps, local
mapping, and the VisualOdometry state machine."""
from . import frontend, local_mapping, visual_odometry
from .visual_odometry import VisualOdometry, VOOptions, Status

__all__ = [
    "frontend",
    "local_mapping",
    "visual_odometry",
    "VisualOdometry",
    "VOOptions",
    "Status",
]
