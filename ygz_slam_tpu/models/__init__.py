"""Pipeline modules (reference L3): frontend compute steps, local
mapping, and the VisualOdometry state machine."""
from . import (
    frontend, local_mapping, orb_tracking, semidense, visual_odometry,
)
from .visual_odometry import (
    VisualOdometry, VOOptions, Status, VOType, MapType,
)

__all__ = [
    "frontend",
    "local_mapping",
    "orb_tracking",
    "semidense",
    "visual_odometry",
    "VisualOdometry",
    "VOOptions",
    "Status",
    "VOType",
    "MapType",
]
