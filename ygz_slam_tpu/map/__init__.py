"""Map layer: fixed-capacity tensor MapState + host-side MapServer
(slot allocation), replacing the reference's Memory/Frame/MapPoint
pointer web."""
from . import state, memory
from .state import MapState, empty_map
from .memory import MapServer

__all__ = ["state", "memory", "MapState", "empty_map", "MapServer"]
