"""System layer (reference L4): facade, config, trajectory IO + eval."""
from . import config, trajectory, system
from .system import System, Sensor, VOType, MapType
from .config import Config

__all__ = [
    "config", "trajectory", "system", "System", "Sensor", "Config",
    "VOType", "MapType",
]
