"""YAML configuration.

Replaces the reference's `Config` singleton over cv::FileStorage
(src/Basic/Config.cpp, include/ygz/Basic/Config.h:14-40) with plain
PyYAML + dotted-key access, keeping the two-tier design documented in
Basic/Config.h:7-10: file-configurable parameters here, compiled-in
per-class option dataclasses (e.g. VOOptions) overridden from these
keys via `apply_to`.

Supported key set mirrors config/default.yaml: system toggles, camera
intrinsics, pyramid/tracker/init/feature/matcher/keyframe/
localmapping parameters.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import yaml


class Config:
    """Process-wide key-value config: Config.set_parameter_file(path)
    then Config.get("camera.fx", default)."""

    _data: dict = {}

    @classmethod
    def set_parameter_file(cls, path: str) -> None:
        with open(path) as f:
            cls._data = yaml.safe_load(f) or {}

    @classmethod
    def set_dict(cls, d: dict) -> None:
        cls._data = dict(d)

    @classmethod
    def get(cls, key: str, default: Any = None) -> Any:
        """Dotted access: both nested mappings and flat 'a.b' keys."""
        if key in cls._data:
            return cls._data[key]
        node = cls._data
        for part in key.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return default
        return node

    @classmethod
    def clear(cls) -> None:
        cls._data = {}


def camera_from_config(default=None):
    """Build a PinholeCamera from camera.* keys (Camera.h:13-26)."""
    from ..geometry.camera import PinholeCamera

    g = Config.get
    if g("camera.fx") is None:
        return default
    return PinholeCamera.create(
        g("camera.fx"), g("camera.fy"), g("camera.cx"), g("camera.cy"),
        g("camera.k1", 0.0), g("camera.k2", 0.0),
        g("camera.p1", 0.0), g("camera.p2", 0.0),
    )


def apply_to(options, mapping: dict[str, str]):
    """Overwrite dataclass fields from config keys (the reference's
    per-class LoadParams pattern, e.g. FeatureDetector.cpp:331-340).

    mapping: field name -> config key.  Returns a new options object.
    """
    updates = {}
    for field, key in mapping.items():
        v = Config.get(key)
        if v is not None:
            cur = getattr(options, field)
            updates[field] = type(cur)(v) if cur is not None else v
    return dataclasses.replace(options, **updates)


# Default field<->key mapping for VOOptions (config/default.yaml names).
VO_CONFIG_KEYS = {
    "n_levels": "frame.pyramid",
    "detect_threshold": "feature.detection_threshold",
    "grid_cell": "feature.grid_size",
    "init_min_features": "init.min_features",
    "init_min_disparity": "init.min_disparity",
    "init_min_inliers": "init.min_inliers",
    "min_track_inliers": "localmapping.min_track_localmap_inliers",
    "kf_min_frames": "keyframe.min_frames",
    "kf_max_rot": "keyframe.max_rot",
    "kf_max_trans": "keyframe.max_trans",
    "map_K": "localmapping.num_local_keyframes",
    "map_L": "localmapping.num_local_map_points",
}
