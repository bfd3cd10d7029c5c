"""Dataset loaders: TUM RGB-D sequences and synthetic rendered
sequences.

The reference's tests parse TUM `associate.txt` for rgb/depth pairs
(test/test_vo_init.cpp:26-39, test/test_feature_extraction.cpp:25-38);
`TumDataset` reproduces that contract.  When no dataset is on disk
(this build environment has zero egress), `SyntheticDataset` provides
the same iterator interface over PlaneScene renders with exact ground
truth.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..geometry.se3 import SE3
from ..geometry import se3 as se3m
from .synthetic import PlaneScene
import jax.numpy as jnp


@dataclass
class FrameData:
    timestamp: float
    gray: np.ndarray            # [H, W] float32
    depth: np.ndarray | None    # [H, W] float32 meters, or None
    T_cw_gt: SE3 | None         # ground truth if known


class TumDataset:
    """TUM RGB-D sequence: reads associate.txt (rgb<->depth pairing,
    the file the reference's tests consume) or, failing that, pairs
    rgb.txt/depth.txt by nearest timestamp."""

    DEPTH_SCALE = 5000.0  # TUM depth png convention

    def __init__(self, root: str):
        self.root = root
        assoc = os.path.join(root, "associate.txt")
        self.pairs: list[tuple[float, str, str | None]] = []
        if os.path.exists(assoc):
            with open(assoc) as f:
                for line in f:
                    p = line.split()
                    if len(p) >= 4:
                        self.pairs.append((float(p[0]), p[1], p[3]))
        else:
            rgb = self._read_list(os.path.join(root, "rgb.txt"))
            dep = self._read_list(os.path.join(root, "depth.txt"))
            dts = np.asarray([t for t, _ in dep]) if dep else None
            for t, path in rgb:
                dpath = None
                if dep:
                    i = int(np.argmin(np.abs(dts - t)))
                    if abs(dts[i] - t) < 0.02:
                        dpath = dep[i][1]
                self.pairs.append((t, path, dpath))
        self.groundtruth = self._read_groundtruth()

    @staticmethod
    def _read_list(path):
        out = []
        if not os.path.exists(path):
            return out
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                out.append((float(p[0]), p[1]))
        return out

    def _read_groundtruth(self):
        path = os.path.join(self.root, "groundtruth.txt")
        if not os.path.exists(path):
            return None
        from ..system.trajectory import load_tum

        return load_tum(path)

    def __len__(self):
        return len(self.pairs)

    def __iter__(self):
        import cv2

        for ts, rgb_rel, depth_rel in self.pairs:
            img = cv2.imread(os.path.join(self.root, rgb_rel),
                             cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            depth = None
            if depth_rel:
                d = cv2.imread(os.path.join(self.root, depth_rel),
                               cv2.IMREAD_UNCHANGED)
                if d is not None:
                    depth = d.astype(np.float32) / self.DEPTH_SCALE
                    depth[depth <= 0] = -1.0
            yield FrameData(ts, img.astype(np.float32), depth, None)


class SyntheticDataset:
    """Rendered textured-plane sequence with exact ground truth; same
    iteration contract as TumDataset."""

    def __init__(self, cam, n_frames: int = 60, shape=(480, 640),
                 seed: int = 0, motion_scale: float = 1.0,
                 with_depth: bool = False, plane_z: float = 3.0):
        self.scene = PlaneScene(cam, plane_z=plane_z, seed=seed,
                                tex_per_meter=220.0)
        self.cam = cam
        self.shape = shape
        self.with_depth = with_depth
        self.poses = []
        for k in range(n_frames):
            t = k / max(n_frames - 1, 1)
            xi = jnp.asarray(
                [1.0 * t * motion_scale, 0.2 * np.sin(2 * t) * motion_scale,
                 0.25 * t * motion_scale, 0.03 * np.sin(3 * t),
                 -0.15 * t * motion_scale, 0.03 * t],
                jnp.float32,
            )
            self.poses.append(se3m.exp(xi))

    def __len__(self):
        return len(self.poses)

    def __iter__(self):
        H, W = self.shape
        for k, T in enumerate(self.poses):
            img = np.asarray(self.scene.render(T, self.shape))
            depth = None
            if self.with_depth:
                u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                                   np.arange(H, dtype=np.float32))
                px = jnp.asarray(np.stack([u, v], axis=-1))
                depth = np.asarray(self.scene.depth(px, T))
            yield FrameData(float(k) / 30.0, img, depth, T)
