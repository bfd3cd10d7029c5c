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
import jax
import jax.numpy as jnp


def _imread_gray(path: str) -> np.ndarray | None:
    """Grayscale image as float32 [H, W]: OpenCV when present, PIL
    otherwise (this build image ships PIL but not cv2)."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return None if img is None else img.astype(np.float32)
    except ImportError:
        pass
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("L"), np.float32)
    except Exception:
        return None


def _imread_raw(path: str) -> np.ndarray | None:
    """Raw (e.g. 16-bit depth PNG) image, unconverted."""
    try:
        import cv2

        return cv2.imread(path, cv2.IMREAD_UNCHANGED)
    except ImportError:
        pass
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im)
    except Exception:
        return None


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
        for ts, rgb_rel, depth_rel in self.pairs:
            img = _imread_gray(os.path.join(self.root, rgb_rel))
            if img is None:
                continue
            depth = None
            if depth_rel:
                d = _imread_raw(os.path.join(self.root, depth_rel))
                if d is not None:
                    depth = d.astype(np.float32) / self.DEPTH_SCALE
                    depth[depth <= 0] = -1.0
            yield FrameData(ts, img, depth, None)


class EurocDataset:
    """EuRoC MAV sequence in ASL format (BASELINE.json config 4 —
    EuRoC MH_01): grayscale `mav0/<cam>/data.csv` (timestamp_ns,
    filename) with optional `state_groundtruth_estimate0/data.csv`
    (p_WB, q_WB wxyz) ground truth.  Yields the same FrameData
    contract as TumDataset."""

    def __init__(self, root: str, cam: str = "cam0"):
        base = os.path.join(root, "mav0")
        if not os.path.isdir(base):
            base = root                      # already points at mav0
        self.img_dir = os.path.join(base, cam, "data")
        self.items: list[tuple[float, str]] = []
        with open(os.path.join(base, cam, "data.csv")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split(",")
                self.items.append((int(p[0]) * 1e-9, p[1].strip()))
        self.groundtruth = self._read_gt(os.path.join(
            base, "state_groundtruth_estimate0", "data.csv"))

    @staticmethod
    def _read_gt(path):
        """(stamps, T_cw list) like trajectory.load_tum — EuRoC stores
        T_WB (body in world); inverted here to the camera-from-world
        convention the System uses (body≈cam0 up to the fixed
        extrinsic, which cancels in ATE evaluation)."""
        if not os.path.exists(path):
            return None
        from ..geometry import so3

        # Parse the whole CSV into numpy first, then do ONE batched
        # quaternion->rotation + inverse over all rows: real EuRoC
        # ground-truth files run to ~100k rows at 200 Hz, and building
        # per-row jnp arrays would issue that many tiny device ops
        # (over a TPU tunnel when the CPU override is absent).
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.split(",")[:8]])
        if not rows:
            return None
        v = np.asarray(rows, np.float64)
        stamps = list(v[:, 0] * 1e-9)
        t_wb = jnp.asarray(v[:, 1:4], jnp.float32)          # [N, 3]
        q_wxyz = jnp.asarray(v[:, 4:8], jnp.float32)        # [N, 4]
        R_wb = so3.from_quaternion(q_wxyz)                  # [N, 3, 3]
        T_cw = SE3(R_wb, t_wb).inverse()
        n = len(stamps)
        poses = [jax.tree.map(lambda a: a[i], T_cw) for i in range(n)]
        return stamps, poses

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        for ts, name in self.items:
            img = _imread_gray(os.path.join(self.img_dir, name))
            if img is None:
                continue
            yield FrameData(ts, img, None, None)


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
