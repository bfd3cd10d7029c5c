"""Offline trajectory / map visualization.

Replaces the reference's Pangolin viewer (src/viewer.cpp,
include/ygz/viewer.h:14-55: keyframe frusta + current pose trail)
with headless matplotlib rendering — a TPU training/serving host has
no GL display, so the viewer writes figures instead of opening
windows.  Also covers the `imshow` debug plots the reference gates in
code (PlotTrackRefFrameResults, VisualOdometry.cpp:335-356;
PlotLocalKeyFrames, LocalMapping.cpp:620-648).
"""
from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from ..geometry.se3 import SE3
import jax.numpy as jnp


def save_ply(path: str, points: np.ndarray) -> None:
    """Write an [N, 3] world point cloud as ASCII PLY (the portable
    artifact for the SEMI_DENSE / DENSE map types; any mesh viewer
    opens it — the reference's Pangolin window equivalent offline)."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    pts = pts[np.isfinite(pts).all(axis=1)]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def _centers(poses_cw) -> np.ndarray:
    out = []
    for T in poses_cw:
        if not isinstance(T, SE3):
            T = SE3.from_params7(jnp.asarray(T))
        out.append(np.asarray(-(T.R.T @ T.t)))
    return np.asarray(out)


def plot_trajectory(
    path: str,
    est_poses_cw,
    gt_poses_cw=None,
    title: str = "trajectory",
):
    """Top-down + 3D trajectory figure -> `path` (png)."""
    est = _centers(est_poses_cw)
    fig = plt.figure(figsize=(10, 5))
    ax1 = fig.add_subplot(121)
    ax1.plot(est[:, 0], est[:, 2], "-", lw=1.5, label="estimate")
    if gt_poses_cw is not None:
        gt = _centers(gt_poses_cw)
        ax1.plot(gt[:, 0], gt[:, 2], "--", lw=1.0, label="ground truth")
    ax1.set_xlabel("x")
    ax1.set_ylabel("z")
    ax1.axis("equal")
    ax1.legend()
    ax1.set_title(title)
    ax2 = fig.add_subplot(122, projection="3d")
    ax2.plot(est[:, 0], est[:, 1], est[:, 2], lw=1.0)
    if gt_poses_cw is not None:
        ax2.plot(gt[:, 0], gt[:, 1], gt[:, 2], "--", lw=0.8)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_map(path: str, map_state, trajectory=None, title: str = "map"):
    """Keyframe frusta + landmarks figure (the Pangolin view, offline)."""
    m = map_state
    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=2, alpha=0.5,
                   label=f"{len(pts)} landmarks")
    kf_valid = np.asarray(m.kf_valid)
    for k in np.where(kf_valid)[0]:
        T = m.kf_pose(int(k))
        c = np.asarray(-(T.R.T @ T.t))
        R_wc = np.asarray(T.R).T
        # Small frustum: 4 image-corner rays.
        scale = 0.1
        corners = np.array(
            [[-1, -0.75, 1], [1, -0.75, 1], [1, 0.75, 1], [-1, 0.75, 1]]
        ) * scale
        pts_w = (R_wc @ corners.T).T + c
        for p in pts_w:
            ax.plot(*zip(c, p), "r-", lw=0.5)
        loop = np.vstack([pts_w, pts_w[:1]])
        ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], "r-", lw=0.5)
    if trajectory is not None:
        tr = _centers(trajectory)
        ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], "g-", lw=1.0,
                label="trajectory")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_tracked_points(path: str, img, px_prev, px_cur, mask,
                        title: str = "tracked"):
    """Tracked-feature overlay (Tracker::PlotTrackedPoints,
    Tracker.cpp:129-149) written to disk."""
    img = np.asarray(img)
    p0 = np.asarray(px_prev)[np.asarray(mask)]
    p1 = np.asarray(px_cur)[np.asarray(mask)]
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="gray")
    for a, b in zip(p0, p1):
        ax.plot([a[0], b[0]], [a[1], b[1]], "g-", lw=0.6)
    ax.plot(p1[:, 0], p1[:, 1], "r.", ms=2)
    ax.set_title(f"{title} ({len(p1)} tracks)")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
