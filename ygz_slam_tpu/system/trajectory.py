"""Trajectory save/load (TUM format) and ATE/RPE evaluation.

Implements what the reference only declared: System::SaveTrajectory /
SaveMap / LoadMap (include/ygz/system.h:63-67 — bodies absent in
src/system.cpp).  Trajectories are saved in the TUM RGB-D benchmark
format (`timestamp tx ty tz qx qy qz qw`, camera-to-world), so the
standard evaluation tooling applies; ATE/RPE are also implemented
here directly (Sim3/SE3 Umeyama alignment + RMSE).
"""
from __future__ import annotations

import numpy as np

from ..geometry.se3 import SE3
from ..geometry import so3
import jax.numpy as jnp


def save_tum(path: str, stamps, poses_cw: list) -> None:
    """Write camera trajectory (list of SE3 T_cw or params7) in TUM
    format: camera-to-world, quaternion xyzw order."""
    with open(path, "w") as f:
        for ts, p in zip(stamps, poses_cw):
            if isinstance(p, SE3):
                T_cw = p
            else:
                T_cw = SE3.from_params7(jnp.asarray(p))
            T_wc = T_cw.inverse()
            q = np.asarray(so3.to_quaternion(T_wc.R))  # wxyz
            t = np.asarray(T_wc.t)
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def load_tum(path: str):
    """Read a TUM trajectory -> (stamps [N], T_cw list)."""
    stamps, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts, tx, ty, tz, qx, qy, qz, qw = v[:8]
            R_wc = so3.from_quaternion(jnp.asarray([qw, qx, qy, qz]))
            T_wc = SE3(R_wc, jnp.asarray([tx, ty, tz]))
            stamps.append(ts)
            poses.append(T_wc.inverse())
    return np.asarray(stamps), poses


def umeyama_align(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Least-squares similarity (or rigid) alignment est -> gt.

    Returns (s, R, t) with gt ~ s * R @ est + t.
    """
    est, gt = np.asarray(est, float), np.asarray(gt, float)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    cov = g.T @ e / len(e)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (e ** 2).sum() / len(e)
        s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_centers, gt_centers, with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after Umeyama alignment
    (monocular: with_scale=True)."""
    est = np.asarray(est_centers, float)
    gt = np.asarray(gt_centers, float)
    s, R, t = umeyama_align(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))


def rpe_rmse(est_poses, gt_poses, delta: int = 1):
    """Relative pose error over `delta`-frame intervals.

    est_poses / gt_poses: lists of SE3 (T_cw).  Returns
    (trans_rmse, rot_rmse_rad)."""
    et, er = [], []
    n = min(len(est_poses), len(gt_poses))
    for i in range(n - delta):
        de = est_poses[i + delta].compose(est_poses[i].inverse())
        dg = gt_poses[i + delta].compose(gt_poses[i].inverse())
        err = dg.inverse().compose(de)
        et.append(float(np.linalg.norm(np.asarray(err.t))))
        er.append(float(np.linalg.norm(np.asarray(so3.log(err.R)))))
    return (
        float(np.sqrt(np.mean(np.square(et)))),
        float(np.sqrt(np.mean(np.square(er)))),
    )


def camera_centers(poses_cw) -> np.ndarray:
    """[N, 3] camera centers in world frame from T_cw poses."""
    out = []
    for T in poses_cw:
        if not isinstance(T, SE3):
            T = SE3.from_params7(jnp.asarray(T))
        out.append(np.asarray(-(T.R.T @ T.t)))
    return np.asarray(out)
