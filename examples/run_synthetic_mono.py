#!/usr/bin/env python
"""Monocular VO demo on a rendered synthetic sequence.

The counterpart of the reference's test/test_vo_track.cpp driver, but
with exact ground truth and an ATE report instead of imshow windows.

    python examples/run_synthetic_mono.py [--frames 40] [--out out_dir]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # drop for a real TPU run

import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.system import trajectory as traj
from ygz_slam_tpu.system import viewer
from ygz_slam_tpu.utils.datasets import SyntheticDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default="/tmp/ygz_demo")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
    ds = SyntheticDataset(cam, n_frames=args.frames, shape=(240, 320))
    vo = VisualOdometry(cam, VOOptions(
        init_min_disparity=15.0, kf_min_frames=4,
        kf_max_trans=0.03, kf_max_rot=0.04,
    ))
    est, gt = [], []
    for fd in ds:
        r = vo.add_frame(fd.gray, fd.timestamp)
        print(f"t={fd.timestamp:6.2f}  {r.status.name:8s} "
              f"inliers={r.n_inliers:4d} kfs={len(vo.server.kf_used)}")
        if r.status == Status.GOOD:
            est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
            gt.append(np.asarray(-(fd.T_cw_gt.R.T @ fd.T_cw_gt.t)))
    if len(est) >= 3:
        ate = traj.ate_rmse(np.array(est), np.array(gt), with_scale=True)
        print(f"\nSim3-aligned ATE over {len(est)} frames: {ate*1000:.1f} mm")
    tr = [SE3.from_params7(jnp.asarray(p)) for _, p in vo.trajectory]
    traj.save_tum(os.path.join(args.out, "trajectory_tum.txt"),
                  [t for t, _ in vo.trajectory], tr)
    viewer.plot_trajectory(os.path.join(args.out, "trajectory.png"), tr)
    viewer.plot_map(os.path.join(args.out, "map.png"), vo.server.state, tr)
    print(f"wrote trajectory + figures to {args.out}")


if __name__ == "__main__":
    main()
