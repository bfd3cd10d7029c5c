#!/usr/bin/env python
"""Run the SLAM system on a TUM RGB-D sequence.

The counterpart of the reference's test/test_vo_init.cpp /
test_tum_vo.cpp drivers:

    python examples/run_tum.py /path/to/rgbd_dataset_freiburg1_xyz \
        [--sensor rgbd|monocular] [--config config/tum1.yaml] [--out out]

Expects the standard TUM layout (rgb/, depth/, rgb.txt, depth.txt,
optionally associate.txt and groundtruth.txt).  Computes ATE against
groundtruth.txt when present.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # drop for a real TPU run

import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3
from ygz_slam_tpu.models import VOOptions, Status
from ygz_slam_tpu.system import System, Sensor
from ygz_slam_tpu.system import trajectory as traj
from ygz_slam_tpu.system import viewer
from ygz_slam_tpu.utils.datasets import TumDataset

# TUM freiburg1 intrinsics (the reference's config/default.yaml values).
FR1 = dict(fx=517.3, fy=516.5, cx=325.1, cy=249.7,
           k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--sensor", default="rgbd",
                    choices=["rgbd", "monocular"])
    ap.add_argument("--vo", default="sparse_direct",
                    choices=["sparse_direct", "sparse_orb",
                             "semi_dense_direct"],
                    help="frontend method (system.vo)")
    ap.add_argument("--map", default="sparse", dest="map_type",
                    choices=["sparse", "semi_dense", "dense"],
                    help="map content (system.map)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="/tmp/ygz_tum")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from ygz_slam_tpu.models import VOType, MapType

    cam = PinholeCamera.create(**FR1)
    sensor = Sensor.RGBD if args.sensor == "rgbd" else Sensor.MONOCULAR
    slam = System(config_file=args.config, camera=cam, sensor=sensor,
                  options=VOOptions(
                      vo_type=VOType[args.vo.upper()],
                      map_type=MapType[args.map_type.upper()],
                  ))
    ds = TumDataset(args.dataset)
    print(f"{len(ds)} frames")
    if sensor == Sensor.MONOCULAR:
        # Chunked streaming ingestion: frames advance in on-device
        # scans, paying the fixed dispatch cost per chunk.
        results = slam.track_monocular_stream(
            (fd.gray, fd.timestamp) for fd in ds
        )
        for i in range(0, len(results), 30):
            r = results[i]
            print(f"[{i}] {r.status.name} inliers={r.n_inliers}")
        r = results[-1]
    else:
        for i, fd in enumerate(ds):
            if fd.depth is not None:
                r = slam.track_rgbd(fd.gray, fd.depth, fd.timestamp)
            else:
                r = slam.track_monocular(fd.gray, fd.timestamp)
            if i % 30 == 0:
                print(f"[{i}] {r.status.name} inliers={r.n_inliers}")
    tpath = os.path.join(args.out, "trajectory_tum.txt")
    slam.save_trajectory(tpath)
    slam.save_map(os.path.join(args.out, "map.npz"))
    if ds.groundtruth is not None:
        stamps, gt_poses = ds.groundtruth
        est_stamps = np.asarray([t for t, _ in slam.vo.trajectory])
        est_centers = traj.camera_centers([p for _, p in slam.vo.trajectory])
        # Associate by nearest timestamp.
        idx = np.argmin(np.abs(stamps[None, :] - est_stamps[:, None]), axis=1)
        gt_centers = traj.camera_centers([gt_poses[i] for i in idx])
        with_scale = sensor == Sensor.MONOCULAR
        ate = traj.ate_rmse(est_centers, gt_centers, with_scale=with_scale)
        print(f"ATE RMSE: {ate*100:.2f} cm "
              f"({'Sim3' if with_scale else 'SE3'} alignment)")
    tr = [SE3.from_params7(jnp.asarray(p)) for _, p in slam.vo.trajectory]
    viewer.plot_trajectory(os.path.join(args.out, "trajectory.png"), tr)
    viewer.plot_map(os.path.join(args.out, "map.png"),
                    slam.vo.server.state, tr)
    viewer.save_ply(os.path.join(args.out, "cloud.ply"),
                    slam.export_point_cloud())
    print(f"outputs in {args.out}")


if __name__ == "__main__":
    main()
