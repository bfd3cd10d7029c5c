"""End-to-end coverage of the TUM dataset path: a tiny TUM-format
directory generated from PlaneScene renders drives examples/run_tum.py
(TumDataset parsing, rgb/depth association, the System loop, trajectory
save, ATE report) — so first contact with a real dataset is not in
production.  Mirrors the reference's test family
(test/test_vo_init.cpp:26-39 parses the same layout).
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.utils.synthetic import PlaneScene
from ygz_slam_tpu.utils.datasets import TumDataset
from ygz_slam_tpu.system import trajectory as traj

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def write_tum_fixture(root, n=24, with_assoc=True):
    """Render a PlaneScene trajectory into the standard TUM layout:
    rgb/*.png (8-bit), depth/*.png (16-bit, 1/5000 m), rgb.txt,
    depth.txt, associate.txt, groundtruth.txt."""
    from PIL import Image

    scene = PlaneScene(CAM, plane_z=3.0, seed=4)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    poses, stamps = [], []
    for k in range(n):
        t = k / max(n - 1, 1)
        xi = jnp.asarray(
            [0.9 * t, 0.15 * np.sin(2 * t), 0.25 * t,
             0.02 * np.sin(3 * t), -0.12 * t, 0.02 * t],
            jnp.float32,
        )
        poses.append(se3.exp(xi))
        stamps.append(1305031102.0 + k / 30.0)
    rgb_lines, depth_lines, assoc_lines = [], [], []
    H, W = SHAPE
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    px_grid = jnp.asarray(np.stack([u, v], axis=-1))
    for k, (ts, T) in enumerate(zip(stamps, poses)):
        img = np.asarray(scene.render(T, SHAPE))
        rgb_rel = f"rgb/{ts:.6f}.png"
        Image.fromarray(img.astype(np.uint8), mode="L").save(
            os.path.join(root, rgb_rel)
        )
        z = np.asarray(scene.depth(px_grid, T))
        d16 = np.clip(z * TumDataset.DEPTH_SCALE, 0, 65535).astype(
            np.uint16
        )
        dep_rel = f"depth/{ts:.6f}.png"
        Image.fromarray(d16).save(
            os.path.join(root, dep_rel)
        )
        rgb_lines.append(f"{ts:.6f} {rgb_rel}")
        depth_lines.append(f"{ts:.6f} {dep_rel}")
        assoc_lines.append(f"{ts:.6f} {rgb_rel} {ts:.6f} {dep_rel}")
    hdr = "# ts data\n"
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write(hdr + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write(hdr + "\n".join(depth_lines) + "\n")
    if with_assoc:
        with open(os.path.join(root, "associate.txt"), "w") as f:
            f.write("\n".join(assoc_lines) + "\n")
    traj.save_tum(os.path.join(root, "groundtruth.txt"), stamps, poses)
    return stamps, poses


class TestTumDataset:
    def test_parse_and_associate(self, tmp_path):
        root = str(tmp_path / "seq")
        stamps, poses = write_tum_fixture(root, n=6)
        ds = TumDataset(root)
        assert len(ds) == 6
        frames = list(ds)
        assert len(frames) == 6
        f0 = frames[0]
        assert f0.gray.shape == SHAPE
        assert f0.depth is not None and f0.depth.shape == SHAPE
        # Depth decodes back to meters (plane at ~3 m).
        center = f0.depth[SHAPE[0] // 2, SHAPE[1] // 2]
        assert 2.0 < center < 4.0, center
        assert ds.groundtruth is not None
        gts, gtp = ds.groundtruth
        assert len(gts) == 6
        # Ground truth round-trips through TUM format.
        d = float(se3.distance(gtp[3], poses[3]))
        assert d < 1e-4, d

    def test_fallback_nearest_timestamp_pairing(self, tmp_path):
        root = str(tmp_path / "seq2")
        write_tum_fixture(root, n=5, with_assoc=False)
        ds = TumDataset(root)
        frames = list(ds)
        assert len(frames) == 5
        assert all(f.depth is not None for f in frames)


class TestRunTumExample:
    @pytest.mark.slow
    def test_run_tum_main_end_to_end(self, tmp_path, monkeypatch, capsys):
        """Drive examples/run_tum.py's main() on the fixture: loader,
        System loop (RGBD), trajectory save, map save, ATE report."""
        root = str(tmp_path / "seq")
        write_tum_fixture(root, n=20)
        out = str(tmp_path / "out")
        # run_tum hardcodes FR1 intrinsics as the default camera; point
        # it at the fixture camera through the config system instead.
        cfg = tmp_path / "cam.yaml"
        cfg.write_text(
            "camera:\n  fx: 320.0\n  fy: 320.0\n  cx: 160.0\n"
            "  cy: 120.0\n"
        )
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "examples"))
        import run_tum

        monkeypatch.setattr(
            sys, "argv",
            ["run_tum.py", root, "--sensor", "rgbd",
             "--config", str(cfg), "--out", out],
        )
        run_tum.main()
        printed = capsys.readouterr().out
        assert "ATE RMSE" in printed, printed
        ate_cm = float(printed.split("ATE RMSE:")[1].split("cm")[0])
        # RGBD on noise-free synthetic frames: sub-5 cm over a ~1 m path.
        assert ate_cm < 5.0, printed
        assert os.path.exists(os.path.join(out, "trajectory_tum.txt"))
        assert os.path.exists(os.path.join(out, "map.npz"))
        assert os.path.exists(os.path.join(out, "cloud.ply"))
        # The saved trajectory parses back and covers every frame.
        st, ps = traj.load_tum(os.path.join(out, "trajectory_tum.txt"))
        assert len(st) == 20
        from ygz_slam_tpu.system.config import Config
        Config.clear()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
