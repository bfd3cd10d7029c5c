"""System layer tests: config, trajectory IO + ATE/RPE, System facade
(monocular + RGBD), map save/load."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.system import System, Sensor, Config
from ygz_slam_tpu.system import trajectory as traj
from ygz_slam_tpu.system.config import camera_from_config, apply_to, VO_CONFIG_KEYS
from ygz_slam_tpu.models import VOOptions, Status
from ygz_slam_tpu.utils.datasets import SyntheticDataset

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(
            "camera:\n  fx: 321.0\n  fy: 322.0\n  cx: 160.0\n  cy: 120.0\n"
            "init:\n  min_features: 55\n"
        )
        Config.set_parameter_file(str(p))
        assert Config.get("camera.fx") == 321.0
        assert Config.get("init.min_features") == 55
        assert Config.get("missing.key", 7) == 7
        cam = camera_from_config()
        assert float(cam.fx) == 321.0
        opts = apply_to(VOOptions(), VO_CONFIG_KEYS)
        assert opts.init_min_features == 55
        Config.clear()

    def test_flat_keys(self):
        Config.set_dict({"camera.fx": 500.0})
        assert Config.get("camera.fx") == 500.0
        Config.clear()


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path):
        stamps = [0.0, 1.0, 2.0]
        poses = [
            se3.exp(jnp.asarray([0.1 * k, 0, 0, 0, 0.05 * k, 0], jnp.float32))
            for k in range(3)
        ]
        p = tmp_path / "traj.txt"
        traj.save_tum(str(p), stamps, poses)
        s2, p2 = traj.load_tum(str(p))
        np.testing.assert_allclose(s2, stamps)
        for a, b in zip(poses, p2):
            assert float(se3.distance(a, b)) < 1e-4

    def test_ate_zero_for_similarity(self):
        rng = np.random.default_rng(0)
        gt = rng.normal(size=(50, 3))
        R = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
        est = 0.5 * (gt @ R.T) + np.array([1.0, 2.0, 3.0])
        # est is a similarity transform of gt -> ATE after alignment ~ 0.
        assert traj.ate_rmse(est, gt) < 1e-5

    def test_rpe(self):
        poses = [
            se3.exp(jnp.asarray([0.1 * k, 0, 0, 0, 0, 0], jnp.float32))
            for k in range(10)
        ]
        t_err, r_err = traj.rpe_rmse(poses, poses)
        assert t_err < 1e-6 and r_err < 1e-6


class TestSystemFacade:
    def test_stereo_constructs(self):
        # STEREO was declared-but-unimplemented in the reference
        # (system.h:19-21); here it is a real sensor mode (ops.stereo).
        s = System(camera=CAM, sensor=Sensor.STEREO)
        assert s.sensor == Sensor.STEREO

    @pytest.mark.slow
    def test_rgbd_tracks(self):
        ds = SyntheticDataset(CAM, n_frames=16, shape=(240, 320),
                              with_depth=True, motion_scale=0.5)
        sys_ = System(camera=CAM, sensor=Sensor.RGBD,
                      options=VOOptions(kf_min_frames=5, kf_max_trans=0.05))
        est, gt = [], []
        for fd in ds:
            r = sys_.track_rgbd(fd.gray, fd.depth, fd.timestamp)
            if r.status == Status.GOOD:
                est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
                gt.append(np.asarray(-(fd.T_cw_gt.R.T @ fd.T_cw_gt.t)))
        assert len(est) >= 12, f"RGBD tracked only {len(est)} frames"
        # RGBD has metric scale: rigid (no-scale) ATE must be small.
        ate = traj.ate_rmse(np.array(est), np.array(gt), with_scale=False)
        assert ate < 0.03, ate

    @pytest.mark.slow
    def test_resume_from_saved_map(self, tmp_path):
        """System A builds a monocular map; System B loads it and
        resumes by relocalizing (NOT_READY + non-empty map path)."""
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import se3 as se3m

        scene = PlaneScene(CAM, plane_z=3.0, seed=31)
        imgs = []
        for k in range(22):
            t = k / 21.0
            T = se3m.exp(jnp.asarray(
                [1.0 * t, 0.15 * np.sin(2 * t), 0.25 * t,
                 0.02 * np.sin(3 * t), -0.14 * t, 0.02 * t], jnp.float32))
            imgs.append(scene.render(T, (240, 320)))
        opts = VOOptions(init_min_disparity=15.0, kf_min_frames=4,
                         kf_max_trans=0.03, kf_max_rot=0.04)
        sysA = System(camera=CAM, sensor=Sensor.MONOCULAR, options=opts)
        for k, img in enumerate(imgs):
            sysA.track_monocular(img, float(k))
        assert sysA.status == Status.GOOD
        mpath = tmp_path / "resume.npz"
        sysA.save_map(str(mpath))
        sysB = System(camera=CAM, sensor=Sensor.MONOCULAR, options=opts)
        sysB.load_map(str(mpath))
        kf_fid = int(sysB.vo.server.state.kf_id[sysB.vo.server.kf_used[2]])
        r1 = sysB.track_monocular(imgs[kf_fid], 100.0)
        r2 = sysB.track_monocular(imgs[kf_fid + 1], 101.0)
        assert r1.status == Status.GOOD, r1
        assert r2.status == Status.GOOD and r2.n_inliers > 50

    @pytest.mark.slow
    def test_save_trajectory_and_map(self, tmp_path):
        ds = SyntheticDataset(CAM, n_frames=14, shape=(240, 320),
                              with_depth=True, motion_scale=0.5)
        sys_ = System(camera=CAM, sensor=Sensor.RGBD,
                      options=VOOptions(kf_min_frames=5, kf_max_trans=0.05))
        for fd in ds:
            sys_.track_rgbd(fd.gray, fd.depth, fd.timestamp)
        tpath = tmp_path / "traj.txt"
        mpath = tmp_path / "map.npz"
        sys_.save_trajectory(str(tpath))
        sys_.save_map(str(mpath))
        s, p = traj.load_tum(str(tpath))
        assert len(s) >= 12
        # Load the map into a fresh system.
        sys2 = System(camera=CAM, sensor=Sensor.RGBD,
                      options=VOOptions(kf_min_frames=5))
        sys2.load_map(str(mpath))
        m1, m2 = sys_.vo.server.state, sys2.vo.server.state
        assert int(m2.pt_valid.sum()) == int(m1.pt_valid.sum())
        np.testing.assert_allclose(
            np.asarray(m2.kf_pose7), np.asarray(m1.kf_pose7)
        )
        assert sys2.vo.server.kf_used == sys_.vo.server.kf_used


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestEurocDataset:
    def test_asl_tree_roundtrip(self, tmp_path):
        """EuRoC ASL loader (BASELINE config 4 ingestion): data.csv +
        PNGs + ground-truth csv -> FrameData stream + (stamps, T_cw)."""
        import os
        import numpy as np
        from PIL import Image
        from ygz_slam_tpu.utils.datasets import EurocDataset

        root = tmp_path / "mav0"
        (root / "cam0" / "data").mkdir(parents=True)
        (root / "state_groundtruth_estimate0").mkdir(parents=True)
        with open(root / "cam0" / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(3):
                ts = 1403636579763555584 + i * 50_000_000
                img = (np.random.default_rng(i).random((48, 64))
                       * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    root / "cam0" / "data" / f"{ts}.png")
                f.write(f"{ts},{ts}.png\n")
        with open(root / "state_groundtruth_estimate0" / "data.csv",
                  "w") as f:
            f.write("#ts,px,py,pz,qw,qx,qy,qz\n")
            for i in range(3):
                f.write(f"{1403636579763555584 + i * 50_000_000},"
                        f"{0.1 * i},0,1,1,0,0,0\n")
        ds = EurocDataset(str(tmp_path))
        frames = list(ds)
        assert len(ds) == len(frames) == 3
        assert frames[0].gray.shape == (48, 64)
        assert frames[0].gray.dtype == np.float32
        assert abs(frames[1].timestamp - frames[0].timestamp
                   - 0.05) < 1e-6
        stamps, poses = ds.groundtruth
        assert len(stamps) == 3
        # T_cw = T_wb^-1: t_cw = -R^T t_wb = (-0.1, 0, -1) at i=1.
        np.testing.assert_allclose(
            np.asarray(poses[1].t), [-0.1, 0.0, -1.0], atol=1e-6)


@pytest.mark.slow
class TestStreamIngestion:
    def test_stream_matches_per_frame(self):
        """track_monocular_stream (the System-level chunked default)
        reproduces the per-frame path's statuses and keyframe set."""
        import numpy as np
        import jax.numpy as jnp
        from ygz_slam_tpu.geometry import se3
        from ygz_slam_tpu.utils.synthetic import PlaneScene

        scene = PlaneScene(CAM, plane_z=3.0, seed=9)
        n = 26
        imgs = []
        for k in range(n):
            t = k / (n - 1)
            xi = jnp.asarray(
                [1.0 * t, 0.15 * np.sin(2 * t), 0.3 * t,
                 0.02 * np.sin(3 * t), -0.12 * t, 0.02 * t],
                jnp.float32,
            )
            imgs.append(scene.render(se3.exp(xi), (240, 320)))
        opts = VOOptions(init_min_disparity=15.0, kf_min_frames=5,
                        kf_max_trans=0.04, kf_max_rot=0.05)

        s1 = System(camera=CAM, sensor=Sensor.MONOCULAR, options=opts)
        res_stream = s1.track_monocular_stream(
            ((im, float(k)) for k, im in enumerate(imgs)), chunk=6
        )
        s2 = System(camera=CAM, sensor=Sensor.MONOCULAR, options=opts)
        res_frame = [s2.track_monocular(im, float(k))
                     for k, im in enumerate(imgs)]
        assert len(res_stream) == len(res_frame) == n
        assert ([r.status for r in res_stream]
                == [r.status for r in res_frame])
        assert s1.vo.server.kf_used == s2.vo.server.kf_used
