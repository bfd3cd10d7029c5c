"""Stereo mode tests: rectified matching depth accuracy against the
rendering oracle, and full stereo tracking through the System facade.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models import VOOptions, Status
from ygz_slam_tpu.ops import fast
from ygz_slam_tpu.ops.stereo import match_stereo
from ygz_slam_tpu.system import System, Sensor
from ygz_slam_tpu.system import trajectory as traj
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)
BASELINE = 0.1


def render_stereo(scene, T_left):
    """Right camera displaced by +baseline along the left camera's x."""
    shift = SE3(jnp.eye(3), jnp.asarray([-BASELINE, 0.0, 0.0]))
    T_right = shift.compose(T_left)
    return scene.render(T_left, SHAPE), scene.render(T_right, SHAPE)


class TestStereoMatching:
    def test_depth_accuracy(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=11)
        left, right = render_stereo(scene, SE3.identity())
        c = fast.detect(left, 20.0, cell=16, max_corners=120)
        sd = match_stereo(
            left, right, c.xy, c.mask, CAM.fx, BASELINE,
            min_depth=0.5, max_depth=10.0,
        )
        gt = scene.depth(c.xy, SE3.identity())
        ok = np.asarray(sd.ok & c.mask)
        assert ok.sum() > 60, f"only {ok.sum()} stereo matches"
        rel = np.abs(np.asarray(sd.depth) - np.asarray(gt)) / np.asarray(gt)
        assert np.median(rel[ok]) < 0.02, np.median(rel[ok])

    def test_out_of_range_rejected(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=11)
        left, right = render_stereo(scene, SE3.identity())
        c = fast.detect(left, 20.0, cell=16, max_corners=64)
        # Scene depth 3 m excluded from the allowed range: the vast
        # majority must be rejected (ZMSSD score + LR consistency).  A
        # few symmetric texture aliases survive on this quasi-periodic
        # synthetic texture — they alias in both directions, which no
        # local check can distinguish.
        sd = match_stereo(
            left, right, c.xy, c.mask, CAM.fx, BASELINE,
            min_depth=5.0, max_depth=20.0,
        )
        n_valid = int(c.mask.sum())
        assert int((sd.ok & c.mask).sum()) < 0.3 * n_valid


class TestStereoSystem:
    @pytest.mark.slow
    def test_tracks_metric(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=12)
        sys_ = System(camera=CAM, sensor=Sensor.STEREO,
                      options=VOOptions(kf_min_frames=5, kf_max_trans=0.05))
        est, gt = [], []
        for k in range(14):
            t = k / 13.0
            T = se3.exp(jnp.asarray(
                [0.5 * t, 0.08 * np.sin(2 * t), 0.12 * t,
                 0.01 * np.sin(3 * t), -0.06 * t, 0.01 * t], jnp.float32))
            left, right = render_stereo(scene, T)
            r = sys_.track_stereo(left, right, float(k))
            if r.status == Status.GOOD:
                est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
                gt.append(np.asarray(-(T.R.T @ T.t)))
        assert len(est) >= 11, f"stereo tracked only {len(est)} frames"
        # Stereo has metric scale: rigid ATE.
        ate = traj.ate_rmse(np.array(est), np.array(gt), with_scale=False)
        assert ate < 0.03, ate


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
