"""End-to-end gates for the two round-2 camera-model fixes:

1. Distortion-consistent pipeline: VO on synthetic frames rendered
   WITH FR1-magnitude radial distortion (k1~0.26) must reach the same
   cm-level ATE as the zero-distortion tests (the reference undistorts
   every BA observation via Pixel2Camera2D, src/Algorithm/BA.cpp:33+;
   round 1 projected distorted=False against raw pixels).
2. Per-level map patch search: a forward-motion sequence (>=1.5x scale
   change) must keep tracking inliers where a level-0-only search
   sheds them (GetBestSearchLevel, Matcher.h:123-134, wired into
   track_local_map).
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full VO runs with distortion

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.utils.synthetic import PlaneScene
from tests.test_vo import sim3_align_ate, VO_OPTS

SHAPE = (240, 320)


class TestDistortedCamera:
    def test_tracks_with_fr1_magnitude_distortion(self):
        """Same trajectory family as test_initializes_and_tracks, but
        the camera has strong radial distortion and the frames are
        rendered through it (PlaneScene renders raw-sensor images via
        pixel_to_camera(distorted=True))."""
        cam = PinholeCamera.create(
            320.0, 320.0, 160.0, 120.0, k1=0.26, k2=-0.08
        )
        scene = PlaneScene(cam, plane_z=3.0, seed=0)
        n = 40
        poses = []
        for k in range(n):
            t = k / (n - 1)
            xi = jnp.asarray(
                [1.1 * t, 0.18 * np.sin(2 * t), 0.3 * t,
                 0.03 * np.sin(3 * t), -0.16 * t, 0.03 * t],
                jnp.float32,
            )
            poses.append(se3.exp(xi))
        imgs = [scene.render(T, SHAPE) for T in poses]
        vo = VisualOdometry(cam, VOOptions(**VO_OPTS))
        statuses, est, gt = [], [], []
        for k, img in enumerate(imgs):
            r = vo.add_frame(img, timestamp=float(k))
            statuses.append(r.status)
            if r.status == Status.GOOD:
                est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
                gt.append(np.asarray(-(poses[k].R.T @ poses[k].t)))
        assert Status.GOOD in statuses, f"never GOOD: {statuses}"
        n_good = sum(s == Status.GOOD for s in statuses)
        assert n_good > n * 0.5, f"only {n_good}/{n} tracked"
        assert statuses[-1] == Status.GOOD, "lost at the end"
        ate = sim3_align_ate(np.array(est), np.array(gt))
        # Same gate as the zero-distortion pipeline test (0.05):
        # distortion-consistency means distortion costs no accuracy.
        assert ate < 0.05, f"distorted-camera ATE {ate:.4f} m"


class TestForwardMotionScale:
    def _run(self, n=46):
        cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(cam, plane_z=3.0, seed=2)
        poses = []
        for k in range(n):
            t = k / (n - 1)
            # Dominantly forward: z 0 -> 1.6 (scale change 3/(3-1.6) ~ 2.1x)
            # with small lateral motion for initialization parallax.
            xi = jnp.asarray(
                [0.25 * np.sin(2 * t), 0.05 * np.sin(3 * t), 1.6 * t,
                 0.0, -0.02 * t, 0.0],
                jnp.float32,
            )
            poses.append(se3.exp(xi))
        imgs = [scene.render(T, SHAPE) for T in poses]
        vo = VisualOdometry(cam, VOOptions(**VO_OPTS))
        inliers, statuses = [], []
        est, gt = [], []
        for k, img in enumerate(imgs):
            r = vo.add_frame(img, timestamp=float(k))
            statuses.append(r.status)
            if r.status == Status.GOOD:
                inliers.append(r.n_inliers)
                est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
                gt.append(np.asarray(-(poses[k].R.T @ poses[k].t)))
        return statuses, inliers, est, gt

    def test_keeps_inliers_through_2x_scale_change(self):
        statuses, inliers, est, gt = self._run()
        assert statuses[-1] == Status.GOOD, (
            f"lost under forward motion: {statuses}"
        )
        # The END of the sequence (max scale change) must still track
        # with a healthy inlier count, not limp along at the gate.
        tail = inliers[-5:]
        assert min(tail) >= 40, f"tail inliers collapsed: {tail}"
        ate = sim3_align_ate(np.array(est), np.array(gt))
        assert ate < 0.06, f"forward-motion ATE {ate:.4f}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
