"""VO integration on a NON-planar world (TwoPlaneScene): in-pipeline
initialization must select the fundamental/essential model (rh <= 0.4)
and tracking must survive the depth discontinuity + moving occlusion
boundary.  Closes the H-path-only blind spot of the planar end-to-end
tests (reference's planar vs non-planar fixture split,
test/test_initializer.cpp:9-80).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.utils.synthetic import TwoPlaneScene
from tests.test_vo import sim3_align_ate, VO_OPTS

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def render_two_plane(n, seed=0):
    scene = TwoPlaneScene(CAM, z_near=2.0, z_far=4.5, x_split=0.15,
                          seed=seed)
    poses = []
    for k in range(n):
        t = k / max(n - 1, 1)
        xi = jnp.asarray(
            [0.9 * t, 0.15 * np.sin(2 * t), 0.2 * t,
             0.02 * np.sin(3 * t), -0.12 * t, 0.02 * t],
            jnp.float32,
        )
        poses.append(se3.exp(xi))
    imgs = [scene.render(T, SHAPE) for T in poses]
    return scene, poses, imgs


class TestNonPlanarVO:
    def test_init_selects_fundamental_and_tracks(self):
        n = 40
        scene, poses, imgs = render_two_plane(n)
        vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
        statuses, est, gt = [], [], []
        for k, img in enumerate(imgs):
            r = vo.add_frame(img, timestamp=float(k))
            statuses.append(r.status)
            if r.status == Status.GOOD:
                est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
                gt.append(np.asarray(-(poses[k].R.T @ poses[k].t)))
        assert Status.GOOD in statuses, f"never GOOD: {statuses}"
        # The world is strongly non-planar (2 m vs 4.5 m surfaces):
        # in-pipeline initialization must take the F/E path.
        assert vo.stats["init_model_f"] >= 1, dict(vo.stats)
        assert vo.stats["init_model_h"] == 0, dict(vo.stats)
        assert statuses[-1] == Status.GOOD, "lost on depth discontinuity"
        n_good = sum(s == Status.GOOD for s in statuses)
        assert n_good > n * 0.5, f"only {n_good}/{n} tracked"
        ate = sim3_align_ate(np.array(est), np.array(gt))
        assert ate < 0.06, f"non-planar ATE {ate:.4f}"

    @pytest.mark.slow
    def test_landmarks_on_both_depths(self):
        """The map must triangulate landmarks on BOTH surfaces (depth
        discontinuity handled, not just the dominant plane)."""
        n = 30
        scene, poses, imgs = render_two_plane(n, seed=2)
        vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
        for k, img in enumerate(imgs):
            vo.add_frame(img, timestamp=float(k))
        m = vo.server.state
        sel = np.asarray(m.pt_valid)
        assert sel.sum() > 40
        pts = np.asarray(m.pt_pos)[sel]
        # Monocular scale is normalized (mean depth 1); split landmark
        # depths (z in first camera ~ world z here) by the normalized
        # midpoint between the two surfaces.
        z = pts[:, 2]
        mid = (np.median(z[z < np.percentile(z, 50)])
               + np.median(z[z > np.percentile(z, 50)])) / 2
        n_near = int((z < mid).sum())
        n_far = int((z > mid).sum())
        assert n_near > 10 and n_far > 10, (n_near, n_far)
        # And the two groups are genuinely separated in depth.
        assert np.median(z[z > mid]) / max(np.median(z[z < mid]), 1e-6) > 1.5


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
