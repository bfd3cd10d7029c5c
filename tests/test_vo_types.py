"""VO-type and map-type switching (legacy system.h:19-38).

The reference declares three frontend methods (SPARSE_DIRECT,
SPARSE_ORB, SEMI_DENSE_DIRECT) and three map types (SPARSE,
SEMI_DENSE, DENSE) but implements only sparse-direct/sparse.  These
tests drive the other combinations end-to-end on the same rendered
synthetic sequences as test_vo.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera
from ygz_slam_tpu.models import (
    VisualOdometry, VOOptions, Status, VOType, MapType,
)
from ygz_slam_tpu.models import orb_tracking, semidense
from ygz_slam_tpu.models.frontend import Features
from ygz_slam_tpu.utils.synthetic import PlaneScene

from test_vo import CAM, SHAPE, VO_OPTS, render_sequence, sim3_align_ate


def run_vo(vo, imgs, poses):
    statuses, est, gt = [], [], []
    for k, img in enumerate(imgs):
        r = vo.add_frame(img, timestamp=float(k))
        statuses.append(r.status)
        if r.status == Status.GOOD:
            est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
            gt.append(np.asarray(-(poses[k].R.T @ poses[k].t)))
    return statuses, np.array(est), np.array(gt)


class TestSparseORB:
    def test_match_by_projection_exact(self):
        """Landmarks whose descriptors appear verbatim among detected
        features must match at the true projection."""
        from ygz_slam_tpu.ops import fast, orb

        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        img = scene.render(SE3.identity(), SHAPE)
        c = fast.detect(img, 20.0, cell=12, max_corners=128)
        ang, desc = orb.compute(img, c.xy)
        depth = scene.depth(c.xy, SE3.identity())
        pts_w = CAM.pixel_to_world(c.xy, SE3.identity(), depth=depth)
        feats = Features(
            px=c.xy, level=jnp.zeros(128, jnp.int32), score=c.score,
            angle=ang, desc=desc, depth=depth, valid=c.mask,
        )
        matched, obs_px, in_view = orb_tracking.match_by_projection(
            CAM, SE3.identity(), pts_w, c.mask, desc, feats,
            radius=10.0,
        )
        m = np.asarray(matched)
        assert m.sum() >= 0.8 * int(np.asarray(c.mask).sum())
        err = np.linalg.norm(
            np.asarray(obs_px) - np.asarray(c.xy), axis=1
        )
        assert np.all(err[m] < 1e-3)

    @pytest.mark.slow
    def test_tracks_sequence(self):
        n = 40
        scene, poses, imgs = render_sequence(n)
        vo = VisualOdometry(
            CAM, VOOptions(vo_type=VOType.SPARSE_ORB, **VO_OPTS)
        )
        statuses, est, gt = run_vo(vo, imgs, poses)
        assert Status.GOOD in statuses
        n_good = sum(s == Status.GOOD for s in statuses)
        assert n_good > n * 0.5, f"only {n_good}/{n} tracked: {statuses}"
        ate = sim3_align_ate(est, gt)
        # Feature matching is integer-pixel (no subpixel refinement),
        # so the gate is looser than the direct tracker's 0.05.
        assert ate < 0.10, f"SPARSE_ORB ATE {ate:.4f} m"


@pytest.mark.slow
class TestSemiDense:
    def test_gradient_selection(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=4)
        img = scene.render(SE3.identity(), SHAPE)
        px, valid = semidense.select_gradient_pixels(
            img, cell=8, budget=256, min_grad=5.0
        )
        assert int(np.asarray(valid).sum()) > 100
        # Selected pixels must actually be high-gradient.
        g = np.gradient(np.asarray(img))
        mag = np.sqrt(g[0] ** 2 + g[1] ** 2)
        pxn = np.asarray(px).astype(int)
        sel = np.asarray(valid)
        assert mag[pxn[sel, 1], pxn[sel, 0]].mean() > mag.mean()

    def test_tracks_sequence_and_builds_cloud(self):
        n = 40
        scene, poses, imgs = render_sequence(n)
        vo = VisualOdometry(
            CAM,
            VOOptions(
                vo_type=VOType.SEMI_DENSE_DIRECT,
                map_type=MapType.SEMI_DENSE,
                sd_budget=256,
                **VO_OPTS,
            ),
        )
        statuses, est, gt = run_vo(vo, imgs, poses)
        assert Status.GOOD in statuses
        n_good = sum(s == Status.GOOD for s in statuses)
        assert n_good > n * 0.5, f"only {n_good}/{n} tracked: {statuses}"
        ate = sim3_align_ate(est, gt)
        assert ate < 0.05, f"SEMI_DENSE ATE {ate:.4f} m"
        assert vo.sd is not None, "no semi-dense point set maintained"
        cloud = vo.export_point_cloud()
        n_land = int(np.asarray(vo.server.state.pt_valid).sum())
        assert cloud.shape[0] > n_land, (
            "semi-dense cloud adds nothing beyond landmarks"
        )

    def test_semidense_depths_converge_to_truth(self):
        """Gradient-pixel seeds refined over a translating sequence
        must approach the scene's true depths (in map-scale units)."""
        n = 40
        scene, poses, imgs = render_sequence(n)
        vo = VisualOdometry(
            CAM,
            VOOptions(
                vo_type=VOType.SEMI_DENSE_DIRECT, sd_budget=256,
                **VO_OPTS,
            ),
        )
        for k, img in enumerate(imgs):
            vo.add_frame(img, timestamp=float(k))
        assert vo.sd is not None
        usable = np.asarray(vo.sd.usable())
        if usable.sum() < 20:
            pytest.skip("too few usable seeds on this sequence")
        # Map scale: mean landmark depth in the sd keyframe ~ true
        # scene depth ratio; compare seed depth to true depth up to
        # the global scale factor.
        slot = int(vo.sd.kf_slot)
        kf_id = int(np.asarray(vo.server.state.kf_id[slot]))
        assert 0 <= kf_id < n
        d_est = np.asarray(vo.sd.depths())[usable]
        gt_depth = np.asarray(scene.depth(vo.sd.px, poses[kf_id]))[usable]
        ratio = d_est / gt_depth
        # One global scale, small spread.
        spread = np.std(ratio) / np.mean(ratio)
        assert spread < 0.15, f"seed depth spread {spread:.3f}"


class TestDenseMap:
    def test_rgbd_dense_cloud(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=6)
        H, W = SHAPE
        vo = VisualOdometry(
            CAM, VOOptions(map_type=MapType.DENSE, **VO_OPTS)
        )
        T = SE3.identity()
        img = scene.render(T, SHAPE)
        px_all = np.stack(
            np.meshgrid(np.arange(W), np.arange(H)), -1
        ).reshape(-1, 2).astype(np.float32)
        depth = np.asarray(
            scene.depth(jnp.asarray(px_all), T)
        ).reshape(H, W)
        r = vo.add_frame(img, 0.0, depth=depth)
        assert r.status == Status.GOOD
        assert len(vo.dense_cloud) == 1
        cloud = vo.export_point_cloud()
        # The plane z=3: back-projected points must lie on it.
        assert cloud.shape[0] > 1000
        z = vo.dense_cloud[0][:, 2]
        assert np.allclose(z, 3.0, atol=0.05), (
            z.min(), z.max()
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


@pytest.mark.slow
class TestOrbSecondChance:
    """When the motion-model projection window misses, SPARSE_ORB must
    re-search with a widened window before declaring LOST (the role
    SearchByBoW-based TrackReferenceKeyFrame plays in ORB-SLAM)."""

    def _spiked_sequence(self, n, spike_at, spike=0.25, horizon=24):
        from ygz_slam_tpu.geometry import se3
        from test_vo import make_trajectory
        scene = PlaneScene(CAM, plane_z=3.0, seed=0)
        # Trajectory dynamics are set by `horizon` (make_trajectory
        # scales with its argument); only the first n frames render.
        poses = make_trajectory(horizon)[:n]
        # Step change: every pose from spike_at on shifts laterally by
        # `spike` meters (projection jump ~ f*spike/z ~ 27 px — outside
        # the 15 px coarse window, inside the widened one).
        dT = se3.exp(jnp.asarray([spike, 0, 0, 0, 0, 0], jnp.float32))
        poses = [p if k < spike_at else dT.compose(p)
                 for k, p in enumerate(poses)]
        imgs = [scene.render(T, SHAPE) for T in poses]
        return poses, imgs

    def test_wide_research_recovers_spike(self):
        n, spike_at = 13, 10
        poses, imgs = self._spiked_sequence(n, spike_at)

        def run(second_chance):
            vo = VisualOdometry(CAM, VOOptions(
                vo_type=VOType.SPARSE_ORB,
                orb_second_chance=second_chance, **VO_OPTS))
            st = [vo.add_frame(im, float(k)).status
                  for k, im in enumerate(imgs)]
            return vo, st

        vo_on, st_on = run(True)
        # The widened pass absorbs the window miss at the spike frame
        # (later frames may still degrade from reduced map overlap —
        # that is the reloc cascade's job, not this fallback's).
        assert st_on[spike_at] == Status.GOOD, st_on
        assert vo_on.stats["orb_second_chance_hits"] >= 1
        vo_off, st_off = run(False)
        assert st_off[spike_at] == Status.LOST, st_off
