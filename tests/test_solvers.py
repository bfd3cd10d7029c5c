"""Solver tests: GN/LM engine on analytic problems, BA recovery on
synthetic multi-view fixtures.

Fixture methodology mirrors the reference's simulation tests
(test/test_local_ba.cpp:9-123: 8 noisy keyframes x 16 points, observe
ground truth + pixel noise, optimize, compare; note.md:3-4's lesson —
generate observations from ground truth + noise, never from noisy
state — is followed).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.solvers import ba as bam
from ygz_slam_tpu.solvers import (
    robust,
    gauss_newton,
    levenberg_marquardt,
    Observations,
    pose_only_ba,
    point_only_ba,
    local_ba,
    two_view_ba,
)

CAM = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)


def make_scene(n_kf=6, n_pts=40, seed=0, trans_step=0.15):
    """Ground-truth keyframe ring + landmark cloud + pixel observations."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    Ts = []
    for k in range(n_kf):
        w = rng.normal(size=3) * 0.03
        t = np.array([k * trans_step, 0.0, 0.0]) + rng.normal(size=3) * 0.02
        Ts.append(SE3(so3.exp(jnp.asarray(w, jnp.float32)), jnp.asarray(t, jnp.float32)))
    poses = jax.tree.map(lambda *xs: jnp.stack(xs), *Ts)
    pts = jnp.asarray(pts)
    px = jax.vmap(lambda T: CAM.world_to_pixel(pts, T, distorted=False))(poses)
    return poses, pts, px  # px: [K, N, 2]


class TestRobust:
    def test_huber(self):
        r = jnp.array([0.5, 1.345, 5.0])
        w = robust.huber_weight(r)
        np.testing.assert_allclose(w, [1.0, 1.0, 1.345 / 5.0], rtol=1e-5)

    def test_tukey_zero_outside(self):
        assert float(robust.tukey_weight(jnp.array(10.0))) == 0.0
        assert float(robust.tukey_weight(jnp.array(0.0))) == 1.0

    def test_mad_scale_gaussian(self):
        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.normal(0, 2.0, size=4096), dtype=jnp.float32)
        s = robust.mad_scale(r)
        assert 1.8 < float(s) < 2.2

    def test_mad_scale_masked(self):
        rng = np.random.default_rng(0)
        r = np.concatenate([rng.normal(0, 1.0, 512), np.full(512, 1e6)])
        mask = jnp.asarray(np.arange(1024) < 512)
        s = robust.mad_scale(jnp.asarray(r, jnp.float32), mask)
        assert 0.8 < float(s) < 1.2


class TestNLLS:
    def test_gn_quadratic(self):
        # Least squares fit y = a x + b: exact solution in 1 GN step.
        xs = jnp.linspace(0, 1, 50)
        ys = 3.0 * xs + 0.5

        def compute(p):
            r = p[0] * xs + p[1] - ys
            J = jnp.stack([xs, jnp.ones_like(xs)], axis=-1)
            H = J.T @ J
            b = -J.T @ r
            return H, b, jnp.sum(r * r)

        p, stats = gauss_newton(compute, lambda x, dx: x + dx, jnp.zeros(2), n_iter=5)
        np.testing.assert_allclose(p, [3.0, 0.5], atol=1e-4)
        assert float(stats.chi2) < 1e-8

    def test_lm_rosenbrock_ls(self):
        # Rosenbrock as least squares: r = (1-x, 10(y-x^2)).
        def compute(p):
            x, y = p[0], p[1]
            r = jnp.array([1.0 - x, 10.0 * (y - x * x)])
            J = jnp.array([[-1.0, 0.0], [-20.0 * x, 10.0]])
            return J.T @ J, -J.T @ r, jnp.sum(r * r)

        p, stats = levenberg_marquardt(
            compute, lambda x, dx: x + dx, jnp.array([-1.2, 1.0]), n_iter=60
        )
        np.testing.assert_allclose(p, [1.0, 1.0], atol=1e-3)

    def test_gn_rollback_keeps_best(self):
        # A compute whose chi2 landscape makes the full GN step overshoot:
        # rollback must never end with chi2 above the initial value.
        def compute(p):
            r = jnp.array([jnp.tanh(p[0]) - 0.9])
            J = jnp.array([[1.0 / jnp.cosh(p[0]) ** 2]])
            return J.T @ J, -J.T @ r, jnp.sum(r * r)

        p0 = jnp.array([3.0])
        _, chi0 = None, float(compute(p0)[2])
        p, stats = gauss_newton(compute, lambda x, dx: x + dx, p0, n_iter=10)
        assert float(stats.chi2) <= chi0 + 1e-9


class TestPoseOnlyBA:
    def test_recovers_pose(self):
        poses, pts, px = make_scene(n_kf=1)
        T_gt = jax.tree.map(lambda a: a[0], poses)
        rng = np.random.default_rng(1)
        noisy_px = px[0] + jnp.asarray(rng.normal(0, 0.5, px[0].shape), jnp.float32)
        T0 = se3.boxplus(T_gt, jnp.asarray([0.05, -0.04, 0.03, 0.02, -0.01, 0.015], jnp.float32))
        mask = jnp.ones(pts.shape[0], bool)
        T_opt, inlier, chi2 = pose_only_ba(T0, pts, noisy_px, mask, CAM)
        # With 0.5 px noise the ML estimate itself carries ~0.01 pose
        # error (depth-direction translation is weakly constrained);
        # the solver must reach that statistical limit.
        err = float(se3.distance(T_opt, T_gt))
        err0 = float(se3.distance(T0, T_gt))
        assert err < 0.03 and err < err0 * 0.5, (err0, err)
        assert int(inlier.sum()) >= 38

    def test_recovers_pose_exactly_no_noise(self):
        poses, pts, px = make_scene(n_kf=1)
        T_gt = jax.tree.map(lambda a: a[0], poses)
        T0 = se3.boxplus(T_gt, jnp.asarray([0.05, -0.04, 0.03, 0.02, -0.01, 0.015], jnp.float32))
        mask = jnp.ones(pts.shape[0], bool)
        T_opt, _, chi2 = pose_only_ba(T0, pts, px[0], mask, CAM)
        assert float(se3.distance(T_opt, T_gt)) < 1e-4
        assert float(chi2) < 1e-5

    def test_rejects_outliers(self):
        poses, pts, px = make_scene(n_kf=1)
        T_gt = jax.tree.map(lambda a: a[0], poses)
        bad_px = px[0].at[:8].add(50.0)  # 8 gross outliers
        T0 = se3.boxplus(T_gt, jnp.asarray([0.03, 0.02, -0.02, 0.01, 0.01, -0.01], jnp.float32))
        mask = jnp.ones(pts.shape[0], bool)
        T_opt, inlier, _ = pose_only_ba(T0, pts, bad_px, mask, CAM)
        assert not bool(inlier[:8].any()), "outliers must be rejected"
        assert bool(inlier[8:].all())
        assert float(se3.distance(T_opt, T_gt)) < 5e-3

    def test_jit_compiles(self):
        poses, pts, px = make_scene(n_kf=1)
        T0 = jax.tree.map(lambda a: a[0], poses)
        mask = jnp.ones(pts.shape[0], bool)
        f = jax.jit(lambda T, p, x, m: pose_only_ba(T, p, x, m, CAM))
        T_opt, inlier, chi2 = f(T0, pts, px[0], mask)
        assert float(chi2) < 1e-3  # perfect observations


class TestPointOnlyBA:
    def test_refines_points(self):
        poses, pts, px = make_scene(n_kf=4, n_pts=32)
        K, N = 4, 32
        obs = Observations(
            kf_idx=jnp.repeat(jnp.arange(K, dtype=jnp.int32), N),
            pt_idx=jnp.tile(jnp.arange(N, dtype=jnp.int32), K),
            px=px.reshape(K * N, 2),
            mask=jnp.ones(K * N, bool),
        )
        rng = np.random.default_rng(2)
        noisy_pts = pts + jnp.asarray(rng.normal(0, 0.05, pts.shape), jnp.float32)
        out = point_only_ba(poses, noisy_pts, obs, CAM)
        err0 = float(jnp.linalg.norm(noisy_pts - pts, axis=-1).mean())
        err1 = float(jnp.linalg.norm(out - pts, axis=-1).mean())
        assert err1 < err0 * 0.05, (err0, err1)


class TestLocalBA:
    def _build(self, pose_noise=0.02, pt_noise=0.05, px_noise=0.3, seed=3):
        K, N = 6, 40
        poses, pts, px = make_scene(n_kf=K, n_pts=N)
        rng = np.random.default_rng(seed)
        obs = Observations(
            kf_idx=jnp.repeat(jnp.arange(K, dtype=jnp.int32), N),
            pt_idx=jnp.tile(jnp.arange(N, dtype=jnp.int32), K),
            px=px.reshape(K * N, 2)
            + jnp.asarray(rng.normal(0, px_noise, (K * N, 2)), jnp.float32),
            mask=jnp.ones(K * N, bool),
        )
        # Perturb all but the first (gauge) keyframe and all points.
        xi = rng.normal(0, pose_noise, (K, 6)).astype(np.float32)
        xi[0] = 0
        noisy_poses = jax.vmap(se3.boxplus)(poses, jnp.asarray(xi))
        noisy_pts = pts + jnp.asarray(rng.normal(0, pt_noise, pts.shape), jnp.float32)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        return poses, pts, noisy_poses, noisy_pts, obs, fixed

    def test_exact_recovery_no_noise(self):
        # Fix TWO cameras: with one fixed camera monocular BA has a 1D
        # scale null space (chi2-invariant), so exact pose recovery is
        # only defined once scale gauge is pinned too.
        poses, pts, noisy_poses, noisy_pts, obs, fixed = self._build(px_noise=0.0)
        fixed = fixed.at[1].set(True)
        noisy_poses = jax.tree.map(
            lambda n, g: n.at[1].set(g[1]), noisy_poses, poses
        )
        res = local_ba(noisy_poses, noisy_pts, obs, CAM, fixed, n_iter=20)
        pose_err = float(jax.vmap(se3.distance)(res.poses, poses).mean())
        pt_err = float(jnp.linalg.norm(res.points - pts, axis=-1).mean())
        assert pose_err < 1e-3, pose_err
        assert pt_err < 5e-3, pt_err

    def test_reduces_error(self):
        poses, pts, noisy_poses, noisy_pts, obs, fixed = self._build()
        res = local_ba(noisy_poses, noisy_pts, obs, CAM, fixed, n_iter=15)
        pose_err0 = float(jax.vmap(se3.distance)(noisy_poses, poses).mean())
        pose_err1 = float(jax.vmap(se3.distance)(res.poses, poses).mean())
        # Pose distance to GT is contaminated by the monocular scale
        # gauge (only one camera fixed), so assert improvement plus the
        # gauge-invariant criterion BA actually minimizes: reprojection
        # RMSE at the noise floor (0.3 px observation noise).
        assert pose_err1 < pose_err0, (pose_err0, pose_err1)
        r, _, _, valid = bam.reproject(res.poses, res.points, obs, CAM)
        rmse = float(jnp.sqrt((jnp.where(valid[:, None], r, 0.0) ** 2).sum()
                              / jnp.maximum(valid.sum() * 2, 1)))
        assert rmse < 0.6, rmse
        # First pose must not move (gauge).
        assert float(se3.distance(
            jax.tree.map(lambda a: a[0], res.poses),
            jax.tree.map(lambda a: a[0], poses),
        )) < 1e-6

    def test_masked_obs_ignored(self):
        poses, pts, noisy_poses, noisy_pts, obs, fixed = self._build()
        # Corrupt half the observations but mask them out: result should
        # still converge.
        bad_px = obs.px.at[::2].add(500.0)
        mask = obs.mask.at[::2].set(False)
        obs2 = Observations(obs.kf_idx, obs.pt_idx, bad_px, mask)
        res = local_ba(noisy_poses, noisy_pts, obs2, CAM, fixed, n_iter=15)
        pose_err = float(jax.vmap(se3.distance)(res.poses, poses).mean())
        assert pose_err < 0.01, pose_err


class TestTwoViewBA:
    @pytest.mark.slow
    def test_init_refinement(self):
        K, N = 2, 60
        poses, pts, px = make_scene(n_kf=K, n_pts=N, trans_step=0.4)
        rng = np.random.default_rng(4)
        T_ref = jax.tree.map(lambda a: a[0], poses)
        T_cur_gt = jax.tree.map(lambda a: a[1], poses)
        T_cur0 = se3.boxplus(
            T_cur_gt, jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32)
        )
        noisy_pts = pts + jnp.asarray(rng.normal(0, 0.03, pts.shape), jnp.float32)
        mask = jnp.ones(N, bool)
        res = two_view_ba(
            T_ref, T_cur0, noisy_pts, px[0], px[1], mask, CAM, n_iter=15
        )
        T_cur_opt = jax.tree.map(lambda a: a[1], res.poses)
        # Monocular scale gauge: compare rotation and translation
        # *direction*; absolute translation magnitude is free.
        rot_err = float(jnp.linalg.norm(so3.log(
            T_cur_opt.R @ T_cur_gt.R.T)))
        t_dir_opt = T_cur_opt.t / jnp.linalg.norm(T_cur_opt.t)
        t_dir_gt = T_cur_gt.t / jnp.linalg.norm(T_cur_gt.t)
        dir_err = float(jnp.arccos(jnp.clip(jnp.dot(t_dir_opt, t_dir_gt), -1, 1)))
        assert rot_err < 3e-3, rot_err
        assert dir_err < 2e-2, dir_err
        assert int(res.inlier.sum()) == N


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestNormalScale:
    def test_normal_scale_estimates_sigma(self):
        import numpy as np
        import jax.numpy as jnp
        from ygz_slam_tpu.solvers import robust

        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.normal(0, 2.5, 4000), jnp.float32)
        s = float(robust.normal_scale(r))
        assert abs(s - 2.5) < 0.15, s
        # Masked: scale estimated from the selected half only.
        mask = jnp.asarray(np.arange(4000) < 2000)
        r2 = jnp.concatenate([r[:2000], 100.0 * jnp.ones(2000)])
        s2 = float(robust.normal_scale(r2, mask))
        assert abs(s2 - 2.5) < 0.2, s2


class TestOptimizeCurrent:
    """optimize_current (BA.cpp:91-186): one free pose + its observed
    landmarks, anchored by fixed-keyframe observations."""

    def _fixture(self, seed=0):
        import numpy as np
        from ygz_slam_tpu.geometry import PinholeCamera, se3
        rng = np.random.default_rng(seed)
        cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        K, L = 4, 60
        gt_pts = np.concatenate(
            [rng.uniform(-1.5, 1.5, (L, 2)), rng.uniform(2.5, 5, (L, 1))],
            1).astype(np.float32)
        gt_poses = [se3.exp(jnp.asarray(
            [0.15 * k, 0.02 * k, 0.05 * k, 0.01 * k, -0.02 * k, 0.0],
            jnp.float32)) for k in range(K)]
        poses = jax.tree.map(lambda *xs: jnp.stack(xs), *gt_poses)
        kf_idx, pt_idx, px = [], [], []
        for k in range(K):
            p = np.asarray(gt_poses[k].apply(gt_pts))
            uv = np.array(cam.camera_to_pixel(jnp.asarray(p)))
            uv += rng.normal(0, 0.3, uv.shape)
            kf_idx += [k] * L
            pt_idx += list(range(L))
            px.append(uv.astype(np.float32))
        obs = bam.Observations(
            kf_idx=jnp.asarray(kf_idx, jnp.int32),
            pt_idx=jnp.asarray(pt_idx, jnp.int32),
            px=jnp.concatenate([jnp.asarray(p) for p in px]),
            mask=jnp.ones(K * L, bool),
        )
        return cam, poses, gt_poses, jnp.asarray(gt_pts), obs

    def test_recovers_perturbed_current_pose(self):
        cam, poses, gt_poses, gt_pts, obs = self._fixture()
        cur = 3
        # Perturb the current pose and the landmarks.
        noisy = jax.tree.map(lambda a: a, poses)
        T_bad = se3.boxplus(
            gt_poses[cur],
            jnp.asarray([0.05, -0.04, 0.03, 0.01, -0.01, 0.02]))
        noisy = jax.tree.map(
            lambda full, bad: full.at[cur].set(bad), noisy, T_bad)
        pts_noisy = gt_pts + 0.02 * jax.random.normal(
            jax.random.PRNGKey(0), gt_pts.shape)
        res = bam.optimize_current(noisy, pts_noisy, obs, cam, cur,
                                  n_iter=15)
        err = float(se3.distance(
            jax.tree.map(lambda a: a[cur], res.poses), gt_poses[cur]))
        err0 = float(se3.distance(T_bad, gt_poses[cur]))
        assert err < 0.2 * err0, (err, err0)
        # Other poses must be untouched (gauge-fixed).
        for k in range(3):
            d = float(se3.distance(
                jax.tree.map(lambda a: a[k], res.poses), gt_poses[k]))
            assert d < 1e-6, (k, d)

    def test_unseen_points_frozen(self):
        cam, poses, gt_poses, gt_pts, obs = self._fixture()
        cur = 3
        # Mask out the current frame's observations of points >= 30:
        # those landmarks must not move even though keyframe
        # observations of them exist in the table.
        keep = ~((obs.kf_idx == cur) & (obs.pt_idx >= 30))
        obs = obs._replace(mask=obs.mask & keep)
        pts_noisy = gt_pts + 0.05
        res = bam.optimize_current(poses, pts_noisy, obs, cam, cur,
                                  n_iter=8)
        moved = np.abs(np.asarray(res.points) - np.asarray(pts_noisy))
        assert moved[30:].max() < 1e-7, moved[30:].max()
        assert moved[:30].max() > 1e-3  # observed ones did move
