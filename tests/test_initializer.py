"""Initializer tests: planar (H path) and non-planar (F path) synthetic
scenes, mirroring test_initializer.cpp:9-80's planar/general fixtures,
with added degenerate-case coverage (pure rotation must be rejected).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.solvers import initializer as init

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
K = np.array([[320.0, 0, 160.0], [0, 320.0, 120.0], [0, 0, 1.0]], np.float32)


def project(pts, T):
    return CAM.world_to_pixel(pts, T, distorted=False)


def make_pair(planar, seed=0, n=120, noise=0.5, xi=(0.3, 0.05, 0.02, 0.01, -0.04, 0.02)):
    rng = np.random.default_rng(seed)
    if planar:
        pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
        pts[:, 2] = 4.0  # exact plane -> homography regime
    else:
        pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(2.5, 7.0, n)
    pts = jnp.asarray(pts)
    T1 = SE3.identity()
    T2 = se3.exp(jnp.asarray(xi, jnp.float32))
    p1 = project(pts, T1) + jnp.asarray(rng.normal(0, noise, (n, 2)), jnp.float32)
    p2 = project(pts, T2) + jnp.asarray(rng.normal(0, noise, (n, 2)), jnp.float32)
    return pts, T2, p1, p2


def angle_between(t_est, t_gt):
    a = t_est / np.linalg.norm(t_est)
    b = t_gt / np.linalg.norm(t_gt)
    return float(np.arccos(np.clip(abs(np.dot(a, b)), -1, 1)))


class TestRansacModels:
    def test_planar_prefers_h(self):
        pts, T2, p1, p2 = make_pair(planar=True)
        res = init.ransac_hf(p1, p2, jnp.ones(p1.shape[0], bool), jax.random.key(0))
        assert float(res.rh) > 0.4, float(res.rh)

    def test_general_prefers_f(self):
        pts, T2, p1, p2 = make_pair(planar=False)
        res = init.ransac_hf(p1, p2, jnp.ones(p1.shape[0], bool), jax.random.key(0))
        assert float(res.rh) < 0.5, float(res.rh)
        assert int(res.inliers_f.sum()) > 90

    def test_f_satisfies_epipolar_constraint(self):
        pts, T2, p1, p2 = make_pair(planar=False, noise=0.0)
        res = init.ransac_hf(p1, p2, jnp.ones(p1.shape[0], bool), jax.random.key(1))
        F = np.asarray(res.F)
        x1 = np.concatenate([np.asarray(p1), np.ones((p1.shape[0], 1))], axis=1)
        x2 = np.concatenate([np.asarray(p2), np.ones((p2.shape[0], 1))], axis=1)
        resid = np.abs(np.einsum("ni,ij,nj->n", x2, F, x1))
        scale = np.abs(F).max()
        assert np.median(resid) / scale < 5.0


class TestReconstruct:
    def test_general_scene_recovers_pose(self):
        pts, T2, p1, p2 = make_pair(planar=False)
        out = init.initialize_two_view(
            p1, p2, jnp.ones(p1.shape[0], bool), jnp.asarray(K), jax.random.key(0)
        )
        assert bool(out.success)
        assert not bool(out.used_h)
        R_err = float(jnp.linalg.norm(so3.log(out.T21.R @ T2.R.T)))
        t_err = angle_between(np.asarray(out.T21.t), np.asarray(T2.t))
        assert R_err < 0.02, R_err
        assert t_err < 0.05, t_err
        assert int(out.good.sum()) > 70
        # Triangulated structure correct up to scale: compare depth ratios.
        scale = np.median(np.asarray(out.points3d[:, 2][out.good]) /
                          np.asarray(pts[:, 2][out.good]))
        rel = np.abs(np.asarray(out.points3d[:, 2][out.good]) -
                     scale * np.asarray(pts[:, 2][out.good]))
        # Two-view triangulation noise floor: (sigma/f) * z^2 / baseline
        # ~ 0.08 relative at these parameters.
        assert np.median(rel / np.asarray(pts[:, 2][out.good])) < 0.15

    def test_planar_scene_recovers_pose(self):
        pts, T2, p1, p2 = make_pair(planar=True)
        out = init.initialize_two_view(
            p1, p2, jnp.ones(p1.shape[0], bool), jnp.asarray(K), jax.random.key(0)
        )
        assert bool(out.success)
        R_err = float(jnp.linalg.norm(so3.log(out.T21.R @ T2.R.T)))
        t_err = angle_between(np.asarray(out.T21.t), np.asarray(T2.t))
        assert R_err < 0.03, R_err
        assert t_err < 0.08, t_err

    def test_pure_rotation_rejected(self):
        # No parallax: initialization must NOT succeed.
        rng = np.random.default_rng(3)
        pts = jnp.asarray(
            np.c_[rng.uniform(-1.5, 1.5, (100, 2)), rng.uniform(3, 6, 100)],
            jnp.float32,
        )
        T2 = SE3(so3.exp(jnp.asarray([0.0, 0.06, 0.01], jnp.float32)), jnp.zeros(3))
        p1 = project(pts, SE3.identity())
        p2 = project(pts, T2)
        out = init.initialize_two_view(
            p1, p2, jnp.ones(100, bool), jnp.asarray(K), jax.random.key(0)
        )
        assert not bool(out.success)

    def test_outlier_contamination(self):
        pts, T2, p1, p2 = make_pair(planar=False, n=150)
        rng = np.random.default_rng(4)
        # 30% random wrong correspondences.
        bad = rng.choice(150, 45, replace=False)
        p2 = p2.at[bad].set(
            jnp.asarray(rng.uniform(0, 320, (45, 2)), jnp.float32)
        )
        out = init.initialize_two_view(
            p1, p2, jnp.ones(150, bool), jnp.asarray(K), jax.random.key(2)
        )
        assert bool(out.success)
        t_err = angle_between(np.asarray(out.T21.t), np.asarray(T2.t))
        # Translation direction under 30% contamination + 0.5 px noise
        # carries a ~0.1 rad statistical floor at this baseline/FOV.
        assert t_err < 0.15, t_err
        # Outliers must not be marked good.
        good = np.asarray(out.good)
        assert good[bad].mean() < 0.1

    def test_jit(self):
        pts, T2, p1, p2 = make_pair(planar=False)
        f = jax.jit(
            lambda a, b, m, k: init.initialize_two_view(a, b, m, jnp.asarray(K), k)
        )
        out = f(p1, p2, jnp.ones(p1.shape[0], bool), jax.random.key(0))
        assert bool(out.success)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
