"""Geometry core tests: SO3/SE3 group axioms, camera round-trips,
triangulation against analytic ground truth.

Methodology follows the reference's simulation-fixture style
(test/test_initializer.cpp, test/test_local_ba.cpp): known ground
truth, generated observations, assert recovery — but with proper
assertions instead of printed logs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import so3, se3, jacobians, triangulation
from ygz_slam_tpu.geometry import SE3, PinholeCamera

class _RNG:
    """Fresh deterministic generator per access so test order can't
    change which samples a test sees."""

    def __getattr__(self, name):
        return getattr(np.random.default_rng(0), name)


RNG = _RNG()


def random_tangent(n, scale=1.0, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = random_tangent(64, scale=0.8)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_exp_small_angle(self):
        w = random_tangent(16, scale=1e-6)
        R = so3.exp(w)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
        np.testing.assert_allclose(so3.log(R), w, atol=1e-7)

    def test_orthonormal(self):
        R = so3.exp(random_tangent(32, 2.0))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_near_pi(self):
        axis = np.array([1.0, -2.0, 0.5])
        axis /= np.linalg.norm(axis)
        theta = np.pi - 1e-5
        w = jnp.asarray(axis * theta, dtype=jnp.float32)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.abs(w), np.abs(np.asarray(w2)), atol=1e-3)

    def test_quaternion_roundtrip(self):
        R = so3.exp(random_tangent(64, 2.5))
        R2 = so3.from_quaternion(so3.to_quaternion(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_hat_vee(self):
        w = random_tangent(8)
        np.testing.assert_allclose(so3.vee(so3.hat(w)), w)


class TestSE3:
    def rand(self, n=16, rot=1.0, trans=2.0):
        return SE3(
            so3.exp(random_tangent(n, rot)),
            jnp.asarray(RNG.normal(size=(n, 3)) * trans, dtype=jnp.float32),
        )

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(64, 6)) * 0.7, dtype=jnp.float32)
        xi2 = se3.log(se3.exp(xi))
        np.testing.assert_allclose(xi, xi2, atol=3e-5)

    def test_compose_inverse(self):
        T = self.rand()
        I = T.compose(T.inverse())
        np.testing.assert_allclose(I.R, np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5)
        np.testing.assert_allclose(I.t, 0.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        T = self.rand(4)
        x = jnp.asarray(RNG.normal(size=(4, 3)), dtype=jnp.float32)
        xh = jnp.concatenate([x, jnp.ones((4, 1))], axis=-1)
        y_mat = jnp.einsum("bij,bj->bi", T.matrix(), xh)[..., :3]
        np.testing.assert_allclose(T.apply(x), y_mat, atol=1e-5)

    def test_boxplus_left_multiplicative(self):
        T = self.rand(4)
        xi = jnp.asarray(RNG.normal(size=(4, 6)) * 0.1, dtype=jnp.float32)
        T2 = se3.boxplus(T, xi)
        expected = se3.exp(xi).compose(T)
        np.testing.assert_allclose(T2.R, expected.R, atol=1e-6)

    def test_params7_roundtrip(self):
        T = self.rand(16)
        T2 = SE3.from_params7(T.params7())
        np.testing.assert_allclose(T.R, T2.R, atol=1e-5)
        np.testing.assert_allclose(T.t, T2.t, atol=1e-5)

    def test_distance_zero(self):
        T = self.rand(4)
        np.testing.assert_allclose(se3.distance(T, T), 0.0, atol=1e-4)


class TestCamera:
    def cam(self):
        # TUM fr1 intrinsics (config/default.yaml-style values).
        return PinholeCamera.create(517.3, 516.5, 325.1, 249.7, 0.2624, -0.9531, -0.0054, 0.0026)

    def test_project_unproject_no_distortion(self):
        cam = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)
        pc = jnp.asarray(RNG.uniform(0.5, 5.0, size=(32, 3)), dtype=jnp.float32)
        pc = pc.at[:, :2].add(-2.0)
        px = cam.camera_to_pixel(pc)
        pc2 = cam.pixel_to_camera(px, depth=pc[:, 2])
        np.testing.assert_allclose(pc, pc2, rtol=1e-4, atol=1e-3)

    def test_distort_undistort_roundtrip(self):
        cam = self.cam()
        xn = jnp.asarray(RNG.uniform(-0.3, 0.3, size=(64, 2)), dtype=jnp.float32)
        xn2 = cam.undistort(cam.distort(xn))
        np.testing.assert_allclose(xn, xn2, atol=1e-4)

    def test_world_pixel_roundtrip(self):
        cam = self.cam()
        T_cw = SE3(so3.exp(jnp.array([0.1, -0.2, 0.05])), jnp.array([0.3, 0.1, -0.2]))
        # Keep points well inside the FOV: the fr1 distortion model
        # (k2 = -0.95) is only invertible for moderate normalized radii.
        pw = jnp.asarray(RNG.uniform(-0.6, 0.6, size=(16, 3)), dtype=jnp.float32)
        pw = pw.at[:, 2].add(4.0)
        px = cam.world_to_pixel(pw, T_cw)
        depth = T_cw.apply(pw)[:, 2]
        pw2 = cam.pixel_to_world(px, T_cw, depth=depth)
        np.testing.assert_allclose(pw, pw2, rtol=1e-3, atol=2e-3)

    def test_in_frame(self):
        cam = self.cam()
        px = jnp.array([[10.0, 10.0], [-1.0, 5.0], [639.0, 479.0], [635.0, 100.0]])
        mask = cam.in_frame(px, 640, 480, boundary=20)
        np.testing.assert_array_equal(mask, [False, False, False, False])
        mask2 = cam.in_frame(px, 640, 480, boundary=0)
        np.testing.assert_array_equal(mask2, [True, False, True, True])


class TestJacobians:
    def test_duv_dxi_matches_autodiff(self):
        fx, fy = 500.0, 520.0

        def project(xi, pc):
            pcp = se3.exp(xi).apply(pc)
            return jnp.stack(
                [fx * pcp[0] / pcp[2], fy * pcp[1] / pcp[2]], axis=-1
            )

        pc = jnp.array([0.3, -0.2, 2.5])
        J_auto = jax.jacobian(project)(jnp.zeros(6), pc)
        J_analytic = jacobians.duv_dxi(pc, fx, fy)
        np.testing.assert_allclose(J_auto, J_analytic, atol=1e-3, rtol=1e-4)

    def test_duv_dpoint_matches_autodiff(self):
        fx, fy = 500.0, 520.0
        T = SE3(so3.exp(jnp.array([0.2, 0.1, -0.3])), jnp.array([0.5, -0.2, 0.1]))

        def project(pw):
            pc = T.apply(pw)
            return jnp.stack([fx * pc[0] / pc[2], fy * pc[1] / pc[2]], axis=-1)

        pw = jnp.array([0.4, 0.3, 3.0])
        J_auto = jax.jacobian(project)(pw)
        J_analytic = jacobians.duv_dpoint(T.apply(pw), T.R, fx, fy)
        np.testing.assert_allclose(J_auto, J_analytic, atol=1e-3, rtol=1e-4)


class TestTriangulation:
    def test_depth_from_triangulation(self):
        # Ground-truth 3D points in ref frame; second camera translated.
        pts = jnp.asarray(RNG.uniform(-1, 1, size=(32, 3)), dtype=jnp.float32)
        pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 2.0)
        T_cur_ref = SE3(
            so3.exp(jnp.array([0.02, -0.03, 0.01])), jnp.array([0.3, 0.0, 0.0])
        )
        f_ref = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        pc = T_cur_ref.apply(pts)
        f_cur = pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)
        depth, ok = triangulation.depth_from_triangulation(T_cur_ref, f_ref, f_cur)
        assert bool(jnp.all(ok))
        gt_depth = jnp.linalg.norm(pts, axis=-1)
        np.testing.assert_allclose(depth, gt_depth, rtol=1e-3)

    def test_triangulate_dlt(self):
        cam = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)
        pts = jnp.asarray(RNG.uniform(-1, 1, size=(16, 3)), dtype=jnp.float32)
        pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 3.0)
        T1 = SE3.identity()
        T2 = SE3(so3.exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([0.4, 0.0, 0.0]))
        K = cam.K
        P1 = K @ T1.matrix()[:3]
        P2 = K @ T2.matrix()[:3]
        x1 = cam.world_to_pixel(pts, T1, distorted=False)
        x2 = cam.world_to_pixel(pts, T2, distorted=False)
        X = triangulation.triangulate_dlt(P1, P2, x1, x2)
        np.testing.assert_allclose(X, pts, rtol=1e-2, atol=2e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
