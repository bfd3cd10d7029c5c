"""Distributed BA tests on the virtual 8-device CPU mesh.

Validates: (1) sharded BA reaches the same solution as the single-
device solver, (2) gauge fixing holds, (3) it runs under jit with real
shardings on all 8 devices.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.solvers import Observations, local_ba
from ygz_slam_tpu.parallel import (
    make_mesh, sharded_local_ba, partition_observations, LANDMARK_AXIS,
)
from jax.sharding import NamedSharding, PartitionSpec as P

CAM = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)


def make_problem(K=6, L=64, seed=0, px_noise=0.3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (L, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    pts = jnp.asarray(pts)
    Ts = []
    for k in range(K):
        w = rng.normal(size=3) * 0.03
        t = np.array([k * 0.15, 0, 0]) + rng.normal(size=3) * 0.02
        Ts.append(SE3(so3.exp(jnp.asarray(w, jnp.float32)),
                      jnp.asarray(t, jnp.float32)))
    poses = jax.tree.map(lambda *xs: jnp.stack(xs), *Ts)
    px = jax.vmap(lambda T: CAM.world_to_pixel(pts, T, distorted=False))(poses)
    kf_idx = np.repeat(np.arange(K, dtype=np.int32), L)
    pt_idx = np.tile(np.arange(L, dtype=np.int32), K)
    pxf = np.asarray(px).reshape(-1, 2) + rng.normal(0, px_noise, (K * L, 2)).astype(np.float32)
    mask = np.ones(K * L, bool)
    # Perturb state.
    xi = rng.normal(0, 0.02, (K, 6)).astype(np.float32)
    xi[:2] = 0
    noisy_poses = jax.vmap(se3.boxplus)(poses, jnp.asarray(xi))
    noisy_pts = pts + jnp.asarray(rng.normal(0, 0.05, pts.shape), jnp.float32)
    fixed = jnp.zeros(K, bool).at[0].set(True).at[1].set(True)
    return poses, pts, noisy_poses, noisy_pts, kf_idx, pt_idx, pxf, mask, fixed


class TestShardedBA:
    @pytest.mark.slow
    def test_matches_single_device(self):
        (poses, pts, noisy_poses, noisy_pts, kf_idx, pt_idx, pxf, mask,
         fixed) = make_problem()
        K, L = 6, 64
        # Single-device reference.
        obs1 = Observations(
            kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
            px=jnp.asarray(pxf), mask=jnp.asarray(mask),
        )
        res1 = local_ba(noisy_poses, noisy_pts, obs1, CAM, fixed, n_iter=12)
        # 8-way sharded.
        mesh = make_mesh(8)
        sobs, L_pad = partition_observations(kf_idx, pt_idx, pxf, mask, L, 8)
        pts_pad = jnp.concatenate(
            [noisy_pts, jnp.zeros((L_pad - L, 3))]
        )
        poses2, pts2, chi2 = sharded_local_ba(
            mesh, noisy_poses, pts_pad, sobs, CAM, fixed, n_iter=12
        )
        err1 = float(jax.vmap(se3.distance)(res1.poses, poses).mean())
        err2 = float(jax.vmap(se3.distance)(poses2, poses).mean())
        # Sharded solver must match the single-device solver.
        assert err2 < err1 * 1.1 + 1e-4, (err1, err2)
        pt1 = float(jnp.linalg.norm(res1.points - pts, axis=-1).mean())
        pt2 = float(jnp.linalg.norm(pts2[:L] - pts, axis=-1).mean())
        assert pt2 < pt1 * 1.1 + 1e-4, (pt1, pt2)

    def test_gauge_fixed_poses_unchanged(self):
        (poses, pts, noisy_poses, noisy_pts, kf_idx, pt_idx, pxf, mask,
         fixed) = make_problem()
        L = 64
        mesh = make_mesh(8)
        sobs, L_pad = partition_observations(kf_idx, pt_idx, pxf, mask, L, 8)
        pts_pad = jnp.concatenate([noisy_pts, jnp.zeros((L_pad - L, 3))])
        poses2, _, _ = sharded_local_ba(
            mesh, noisy_poses, pts_pad, sobs, CAM, fixed, n_iter=8
        )
        for s in range(2):
            d = float(se3.distance(
                jax.tree.map(lambda a: a[s], poses2),
                jax.tree.map(lambda a: a[s], noisy_poses),
            ))
            assert d < 1e-6, d

    def test_runs_with_explicit_shardings(self):
        (poses, pts, noisy_poses, noisy_pts, kf_idx, pt_idx, pxf, mask,
         fixed) = make_problem()
        L = 64
        mesh = make_mesh(8)
        sobs, L_pad = partition_observations(kf_idx, pt_idx, pxf, mask, L, 8)
        sh = NamedSharding(mesh, P(LANDMARK_AXIS))
        pts_pad = jax.device_put(
            jnp.concatenate([noisy_pts, jnp.zeros((L_pad - L, 3))]), sh
        )
        sobs = jax.tree.map(lambda a: jax.device_put(a, sh), sobs)
        poses2, pts2, chi2 = sharded_local_ba(
            mesh, noisy_poses, pts_pad, sobs, CAM, fixed, n_iter=6
        )
        # Output landmark shard stays sharded.
        assert len(pts2.sharding.device_set) == 8
        assert jnp.isfinite(chi2)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestTwoDMesh:
    def test_2d_host_chip_mesh_matches_1d(self):
        """2-D (host, chip) mesh — the DCN story: landmarks flatten
        over both axes, the camera-system psum reduces hierarchically.
        Result must match the 1-D mesh solve on the same problem."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ygz_slam_tpu.geometry import SE3, PinholeCamera, so3
        from ygz_slam_tpu.parallel import (
            make_mesh, make_mesh_2d, sharded_local_ba,
            partition_observations, LANDMARK_AXIS, HOST_AXIS,
        )

        rng = np.random.default_rng(0)
        K, L = 4, 32
        cam = PinholeCamera.create(100.0, 100.0, 64.0, 48.0)
        pts = np.c_[rng.uniform(-1, 1, (L, 2)),
                    rng.uniform(3, 5, L)].astype(np.float32)
        poses = []
        for k in range(K):
            poses.append(SE3(
                so3.exp(jnp.asarray(rng.normal(size=3) * 0.02,
                                    jnp.float32)),
                jnp.asarray([0.1 * k, 0, 0], jnp.float32),
            ))
        poses = jax.tree.map(lambda *xs: jnp.stack(xs), *poses)
        pts_j = jnp.asarray(pts)
        px = jax.vmap(
            lambda T: cam.world_to_pixel(pts_j, T, distorted=False)
        )(poses)
        kf_idx = np.repeat(np.arange(K, dtype=np.int32), L)
        pt_idx = np.tile(np.arange(L, dtype=np.int32), K)
        pxf = np.asarray(px).reshape(-1, 2)
        pxf = pxf + rng.normal(0, 0.2, pxf.shape).astype(np.float32)
        mask = np.ones(K * L, bool)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        noisy = pts_j + jnp.asarray(
            rng.normal(0, 0.02, pts.shape), jnp.float32
        )

        def solve(mesh, spec_axes):
            n_dev = int(np.prod(mesh.devices.shape))
            sobs, L_pad = partition_observations(
                kf_idx, pt_idx, pxf, mask, L, n_dev
            )
            sh = NamedSharding(mesh, P(spec_axes))
            pts_s = jax.device_put(jnp.concatenate(
                [noisy, jnp.zeros((L_pad - L, 3))]
            ), sh)
            sobs = jax.tree.map(lambda a: jax.device_put(a, sh), sobs)
            p, x, chi2 = jax.jit(
                lambda p, x, o: sharded_local_ba(
                    mesh, p, x, o, cam, fixed, n_iter=4
                )
            )(poses, pts_s, sobs)
            return np.asarray(p.params7()), np.asarray(x)[:L], float(chi2)

        mesh1 = make_mesh(8)
        p1, x1, c1 = solve(mesh1, LANDMARK_AXIS)
        mesh2 = make_mesh_2d(2, 4)
        p2, x2, c2 = solve(mesh2, (HOST_AXIS, LANDMARK_AXIS))
        np.testing.assert_allclose(p1, p2, atol=1e-5)
        np.testing.assert_allclose(x1, x2, atol=1e-4)
        assert abs(c1 - c2) < 1e-2 * max(abs(c1), 1.0)
