"""P3P + RANSAC-PnP tests (pose-prior-free relocalization core).

The reference's relocalization slot is an empty TODO
(src/Module/VisualOdometry.cpp:101-104); the minimal-solver RANSAC here
is its intended recipe, built TPU-native: closed-form quartic (no
eigendecomposition), vmapped Grunert P3P, one batched scoring pass.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.solvers import pnp
from ygz_slam_tpu.solvers.quartic import quartic_roots, real_roots_mask

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)


class TestQuartic:
    def test_random_quartics_vs_numpy(self):
        rng = np.random.default_rng(0)
        N = 200
        cs = rng.normal(0, 2, (N, 5)).astype(np.float32)
        cs[:, 0] = np.where(np.abs(cs[:, 0]) < 0.1, 1.0, cs[:, 0])
        roots = np.asarray(quartic_roots(
            cs[:, 0], cs[:, 1], cs[:, 2], cs[:, 3], cs[:, 4]))
        worst = 0.0
        for i in range(N):
            ref = list(np.roots(cs[i].astype(np.float64)))
            for g in roots[i].astype(np.complex128):
                j = int(np.argmin(np.abs(np.asarray(ref) - g)))
                worst = max(worst,
                            abs(ref[j] - g) / max(1.0, abs(ref[j])))
                ref.pop(j)
        assert worst < 1e-3, worst

    def test_four_real_roots(self):
        rng = np.random.default_rng(1)
        r = rng.normal(0, 2, (100, 4))
        cs = np.stack([np.poly(ri) for ri in r]).astype(np.float32)
        roots = quartic_roots(cs[:, 0], cs[:, 1], cs[:, 2],
                              cs[:, 3], cs[:, 4])
        assert bool(real_roots_mask(roots).all())
        got = np.sort(np.asarray(roots).real, axis=1)
        ref = np.sort(r, axis=1)
        rel = np.abs(got - ref).max(1) / np.maximum(
            1.0, np.abs(ref).max(1))
        assert rel.max() < 1e-3, rel.max()


class TestP3P:
    def test_exact_recovery_rate(self):
        """>=85% of random noise-free triples must recover the true
        pose among the (up to 4) returned solutions; f32 radical-tower
        misses act as a small RANSAC inlier-rate discount."""
        rng = np.random.default_rng(0)
        n_ok = 0
        for _ in range(100):
            T = se3.exp(jnp.asarray(
                rng.normal(0, 0.5, 6).astype(np.float32)))
            P = rng.uniform(-1.5, 1.5, (3, 3)).astype(np.float32)
            P[:, 2] += 4
            Pw = np.asarray(SE3(T.R, T.t).inverse().apply(jnp.asarray(P)))
            f = P / np.linalg.norm(P, axis=1, keepdims=True)
            R, t, ok = pnp.p3p(jnp.asarray(Pw)[None], jnp.asarray(f)[None])
            R, t, ok = np.asarray(R)[0], np.asarray(t)[0], np.asarray(ok)[0]
            best = np.inf
            for i in range(4):
                if ok[i]:
                    best = min(best, max(
                        np.abs(R[i] - np.asarray(T.R)).max(),
                        np.abs(t[i] - np.asarray(T.t)).max()))
            n_ok += bool(best < 1e-2)
        assert n_ok >= 85, n_ok

    def test_ransac_under_outliers(self):
        """60% outliers, no pose prior: RANSAC must find the pose."""
        rng = np.random.default_rng(3)
        T = se3.exp(jnp.asarray(
            [0.5, -0.3, 0.2, 0.4, -0.5, 0.3], jnp.float32))
        N = 120
        Pc = np.concatenate([rng.uniform(-2, 2, (N, 2)),
                             rng.uniform(2.5, 6, (N, 1))], 1
                            ).astype(np.float32)
        Pw = np.asarray(SE3(T.R, T.t).inverse().apply(jnp.asarray(Pc)))
        px = np.array(CAM.camera_to_pixel(jnp.asarray(Pc)))
        px += rng.normal(0, 0.5, px.shape)
        out = rng.random(N) < 0.6
        px[out] = rng.uniform([0, 0], [320, 240], (int(out.sum()), 2))
        res = pnp.ransac_pnp(
            jnp.asarray(Pw), jnp.asarray(px.astype(np.float32)),
            jnp.ones(N, bool), CAM, key=1)
        assert bool(res.ok)
        assert int(res.n_inliers) > 0.7 * int((~out).sum())
        assert float(jnp.abs(res.T_cw.R - T.R).max()) < 0.02
        assert float(jnp.abs(res.T_cw.t - T.t).max()) < 0.06
        # jittable
        res_j = jax.jit(lambda w, p, m: pnp.ransac_pnp(
            w, p, m, CAM, key=1))(
            jnp.asarray(Pw), jnp.asarray(px.astype(np.float32)),
            jnp.ones(N, bool))
        assert int(res_j.n_inliers) == int(res.n_inliers)

    def test_degenerate_inputs(self):
        """Empty masks and collinear triples must not NaN or crash."""
        N = 30
        Pw = jnp.zeros((N, 3)) + jnp.asarray([0.0, 0.0, 3.0])
        px = jnp.full((N, 2), 100.0)
        res = pnp.ransac_pnp(Pw, px, jnp.zeros(N, bool), CAM, key=0)
        assert not bool(res.ok)
        assert np.isfinite(np.asarray(res.T_cw.t)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
