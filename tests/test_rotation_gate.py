"""Rotation-consistency gating in the matchers (Matcher.cpp:294-336's
ComputeThreeMaxima histogram): matches whose ORB-angle delta falls off
the dominant rotation modes are rejected even when descriptors agree.
Round 1 implemented the gate (ops/hamming.rotation_consistency) but no
matcher called it; these tests cover the wired consumers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models.local_mapping import (
    match_new_features_for_triangulation,
)
from ygz_slam_tpu.models.orb_tracking import match_by_projection
from ygz_slam_tpu.models.frontend import Features
from ygz_slam_tpu.ops import hamming

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)


def random_desc(rng, n):
    return jnp.asarray(
        rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)
    )


class TestTriangulationRotationGate:
    def test_rotated_outliers_rejected(self):
        """Two views of the same 3D points, identical descriptors (so
        Hamming matches everything), geometrically valid — but 20% of
        the pairs carry a deviant angle delta.  Only the rotation gate
        can reject them, and it must."""
        rng = np.random.default_rng(0)
        N = 64
        pts = jnp.asarray(
            rng.uniform([-1.0, -0.8, 2.5], [1.0, 0.8, 4.0], (N, 3)),
            jnp.float32,
        )
        T_ref = SE3.identity()
        T_new = se3.exp(jnp.asarray([0.25, 0.02, 0.0, 0.0, -0.05, 0.0],
                                    jnp.float32))
        px_ref = CAM.world_to_pixel(pts, T_ref)
        px_new = CAM.world_to_pixel(pts, T_new)
        desc = random_desc(rng, N)
        valid = jnp.ones(N, bool)
        # Consistent global rotation delta of 0.3 rad, except outliers.
        angle_ref = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
        angle_new = angle_ref + 0.3
        outlier = np.zeros(N, bool)
        outlier[rng.choice(N, N // 5, replace=False)] = True
        # Outlier deltas scatter uniformly (mismatches have random
        # relative orientation); a margin keeps them out of the
        # dominant mode's bin.
        angle_new = jnp.where(
            jnp.asarray(outlier),
            angle_ref + jnp.asarray(
                rng.uniform(0.8, 2 * np.pi - 0.5, N), jnp.float32
            ),
            angle_new,
        )
        _, good_gated, idx = match_new_features_for_triangulation(
            CAM, desc, px_new, valid, T_new, desc, px_ref, valid, T_ref,
            angle_new=angle_new, angle_ref=angle_ref,
        )
        _, good_ungated, _ = match_new_features_for_triangulation(
            CAM, desc, px_new, valid, T_new, desc, px_ref, valid, T_ref,
        )
        g_gated = np.asarray(good_gated)
        g_un = np.asarray(good_ungated)
        # Ungated: outliers pass (they are geometrically consistent).
        assert g_un[outlier].sum() > 0
        # Gated: every rotated outlier rejected; inliers survive.
        assert g_gated[outlier].sum() == 0, "rotated outliers survived"
        assert g_gated[~outlier].sum() >= 0.9 * g_un[~outlier].sum()


class TestProjectionRotationGate:
    def test_orb_projection_matching_rejects_rotated(self):
        rng = np.random.default_rng(1)
        L = 48
        pts = jnp.asarray(
            rng.uniform([-1.0, -0.8, 2.5], [1.0, 0.8, 4.0], (L, 3)),
            jnp.float32,
        )
        T = SE3.identity()
        px = CAM.world_to_pixel(pts, T)
        desc = random_desc(rng, L)
        pt_angle = jnp.asarray(rng.uniform(0, 2 * np.pi, L), jnp.float32)
        feat_angle = pt_angle + 0.2
        outlier = np.zeros(L, bool)
        outlier[rng.choice(L, L // 4, replace=False)] = True
        feat_angle = jnp.where(
            jnp.asarray(outlier),
            pt_angle + jnp.asarray(
                rng.uniform(0.7, 2 * np.pi - 0.5, L), jnp.float32
            ),
            feat_angle,
        )
        feats = Features(
            px=px, level=jnp.zeros(L, jnp.int32),
            score=jnp.ones(L), angle=feat_angle, desc=desc,
            depth=jnp.full(L, -1.0), valid=jnp.ones(L, bool),
        )
        m_gated, _, _ = match_by_projection(
            CAM, T, pts, jnp.ones(L, bool), desc, feats,
            pt_angle=pt_angle,
        )
        m_ungated, _, _ = match_by_projection(
            CAM, T, pts, jnp.ones(L, bool), desc, feats,
        )
        mg, mu = np.asarray(m_gated), np.asarray(m_ungated)
        assert mu[outlier].sum() > 0
        assert mg[outlier].sum() == 0, "rotated outliers survived"
        assert mg[~outlier].sum() >= 0.9 * mu[~outlier].sum()


class TestHistogramUnit:
    def test_three_maxima_semantics(self):
        """Mixed-mode population: the three dominant bins stay, the
        rest go (ComputeThreeMaxima keeps 3 of 30 bins)."""
        rng = np.random.default_rng(2)
        N = 300
        a = jnp.zeros(N, jnp.float32)
        deltas = np.where(
            np.arange(N) < 240, 0.5,
            rng.uniform(0, 2 * np.pi, N),  # uniform noise tail
        )
        b = -jnp.asarray(deltas, jnp.float32)
        keep = hamming.rotation_consistency(a, b, jnp.ones(N, bool))
        keep = np.asarray(keep)
        assert keep[:240].all(), "dominant-mode matches were dropped"
        assert keep[240:].sum() < 30, "noise tail mostly survives"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
