"""Unit tests for local-mapping primitives, focused on
search_in_neighbors' masking invariants (review findings: no
re-linking of observed landmarks, 1:1 links, ratio gating)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import PinholeCamera, SE3
from ygz_slam_tpu.map import state as ms
from ygz_slam_tpu.models import local_mapping as lm

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)


def base_map(K=4, F=16, L=50):
    m = ms.empty_map(K, F, L)
    return m._replace(kf_valid=m.kf_valid.at[0].set(True))


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


class TestSearchInNeighbors:
    def test_links_matching_feature(self):
        rng = np.random.default_rng(0)
        m = base_map()
        d = rand_desc(rng, 1)
        m = ms.add_landmarks(m, jnp.array([0]), jnp.array([True]),
                             jnp.array([[0.0, 0.0, 3.0]]), d, 0)
        m = m._replace(
            feat_px=m.feat_px.at[0, 0].set(jnp.array([160.0, 120.0])),
            feat_desc=m.feat_desc.at[0, 0].set(d[0]),
            feat_valid=m.feat_valid.at[0, 0].set(True),
        )
        out = lm.search_in_neighbors(m, CAM, 0)
        assert int(out.feat_point[0, 0]) == 0
        assert abs(float(out.feat_depth[0, 0]) - 3.0) < 1e-5

    def test_does_not_relink_observed_landmark(self):
        rng = np.random.default_rng(1)
        m = base_map()
        d = rand_desc(rng, 1)
        m = ms.add_landmarks(m, jnp.array([0]), jnp.array([True]),
                             jnp.array([[0.0, 0.0, 3.0]]), d, 0)
        # Feature 0 already observes landmark 0; feature 1 is free with
        # an identical descriptor at the same projection.
        m = m._replace(
            feat_px=m.feat_px.at[0, 0].set(jnp.array([160.0, 120.0]))
                         .at[0, 1].set(jnp.array([160.0, 120.0])),
            feat_desc=m.feat_desc.at[0, 0].set(d[0]).at[0, 1].set(d[0]),
            feat_valid=m.feat_valid.at[0, 0].set(True).at[0, 1].set(True),
            feat_point=m.feat_point.at[0, 0].set(0),
        )
        out = lm.search_in_neighbors(m, CAM, 0)
        # Landmark 0 must NOT gain a second same-keyframe observation.
        assert int(out.feat_point[0, 1]) == -1

    def test_one_link_per_landmark(self):
        rng = np.random.default_rng(2)
        m = base_map()
        d = rand_desc(rng, 1)
        m = ms.add_landmarks(m, jnp.array([0]), jnp.array([True]),
                             jnp.array([[0.0, 0.0, 3.0]]), d, 0)
        # Two free features, both near the projection with the same
        # descriptor: at most one may link (reverse-argmin uniqueness).
        m = m._replace(
            feat_px=m.feat_px.at[0, 0].set(jnp.array([159.0, 120.0]))
                         .at[0, 1].set(jnp.array([161.0, 120.0])),
            feat_desc=m.feat_desc.at[0, 0].set(d[0]).at[0, 1].set(d[0]),
            feat_valid=m.feat_valid.at[0, 0].set(True).at[0, 1].set(True),
        )
        out = lm.search_in_neighbors(m, CAM, 0)
        linked = [int(out.feat_point[0, i]) for i in (0, 1)]
        assert linked.count(0) <= 1, linked

    def test_far_or_dissimilar_not_linked(self):
        rng = np.random.default_rng(3)
        m = base_map()
        d = rand_desc(rng, 2)
        m = ms.add_landmarks(m, jnp.array([0]), jnp.array([True]),
                             jnp.array([[0.0, 0.0, 3.0]]), d[:1], 0)
        m = m._replace(
            # Feature far from the projection (radius gate).
            feat_px=m.feat_px.at[0, 0].set(jnp.array([40.0, 40.0]))
                         # Feature at the projection, wrong descriptor.
                         .at[0, 1].set(jnp.array([160.0, 120.0])),
            feat_desc=m.feat_desc.at[0, 0].set(d[0]).at[0, 1].set(d[1]),
            feat_valid=m.feat_valid.at[0, 0].set(True).at[0, 1].set(True),
        )
        out = lm.search_in_neighbors(m, CAM, 0)
        assert int(out.feat_point[0, 0]) == -1
        assert int(out.feat_point[0, 1]) == -1

    def test_behind_camera_excluded(self):
        rng = np.random.default_rng(4)
        m = base_map()
        d = rand_desc(rng, 1)
        m = ms.add_landmarks(m, jnp.array([0]), jnp.array([True]),
                             jnp.array([[0.0, 0.0, -3.0]]), d, 0)
        m = m._replace(
            feat_px=m.feat_px.at[0, 0].set(jnp.array([160.0, 120.0])),
            feat_desc=m.feat_desc.at[0, 0].set(d[0]),
            feat_valid=m.feat_valid.at[0, 0].set(True),
        )
        out = lm.search_in_neighbors(m, CAM, 0)
        assert int(out.feat_point[0, 0]) == -1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
