"""Native host-runtime tests: C++ results must match the NumPy
fallbacks exactly, and the library must build in this image."""
import numpy as np
import pytest

from ygz_slam_tpu import native


class TestNative:
    def test_builds(self):
        assert native.available(), "native library failed to build"

    def test_alloc_prefers_free(self):
        used = np.array([1, 0, 1, 1], np.uint8)
        cov = np.zeros((4, 4), np.int32)
        slot, ev = native.alloc_kf_slot(used, cov, 0, 3)
        assert slot == 1 and not ev

    def test_alloc_evicts_least_covisible(self):
        used = np.ones(4, np.uint8)
        cov = np.array([
            [0, 5, 1, 9],
            [5, 0, 2, 3],
            [1, 2, 0, 4],
            [9, 3, 4, 0],
        ], np.int32)
        # ref=0, newest=3 -> candidates 1 (w=5), 2 (w=1) -> evict 2.
        slot, ev = native.alloc_kf_slot(used, cov, 0, 3)
        assert slot == 2 and ev

    def test_free_rows(self):
        valid = np.array([1, 1, 0, 1, 0, 0], np.uint8)
        rows = native.free_rows(valid, 2)
        np.testing.assert_array_equal(rows, [2, 4])

    def test_partition_matches_fallback(self):
        rng = np.random.default_rng(0)
        O, L, S = 500, 64, 8
        kf = rng.integers(0, 6, O).astype(np.int32)
        pt = rng.integers(0, L, O).astype(np.int32)
        px = rng.uniform(0, 640, (O, 2)).astype(np.float32)
        mask = rng.uniform(size=O) > 0.2
        out = native.partition_obs(kf, pt, px, mask, L, S)
        assert out is not None
        out_kf, out_pt, out_px, out_mask, o_shard = out
        # Every valid input row appears exactly once in the right shard.
        Ls = L // S
        seen = 0
        for s in range(S):
            blk = slice(s * o_shard, (s + 1) * o_shard)
            m = out_mask[blk]
            seen += m.sum()
            gpt = out_pt[blk][m] + s * Ls
            assert (gpt // Ls == s).all()
        assert seen == mask.sum()

    def test_kf_redundancy(self):
        K, F, L = 3, 4, 10
        feat_point = np.full((K, F), -1, np.int32)
        feat_valid = np.zeros((K, F), np.uint8)
        feat_point[0] = [0, 1, 2, 3]
        feat_valid[0] = 1
        pt_obs = np.zeros(L, np.int32)
        pt_obs[[0, 1]] = 5  # two of kf0's landmarks are redundant
        out = native.kf_redundancy(feat_point, feat_valid, pt_obs, min_obs=4)
        np.testing.assert_allclose(out, [0.5, 0.0, 0.0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestScaleAwareRedundancy:
    def test_finer_or_equal_level_rule(self):
        """A fine-level observation is NOT redundant when the other
        observers are coarser; a coarse observation IS when they are
        finer (LocalMapping.cpp:592-607 with +1 level slack)."""
        import numpy as np
        from ygz_slam_tpu import native

        K, F, L = 4, 4, 8
        fp = np.full((K, F), -1, np.int32)
        fv = np.zeros((K, F), np.uint8)
        fl = np.zeros((K, F), np.int32)
        for k in range(4):
            fp[k, 0] = 0; fv[k, 0] = 1; fl[k, 0] = 2 if k == 0 else 0
            fp[k, 1] = 1; fv[k, 1] = 1; fl[k, 1] = 0 if k == 0 else 2
        out = native.kf_redundancy_scale(fp, fv, fl, L=L, min_obs=4)
        # KF0: lm0 at level 2 (others finer -> redundant), lm1 at
        # level 0 (others coarser -> kept) => score 0.5.
        np.testing.assert_allclose(out, 0.5, atol=1e-6)
        # Old level-blind rule would call everything redundant.
        pt_obs = np.zeros(L, np.int32); pt_obs[:2] = 4
        old = native.kf_redundancy(fp, fv, pt_obs, min_obs=4)
        np.testing.assert_allclose(old, 1.0, atol=1e-6)

    def test_numpy_fallback_parity(self):
        import numpy as np
        import ygz_slam_tpu.native as nat

        rng = np.random.default_rng(0)
        K, F, L = 6, 32, 64
        fp = rng.integers(-1, L, (K, F)).astype(np.int32)
        fv = (rng.random((K, F)) < 0.8).astype(np.uint8)
        fl = rng.integers(0, 3, (K, F)).astype(np.int32)
        a = nat.kf_redundancy_scale(fp, fv, fl, L=L, min_obs=3)
        lib = nat._LIB
        nat._LIB = None
        try:
            b = nat.kf_redundancy_scale(fp, fv, fl, L=L, min_obs=3)
        finally:
            nat._LIB = lib
        np.testing.assert_allclose(a, b, atol=1e-6)
