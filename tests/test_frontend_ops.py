"""Front-end kernel tests: pyramid vs OpenCV pyrDown, FAST vs OpenCV
FAST, Shi-Tomasi sanity, ORB angle behavior, Hamming matcher.

The reference validates its detector against OpenCV ORB on TUM frames
(test/test_feature_extraction.cpp:58-60); here OpenCV is the golden
implementation on synthetic textured images (no dataset dependency).
"""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.ops import pyramid, fast, orb, hamming, interp


def checkerboard_scene(h=240, w=320, seed=0):
    """Textured synthetic image: random blobs + corners, uint8."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(80, 120, size=(h, w)).astype(np.float32)
    # Add strong corner structures.
    for _ in range(40):
        y, x = rng.integers(20, h - 30), rng.integers(20, w - 30)
        s = rng.integers(6, 18)
        img[y : y + s, x : x + s] += rng.uniform(60, 120)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return np.clip(img, 0, 255).astype(np.uint8)


IMG = checkerboard_scene()


class TestPyramid:
    def test_matches_opencv_pyrdown(self):
        ours = pyramid.pyr_down(jnp.asarray(IMG, jnp.float32))
        theirs = cv2.pyrDown(IMG).astype(np.float32)
        # OpenCV reflects borders, we replicate: compare interior.
        a = np.asarray(ours)[2:-2, 2:-2]
        b = theirs[2:-2, 2:-2]
        assert np.abs(a - b).max() < 1.0, np.abs(a - b).max()

    def test_levels_shapes(self):
        pyr = pyramid.build_pyramid(jnp.asarray(IMG, jnp.float32), 3)
        assert pyr[0].shape == (240, 320)
        assert pyr[1].shape == (120, 160)
        assert pyr[2].shape == (60, 80)


class TestFAST:
    def test_against_opencv_fast(self):
        th = 20
        ours = np.asarray(fast.fast_score_map(jnp.asarray(IMG, jnp.float32), th, arc_length=10))
        # OpenCV TYPE_9_16 is FAST-9; use it as a superset check: every
        # FAST-10 corner of ours must be an OpenCV FAST-9 corner.
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
        )
        kps = det.detect(IMG)
        cv_mask = np.zeros(IMG.shape, bool)
        for kp in kps:
            cv_mask[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
        ours_idx = np.argwhere(ours)
        assert len(ours_idx) > 20, "too few corners detected"
        contained = cv_mask[ours[:, :]].mean() if ours.any() else 0
        frac = cv_mask[ours].mean()
        assert frac > 0.99, f"only {frac:.2%} of our FAST-10 corners are OpenCV FAST-9 corners"

    def test_fast9_matches_opencv_exactly(self):
        th = 20
        ours = np.asarray(fast.fast_score_map(jnp.asarray(IMG, jnp.float32), th, arc_length=9))
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
        )
        kps = det.detect(IMG)
        cv_mask = np.zeros(IMG.shape, bool)
        for kp in kps:
            cv_mask[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
        # Ignore the 3px border (OpenCV also skips it).
        b = fast.BORDER
        a = ours[b:-b, b:-b]
        c = cv_mask[b:-b, b:-b]
        agree = (a == c).mean()
        assert agree > 0.999, f"FAST-9 agreement {agree:.4%}"

    def test_grid_select_capacity_and_spread(self):
        c = fast.detect(jnp.asarray(IMG, jnp.float32), 20.0, cell=16, max_corners=128)
        n = int(c.mask.sum())
        assert 20 < n <= 128
        xy = np.asarray(c.xy[np.asarray(c.mask)])
        # One corner per cell -> no two corners share a cell.
        cells = {(int(x // 16), int(y // 16)) for x, y in xy}
        assert len(cells) == n

    def test_shi_tomasi_matches_reference_formula(self):
        # Golden scalar reimplementation of ShiTomasiScore at a few pixels.
        img = IMG.astype(np.float32)
        smap = np.asarray(fast.shi_tomasi_map(jnp.asarray(img)))

        def golden(u, v):
            h = 4
            dxx = dyy = dxy = 0.0
            for y in range(v - h, v + h):
                for x in range(u - h, u + h):
                    dx = img[y, x + 1] - img[y, x - 1]
                    dy = img[y + 1, x] - img[y - 1, x]
                    dxx += dx * dx
                    dyy += dy * dy
                    dxy += dx * dy
            area = (2 * h) ** 2
            dxx /= 2 * area
            dyy /= 2 * area
            dxy /= 2 * area
            tr = dxx + dyy
            return 0.5 * (tr - np.sqrt(max(tr * tr - 4 * (dxx * dyy - dxy * dxy), 0)))

        for (u, v) in [(50, 60), (100, 100), (200, 150), (31, 41)]:
            np.testing.assert_allclose(smap[v, u], golden(u, v), rtol=1e-3, atol=1e-2)


class TestORB:
    def test_angle_rotation_equivariance(self):
        # Rotating the image must shift IC angles accordingly.
        img = IMG.astype(np.float32)
        center = (160, 120)
        rot_deg = 30.0
        M = cv2.getRotationMatrix2D(center, rot_deg, 1.0)
        rot = cv2.warpAffine(img, M, (320, 240))
        # A strong corner away from borders.
        c = fast.detect(jnp.asarray(img), 20.0, cell=16, max_corners=64)
        xy = np.asarray(c.xy[np.asarray(c.mask)])
        # Keep points that stay inside after rotation.
        ones = np.ones((len(xy), 1))
        xy_rot = (np.hstack([xy, ones]) @ M.T)[:, :2]
        keep = (
            (xy_rot[:, 0] > 40) & (xy_rot[:, 0] < 280)
            & (xy_rot[:, 1] > 40) & (xy_rot[:, 1] < 200)
            & (xy[:, 0] > 40) & (xy[:, 0] < 280)
            & (xy[:, 1] > 40) & (xy[:, 1] < 200)
        )
        xy, xy_rot = xy[keep][:20], xy_rot[keep][:20]
        a0, _ = orb.compute(jnp.asarray(img), jnp.asarray(xy, jnp.float32))
        a1, _ = orb.compute(jnp.asarray(rot), jnp.asarray(xy_rot, jnp.float32))
        # Image rotated by -30deg in pixel coords (y down): angles shift.
        diff = np.mod(np.asarray(a0 - a1) + np.pi, 2 * np.pi) - np.pi
        # getRotationMatrix2D's +30deg is clockwise in y-down image
        # coords, so IC angles shift by -30deg: a0 - a1 = +30deg.
        expected = np.deg2rad(rot_deg)
        err = np.abs(np.mod(diff - expected + np.pi, 2 * np.pi) - np.pi)
        assert np.median(err) < 0.15, np.median(err)

    def test_descriptor_rotation_invariance(self):
        img = IMG.astype(np.float32)
        center = (160, 120)
        M = cv2.getRotationMatrix2D(center, 45.0, 1.0)
        rot = cv2.warpAffine(img, M, (320, 240))
        c = fast.detect(jnp.asarray(img), 20.0, cell=16, max_corners=64)
        xy = np.asarray(c.xy[np.asarray(c.mask)])
        ones = np.ones((len(xy), 1))
        xy_rot = (np.hstack([xy, ones]) @ M.T)[:, :2]
        keep = (
            (xy_rot[:, 0] > 40) & (xy_rot[:, 0] < 280)
            & (xy_rot[:, 1] > 40) & (xy_rot[:, 1] < 200)
            & (xy[:, 0] > 40) & (xy[:, 0] < 280)
            & (xy[:, 1] > 40) & (xy[:, 1] < 200)
        )
        xy, xy_rot = xy[keep][:30], xy_rot[keep][:30]
        _, d0 = orb.compute(jnp.asarray(img), jnp.asarray(xy, jnp.float32))
        _, d1 = orb.compute(jnp.asarray(rot), jnp.asarray(xy_rot, jnp.float32))
        dist_same = np.asarray(hamming.hamming_distance(d0, d1))
        # Distances between corresponding points must be far below the
        # random-descriptor expectation (128).
        assert np.median(dist_same) < 60, np.median(dist_same)

    def test_pack_bits_roundtrip(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, size=(5, 256)).astype(bool))
        packed = orb.pack_bits(bits)
        # Unpack and compare.
        words = np.asarray(packed)
        unpacked = np.zeros((5, 256), bool)
        for w in range(8):
            for i in range(32):
                unpacked[:, 32 * w + i] = (words[:, w] >> i) & 1
        np.testing.assert_array_equal(unpacked, np.asarray(bits))


class TestHamming:
    def test_popcount(self):
        v = jnp.asarray(np.array([0, 1, 0xFFFFFFFF, 0xF0F0F0F0], dtype=np.uint32))
        np.testing.assert_array_equal(hamming.popcount_u32(v), [0, 1, 32, 16])

    def test_distance_matrix_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
        ours = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        golden = np.zeros((16, 24), np.int32)
        for i in range(16):
            for j in range(24):
                golden[i, j] = bin(int.from_bytes(a[i].tobytes(), "little")
                                  ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
        np.testing.assert_array_equal(ours, golden)

    def test_match_nn_identity(self):
        rng = np.random.default_rng(1)
        d = jnp.asarray(rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32))
        perm = rng.permutation(32)
        idx, ok = hamming.match_nn(
            d, d[perm], jnp.ones(32, bool), jnp.ones(32, bool), max_dist=256, ratio=1.0
        )
        assert bool(ok.all())
        np.testing.assert_array_equal(np.asarray(idx), np.argsort(perm))

    def test_match_respects_mask(self):
        rng = np.random.default_rng(2)
        d = jnp.asarray(rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32))
        mask_b = jnp.zeros(8, bool)
        idx, ok = hamming.match_nn(d, d, jnp.ones(8, bool), mask_b)
        assert not bool(ok.any())


class TestInterp:
    def test_bilinear_exact_on_grid(self):
        img = jnp.asarray(IMG, jnp.float32)
        xy = jnp.array([[10.0, 20.0], [100.0, 50.0]])
        v = interp.bilinear(img, xy)
        np.testing.assert_allclose(v, [IMG[20, 10], IMG[50, 100]])

    def test_bilinear_midpoint(self):
        img = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
        v = interp.bilinear(img, jnp.array([[0.5, 0.5]]))
        np.testing.assert_allclose(v, [1.5])

    def test_patches_match_slices(self):
        img = jnp.asarray(IMG, jnp.float32)
        p = interp.extract_patches(img, jnp.array([[50.0, 60.0]]), 8)
        np.testing.assert_allclose(p[0], IMG[56:64, 46:54].astype(np.float32))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
