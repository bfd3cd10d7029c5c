"""Direct-alignment kernel tests on rendered synthetic scenes with
exact photometric ground truth (PlaneScene oracle).

Mirrors the validation intent of test_feature_alignment.cpp /
test_LK_tracking.cpp but with assertions against exact geometry
instead of printed logs + depth-image spot checks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.ops import pyramid, fast
from ygz_slam_tpu.ops.align import align2d, align1d, klt_pyramidal
from ygz_slam_tpu.ops.sparse_align import sparse_image_align
from ygz_slam_tpu.ops.warp import warp_affine_matrix, best_search_level, warp_patches
from ygz_slam_tpu.ops.interp import extract_patches, sample_patches
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def scene_and_views(seed=0, xi_cur=(0.06, -0.03, 0.02, 0.004, -0.006, 0.003)):
    scene = PlaneScene(CAM, plane_z=3.0, seed=seed)
    T_ref = SE3.identity()
    T_cur = se3.exp(jnp.asarray(xi_cur, jnp.float32))
    img_ref = scene.render(T_ref, SHAPE)
    img_cur = scene.render(T_cur, SHAPE)
    return scene, T_ref, T_cur, img_ref, img_cur


def detect_features(img, n=120):
    c = fast.detect(img, 20.0, cell=16, max_corners=n)
    return c.xy, c.mask


class TestKLT:
    def test_tracks_match_ground_truth(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)
        res = klt_pyramidal(ref_pyr, cur_pyr, xy)
        gt = scene.project_to(xy, T_ref, T_cur)
        ok = np.asarray(res.converged & mask)
        err = np.linalg.norm(np.asarray(res.xy - gt), axis=1)[ok]
        assert ok.sum() > 50, f"only {ok.sum()} tracks"
        assert np.median(err) < 0.3, np.median(err)
        assert (err < 1.0).mean() > 0.9

    def test_jit_and_reuse(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=64)
        f = jax.jit(lambda rp, cp, x: klt_pyramidal(rp, cp, x))
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)
        r1 = f(ref_pyr, cur_pyr, xy)
        r2 = f(ref_pyr, ref_pyr, xy)  # identity: tracks shouldn't move
        drift = np.linalg.norm(np.asarray(r2.xy - xy), axis=1)
        assert np.median(drift[np.asarray(r2.converged)]) < 0.05


class TestAlign2D:
    def test_recovers_known_offset(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=80)
        gt = scene.project_to(xy, T_ref, T_cur)
        # Reference patches: sampled around the GT position in the *ref*
        # image is wrong for viewpoint change; for this unit test use
        # patches from the cur image itself displaced by a known 2px.
        patches = sample_patches(img_cur, gt, 10)
        init = gt + jnp.asarray([[1.5, -1.2]])
        res = align2d(img_cur, patches, init)
        ok = np.asarray(res.converged & mask)
        err = np.linalg.norm(np.asarray(res.xy - gt), axis=1)[ok]
        assert ok.sum() > 40
        assert np.median(err) < 0.1, np.median(err)

    def test_cross_view_with_ref_patches(self):
        # Small viewpoint change: ref patches align onto cur image.
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views(
            xi_cur=(0.02, 0.01, 0.005, 0.002, -0.002, 0.001)
        )
        xy, mask = detect_features(img_ref, n=80)
        gt = scene.project_to(xy, T_ref, T_cur)
        patches = sample_patches(img_ref, xy, 10)
        init = gt + jnp.asarray([[1.0, 1.0]])
        res = align2d(img_cur, patches, init)
        ok = np.asarray(res.converged & mask)
        err = np.linalg.norm(np.asarray(res.xy - gt), axis=1)[ok]
        assert ok.sum() > 40
        assert np.median(err) < 0.3, np.median(err)

    def test_divergent_marked_unconverged(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        rng = np.random.default_rng(0)
        # Random garbage patches can't align: error must stay high and
        # acceptance must reject.
        patches = jnp.asarray(rng.uniform(0, 255, (20, 10, 10)), jnp.float32)
        init = jnp.asarray(rng.uniform(50, 250, (20, 2)), jnp.float32)
        res = align2d(img_cur, patches, init, max_error=10.0)
        assert not bool(res.converged.any())


class TestAlign1D:
    def test_recovers_offset_along_direction(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=60)
        gt = scene.project_to(xy, T_ref, T_cur)
        patches = sample_patches(img_cur, gt, 10)
        direction = jnp.tile(jnp.asarray([[0.8, 0.6]]), (xy.shape[0], 1))
        init = gt - 2.0 * direction  # displaced along the search line
        res = align1d(img_cur, patches, init, direction)
        ok = np.asarray(res.converged & mask)
        err = np.linalg.norm(np.asarray(res.xy - gt), axis=1)[ok]
        assert ok.sum() > 30
        assert np.median(err) < 0.1, np.median(err)


class TestWarp:
    def test_affine_matches_true_map(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views(
            xi_cur=(0.15, 0.05, -0.1, 0.02, -0.05, 0.03)
        )
        xy, mask = detect_features(img_ref, n=40)
        depth = scene.depth(xy, SE3.identity())
        T_cr = se3.exp(jnp.asarray([0.15, 0.05, -0.1, 0.02, -0.05, 0.03], jnp.float32))
        A = warp_affine_matrix(CAM, xy, depth, jnp.zeros(xy.shape[0], jnp.int32), T_cr)
        # Check: A * (du) approximates the true pixel displacement map.
        du = jnp.asarray([3.0, 0.0])
        gt0 = scene.project_to(xy, SE3.identity(), T_cr)
        gt1 = scene.project_to(xy + du, SE3.identity(), T_cr)
        pred = gt0 + jnp.einsum("nab,b->na", A, du)
        err = np.linalg.norm(np.asarray(pred - gt1), axis=1)[np.asarray(mask)]
        assert np.median(err) < 0.15, np.median(err)

    def test_best_search_level(self):
        A = jnp.asarray([np.eye(2), 2.5 * np.eye(2), 5.0 * np.eye(2)], dtype=jnp.float32)
        lvl = best_search_level(A, 2)
        # det = 1, 6.25, 25 -> levels 0, 1, 2
        np.testing.assert_array_equal(np.asarray(lvl), [0, 1, 2])

    def test_warp_patches_identity(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, _ = detect_features(img_ref, n=16)
        A = jnp.tile(jnp.eye(2)[None], (xy.shape[0], 1, 1))
        p = warp_patches(img_ref, xy, jnp.zeros(xy.shape[0], jnp.int32), A,
                         jnp.zeros(xy.shape[0], jnp.int32), half_patch=5)
        direct = sample_patches(img_ref, xy, 10)
        np.testing.assert_allclose(np.asarray(p), np.asarray(direct), atol=1e-2)


class TestSparseAlign:
    def test_recovers_pose(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=150)
        depth = scene.depth(xy, T_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)
        stats = sparse_image_align(
            ref_pyr, cur_pyr, CAM, xy, depth, mask, SE3.identity(),
            distorted=False,
        )
        T_gt = T_cur  # T_cur_ref since T_ref = I
        err = float(se3.distance(stats.T_cur_ref, T_gt))
        assert err < 5e-3, err
        assert int(stats.n_visible) > 100

    def test_identity_motion(self):
        scene, T_ref, T_cur, img_ref, _ = scene_and_views()
        xy, mask = detect_features(img_ref, n=100)
        depth = scene.depth(xy, T_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        stats = sparse_image_align(
            ref_pyr, ref_pyr, CAM, xy, depth, mask, SE3.identity(),
            distorted=False,
        )
        assert float(se3.distance(stats.T_cur_ref, SE3.identity())) < 1e-4

    def test_jit_full_pipeline(self):
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=100)
        depth = scene.depth(xy, T_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)

        @jax.jit
        def track(rp, cp, xy, d, m):
            return sparse_image_align(rp, cp, CAM, xy, d, m, SE3.identity(),
                                      distorted=False)

        stats = track(ref_pyr, cur_pyr, xy, depth, mask)
        assert float(se3.distance(stats.T_cur_ref, T_cur)) < 5e-3

    def test_prepared_reference_matches_default(self):
        # prepare_reference (per-keyframe hoist of the patch/Jacobian
        # precompute) must be bit-identical to the in-call path.
        from ygz_slam_tpu.ops.sparse_align import prepare_reference

        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views()
        xy, mask = detect_features(img_ref, n=120)
        depth = scene.depth(xy, T_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)
        prep = prepare_reference(ref_pyr, CAM, xy, depth, mask,
                                 distorted=False)
        a = sparse_image_align(
            ref_pyr, cur_pyr, CAM, xy, depth, mask, SE3.identity(),
            distorted=False,
        )
        b = sparse_image_align(
            ref_pyr, cur_pyr, CAM, xy, depth, mask, SE3.identity(),
            distorted=False, ref_prep=prep,
        )
        np.testing.assert_array_equal(
            np.asarray(a.T_cur_ref.params7()),
            np.asarray(b.T_cur_ref.params7()),
        )
        assert float(se3.distance(b.T_cur_ref, T_cur)) < 5e-3

    def test_larger_motion_with_init(self):
        # Bigger baseline: fails from identity at fine-only, but the
        # coarse-to-fine schedule should still capture it.
        scene, T_ref, T_cur, img_ref, img_cur = scene_and_views(
            xi_cur=(0.20, 0.08, -0.05, 0.01, -0.03, 0.02)
        )
        xy, mask = detect_features(img_ref, n=150)
        depth = scene.depth(xy, T_ref)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        cur_pyr = pyramid.build_pyramid(img_cur, 3)
        stats = sparse_image_align(
            ref_pyr, cur_pyr, CAM, xy, depth, mask, SE3.identity(),
            distorted=False,
        )
        err = float(se3.distance(stats.T_cur_ref, T_cur))
        assert err < 1e-2, err


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
