"""Pallas kernel tests (interpret mode on CPU; the same code compiles
for TPU where it is dispatched by ops.align / ops.sparse_align).

Regression coverage for the two Mosaic alignment traps found on
hardware: tile-aligned dynamic-slice origins, and edge-clamp bounds
that must themselves be tile-aligned (bottom-edge features previously
read past the super-window -> NaN).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from ygz_slam_tpu.ops import hamming
from ygz_slam_tpu.ops.interp import sample_patches


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


class TestHammingKernel:
    def test_matches_jnp(self):
        from ygz_slam_tpu.ops.pallas import hamming_kernel as hk

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 2**32, (130, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (77, 8), dtype=np.uint32))
        d1 = hk.distance_matrix_pallas(a, b)
        d2 = hamming.distance_matrix(a, b)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestWindowKernels:
    @pytest.mark.slow
    def test_bilinear_patches_matches_and_finite_at_edges(self):
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak

        rng = np.random.default_rng(1)
        for (H, W) in [(480, 640), (120, 160), (479, 641)]:
            img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
            cs = np.r_[
                np.c_[rng.uniform(0, W - 1, 30), rng.uniform(0, H - 1, 30)],
                [[0, 0], [W - 1, H - 1], [W - 4, H - 2], [2, H - 3]],
            ]
            centers = jnp.asarray(cs, jnp.float32)
            for size in (4, 6, 8):
                a = ak.bilinear_patches(img, centers, size)
                assert bool(jnp.isfinite(a).all()), (H, W, size)
                b = sample_patches(img, centers, size)
                interior = (
                    (cs[:, 0] > size) & (cs[:, 0] < W - size)
                    & (cs[:, 1] > size) & (cs[:, 1] < H - size)
                )
                if interior.any():
                    err = float(jnp.abs(a[interior] - b[interior]).max())
                    assert err < 0.01, (H, W, size, err)

    def test_wild_coordinates_stay_finite(self):
        # Masked callers pass behind-camera projections (~1e12) and NaN.
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak

        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (120, 160)), jnp.float32
        )
        centers = jnp.asarray(
            [[1e12, -1e12], [np.nan, 50.0], [-5.0, 1e9], [80.0, 60.0]],
            jnp.float32,
        )
        out = ak.bilinear_patches(img, centers, 4)
        assert bool(jnp.isfinite(out).all())

    def test_align2d_pallas_converges(self):
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=0)
        img = scene.render(SE3.identity(), (240, 320))
        rng = np.random.default_rng(0)
        xy_gt = jnp.asarray(
            np.c_[rng.uniform(20, 300, 32), rng.uniform(20, 220, 32)],
            jnp.float32,
        )
        patches = sample_patches(img, xy_gt, 10)
        xy, mean, err = ak.align2d_pallas(
            img, patches, xy_gt + jnp.asarray([[1.5, -1.2]])
        )
        d = np.linalg.norm(np.asarray(xy - xy_gt), axis=1)
        assert np.median(d) < 0.05, np.median(d)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestFusedAligner:
    """align2d_fused: the whole GN loop inside ONE kernel (lane-roll
    sampling over flattened [N, 1024] windows) must reproduce the
    multi-kernel cached-window aligner."""

    def test_matches_align2d_pallas(self):
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops.pallas import align2d_fused as af

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        img = scene.render(SE3.identity(), (240, 320))
        rng = np.random.default_rng(3)
        xy_gt = jnp.asarray(
            np.c_[rng.uniform(20, 300, 48), rng.uniform(20, 220, 48)],
            jnp.float32,
        )
        patches = sample_patches(img, xy_gt, 10)
        init = xy_gt + jnp.asarray(
            rng.uniform(-2.5, 2.5, (48, 2)), jnp.float32
        )
        xy_a, m_a, e_a = ak.align2d_pallas(img, patches, init)
        prep = af.align2d_prepare(patches)
        xy_b, m_b, e_b = af.align2d_fused(img, prep, init)
        # The two aligners run slightly different convergence/freeze
        # schedules, so agreement is sub-0.5 px, not bitwise (exact
        # parity proved environment-sensitive: float contraction order
        # shifts which iteration trips the 0.03 px stop).
        d_ab = np.linalg.norm(np.asarray(xy_b - xy_a), axis=1)
        assert np.median(d_ab) < 0.05, np.median(d_ab)
        assert d_ab.max() < 0.5, d_ab.max()
        assert np.all(np.isfinite(np.asarray(e_b)))
        d = np.linalg.norm(np.asarray(xy_b - xy_gt), axis=1)
        assert np.median(d) < 0.05, np.median(d)

    def test_edge_points_finite(self):
        from ygz_slam_tpu.ops.pallas import align2d_fused as af

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (240, 320)), jnp.float32)
        init = jnp.asarray(
            [[5.0, 5.0], [314.0, 234.0], [0.0, 120.0], [160.0, 239.0]],
            jnp.float32,
        )
        patches = sample_patches(img, init, 10)
        prep = af.align2d_prepare(patches)
        xy, mean, err = af.align2d_fused(img, prep, init)
        assert bool(jnp.isfinite(xy).all())
        assert bool(jnp.isfinite(err).all())

    def test_delta_rolls_matches_full_rolls(self, monkeypatch):
        """DELTA_ROLLS (5 re-alignment rolls/iter + <=1 px step clamp)
        must land on the same optima as the full 10-roll chain."""
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3
        from ygz_slam_tpu.ops.pallas import align2d_fused as af

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=7)
        img = scene.render(SE3.identity(), (240, 320))
        rng = np.random.default_rng(7)
        xy_gt = jnp.asarray(
            np.c_[rng.uniform(20, 300, 48), rng.uniform(20, 220, 48)],
            jnp.float32,
        )
        patches = sample_patches(img, xy_gt, 10)
        init = xy_gt + jnp.asarray(
            rng.uniform(-2.5, 2.5, (48, 2)), jnp.float32
        )
        prep = af.align2d_prepare(patches)
        monkeypatch.setattr(af, "DELTA_ROLLS", False)
        xy_a, _, _ = af.align2d_fused(img, prep, init)
        monkeypatch.setattr(af, "DELTA_ROLLS", True)
        xy_b, _, e_b = af.align2d_fused(img, prep, init)
        d_ab = np.linalg.norm(np.asarray(xy_b - xy_a), axis=1)
        assert np.median(d_ab) < 0.05, np.median(d_ab)
        assert d_ab.max() < 0.5, d_ab.max()
        assert np.all(np.isfinite(np.asarray(e_b)))
        d = np.linalg.norm(np.asarray(xy_b - xy_gt), axis=1)
        assert np.median(d) < 0.05, np.median(d)


class TestCachedWindowAligners:
    """The cached-window scheme: one [32,32] fetch per point, all GN
    iterations sample in-cache; drift past CACHE_SLACK is rejected."""

    def _scene(self, seed=0):
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=seed)
        img = scene.render(SE3.identity(), (240, 320))
        rng = np.random.default_rng(seed)
        xy_gt = jnp.asarray(
            np.c_[rng.uniform(20, 300, 32), rng.uniform(20, 220, 32)],
            jnp.float32,
        )
        return img, xy_gt, sample_patches(img, xy_gt, 10)

    def test_multi_matches_single(self):
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak

        img, xy_gt, patches = self._scene()
        init = xy_gt + jnp.asarray([[1.5, -1.2]])
        xy1, m1, e1 = ak.align2d_pallas(img, patches, init)
        imgs = jnp.stack([img, img + 3.0])
        N = xy_gt.shape[0]
        si = jnp.concatenate([jnp.zeros(N, jnp.int32),
                              jnp.ones(N, jnp.int32)])
        xy2, m2, e2 = ak.align2d_pallas_multi(
            imgs, si, jnp.tile(patches, (2, 1, 1)),
            jnp.tile(init, (2, 1)),
        )
        # Sequence 0 must reproduce the single-image result exactly;
        # sequence 1's image is brightness-shifted, which the mean-diff
        # term absorbs, so positions agree there too.
        assert np.allclose(np.asarray(xy2[:N]), np.asarray(xy1), atol=1e-5)
        assert np.allclose(np.asarray(xy2[N:]), np.asarray(xy1), atol=0.05)

    def test_align2d_rejects_drift_beyond_cache(self):
        """An init more than CACHE_SLACK px away from the true position
        cannot be reached inside the cache; ops.align.align2d must mark
        the point unconverged rather than return a clamped position."""
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops import align as align_mod

        img, xy_gt, patches = self._scene(1)
        far = float(ak.CACHE_SLACK) + 4.0
        init = xy_gt + jnp.asarray([[far, 0.0]])
        # Force the TPU dispatch path (kernels run in interpret mode).
        orig = ak.on_tpu
        ak.on_tpu = lambda: True
        try:
            res = align_mod.align2d(img, patches, init)
        finally:
            ak.on_tpu = orig
        conv = np.asarray(res.converged)
        drift = np.linalg.norm(np.asarray(res.xy - init), axis=1)
        # Whatever converged must satisfy the (tightened) drift gate.
        assert np.all(drift[conv] < float(ak.CACHE_SLACK))

    @pytest.mark.slow
    def test_sparse_align_tpu_path_matches_jnp_path(self):
        """Full sparse_image_align through the TPU window path (cached
        fine levels) in interpret mode vs the jnp gather path: same
        pose to sub-milli-radian."""
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops.sparse_align import sparse_image_align
        from ygz_slam_tpu.ops import pyramid, fast
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=2)
        T_gt = se3.exp(jnp.asarray(
            [0.03, -0.02, 0.01, 0.002, -0.004, 0.002], jnp.float32))
        img_r = scene.render(SE3.identity(), (240, 320))
        img_c = scene.render(T_gt, (240, 320))
        c = fast.detect(img_r, 20.0, cell=16, max_corners=80)
        depth = scene.depth(c.xy, SE3.identity())
        rp = pyramid.build_pyramid(img_r, 3)
        cp = pyramid.build_pyramid(img_c, 3)

        st_jnp = sparse_image_align(
            rp, cp, CAM, c.xy, depth, c.mask, SE3.identity(),
            distorted=False,
        )
        orig = ak.on_tpu
        ak.on_tpu = lambda: True
        try:
            st_tpu = sparse_image_align(
                rp, cp, CAM, c.xy, depth, c.mask, SE3.identity(),
                distorted=False,
            )
        finally:
            ak.on_tpu = orig
        d_jnp = float(se3.distance(st_jnp.T_cur_ref, T_gt))
        d_tpu = float(se3.distance(st_tpu.T_cur_ref, T_gt))
        assert d_tpu < 1e-2, d_tpu
        assert abs(d_tpu - d_jnp) < 2e-3, (d_jnp, d_tpu)


@pytest.mark.slow
class TestSparseAlignFused:
    """level_align_fused: a pyramid level's whole GN loop in ONE kernel
    (rollback + convergence semantics of solvers.nlls.gauss_newton)."""

    def _scene(self, motion, seed=3):
        from ygz_slam_tpu.ops import pyramid, fast
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=seed)
        T_gt = se3.exp(jnp.asarray(motion, jnp.float32))
        img_r = scene.render(SE3.identity(), (240, 320))
        img_c = scene.render(T_gt, (240, 320))
        c = fast.detect(img_r, 20.0, cell=16, max_corners=80)
        depth = scene.depth(c.xy, SE3.identity())
        rp = pyramid.build_pyramid(img_r, 3)
        cp = pyramid.build_pyramid(img_c, 3)
        return CAM, T_gt, c, depth, rp, cp

    def _run(self, fused: bool, motion, variant: int = 2):
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops import sparse_align as sa
        from ygz_slam_tpu.geometry import SE3

        CAM, T_gt, c, depth, rp, cp = self._scene(motion)
        orig_tpu, orig_flag = ak.on_tpu, sa.USE_FUSED_LEVEL
        orig_var = sa.FUSED_VARIANT
        ak.on_tpu = lambda: True
        sa.USE_FUSED_LEVEL = fused
        sa.FUSED_VARIANT = variant
        try:
            st = sa.sparse_image_align(
                rp, cp, CAM, c.xy, depth, c.mask, SE3.identity(),
                distorted=False,
            )
        finally:
            ak.on_tpu = orig_tpu
            sa.USE_FUSED_LEVEL = orig_flag
            sa.FUSED_VARIANT = orig_var
        return st, T_gt

    @pytest.mark.parametrize("variant", [1, 2, 3])
    def test_matches_while_loop_path(self, variant):
        """Fused kernel vs the lax.while_loop GN path: same pose to
        well under the convergence tolerance."""
        from ygz_slam_tpu.geometry import se3

        motion = [0.03, -0.02, 0.01, 0.002, -0.004, 0.002]
        st_f, T_gt = self._run(True, motion, variant)
        st_w, _ = self._run(False, motion)
        d_f = float(se3.distance(st_f.T_cur_ref, T_gt))
        d_w = float(se3.distance(st_w.T_cur_ref, T_gt))
        assert d_f < 1e-2, d_f
        assert abs(d_f - d_w) < 2e-3, (d_f, d_w)
        # Fisher information comes back symmetric and non-trivial.
        H = np.asarray(st_f.H)
        assert np.allclose(H, H.T)
        assert np.all(np.isfinite(H)) and H[0, 0] > 0

    @pytest.mark.parametrize("variant", [1, 2])
    def test_larger_motion_converges(self, variant):
        """~10 px of image motion: the coarse level's window slack
        (5 px at quarter resolution = 20 px at level 0) must absorb the
        initial error and hand fine levels a close init."""
        from ygz_slam_tpu.geometry import se3

        motion = [0.06, 0.04, -0.02, -0.004, 0.006, 0.004]
        st_f, T_gt = self._run(True, motion, variant)
        d_f = float(se3.distance(st_f.T_cur_ref, T_gt))
        assert d_f < 1e-2, d_f

    def test_v2_matches_v1(self):
        """Frozen-H early-exit kernel vs the unrolled recompute-H
        kernel: same optimum (H only steers the step; both gate on the
        same chi2 rollback)."""
        from ygz_slam_tpu.geometry import se3

        motion = [0.04, -0.01, 0.02, -0.003, 0.005, -0.002]
        st2, T_gt = self._run(True, motion, 2)
        st1, _ = self._run(True, motion, 1)
        d2 = float(se3.distance(st2.T_cur_ref, T_gt))
        d1 = float(se3.distance(st1.T_cur_ref, T_gt))
        assert d2 < 1e-2, d2
        assert abs(d2 - d1) < 2e-3, (d2, d1)

    def test_mega_two_level_pyramid(self):
        """n_levels=2 exercises the meta/glob layout padding (origin
        columns 4-7, per-level vis at 10-11, dims at glob 20-23)."""
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops import sparse_align as sa
        from ygz_slam_tpu.geometry import SE3, se3

        motion = [0.02, -0.015, 0.01, 0.002, -0.003, 0.001]
        CAM, T_gt, c, depth, rp, cp = self._scene(motion)
        orig_tpu, orig_var = ak.on_tpu, sa.FUSED_VARIANT
        ak.on_tpu = lambda: True
        sa.FUSED_VARIANT = 3
        try:
            st = sa.sparse_image_align(
                rp[:2], cp[:2], CAM, c.xy, depth, c.mask, SE3.identity(),
                distorted=False, max_level=1,
            )
        finally:
            ak.on_tpu = orig_tpu
            sa.FUSED_VARIANT = orig_var
        d = float(se3.distance(st.T_cur_ref, T_gt))
        assert d < 1e-2, d

    def test_mega_outside_envelope_degrades_gracefully(self):
        """Motion beyond the mega kernel's fine-level window slack
        (init-pose-centered windows): fine levels mask points out
        rather than reading garbage, so the estimate stays finite and
        no worse than the coarse levels leave it."""
        from ygz_slam_tpu.geometry import se3, SE3

        motion = [0.06, 0.04, -0.02, -0.004, 0.006, 0.004]
        st3, T_gt = self._run(True, motion, 3)
        d3 = float(se3.distance(st3.T_cur_ref, T_gt))
        d0 = float(se3.distance(SE3.identity(), T_gt))
        assert np.isfinite(d3)
        assert d3 < 0.5 * d0, (d3, d0)  # coarse level still converges

    def test_packing_layout(self):
        """pack_patch_lanes puts entry (r, c) at lane 16r+c."""
        from ygz_slam_tpu.ops.pallas import sparse_align_fused as sf

        v = jnp.arange(2 * 16, dtype=jnp.float32).reshape(2, 4, 4)
        packed = np.asarray(sf.pack_patch_lanes(v))
        assert packed.shape == (2, sf.FLAT)
        for r in range(4):
            for cc in range(4):
                assert packed[1, 16 * r + cc] == v[1, r, cc]
        assert packed[0, 4] == 0.0 and packed[0, 16 * 4] == 0.0


class TestGroupedGather:
    """gather_windows_grouped: all of a frame's window fetches in one
    pallas_call (3 sparse-align levels + the align2d cache)."""

    def test_matches_individual_gathers(self):
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak

        rng = np.random.default_rng(3)
        img0 = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
        img1 = jnp.asarray(rng.uniform(0, 255, (240, 320)), jnp.float32)
        img2 = jnp.asarray(rng.uniform(0, 255, (120, 160)), jnp.float32)
        groups = []
        # Different image shapes, window sizes AND point counts (the
        # shorter group exercises grid padding); img0 appears twice
        # (dedup by identity).
        for img, win, n in [(img0, 16, 200), (img1, 16, 200),
                            (img2, 16, 200), (img0, 32, 137)]:
            H, W = img.shape
            xi = jnp.asarray(rng.integers(0, W - win, n), jnp.int32)
            yi = jnp.asarray(rng.integers(0, H - win, n), jnp.int32)
            groups.append((img, xi, yi, win))
        outs = ak.gather_windows_grouped(groups)
        for (img, xi, yi, win), out in zip(groups, outs):
            ref = ak.gather_windows(img, xi, yi, win)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=0, atol=0)

    def test_unified_track_step_matches_separate(self):
        """gather_frame_windows + frame_windows/pregathered plumbing
        reproduces the separate-gather track step: identical sparse
        pose (same windows by construction) and align2d positions that
        agree wherever both paths accept the point."""
        from ygz_slam_tpu.ops import pyramid, fast
        from ygz_slam_tpu.ops import sparse_align as sa
        from ygz_slam_tpu.ops.align import align2d
        from ygz_slam_tpu.ops.interp import sample_patches
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
        from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
        from ygz_slam_tpu.utils.synthetic import PlaneScene
        from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3

        CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
        scene = PlaneScene(CAM, plane_z=3.0, seed=5)
        T_gt = se3.exp(jnp.asarray(
            [0.02, -0.015, 0.01, 0.002, -0.003, 0.001], jnp.float32))
        img_r = scene.render(SE3.identity(), (240, 320))
        img_c = scene.render(T_gt, (240, 320))
        c = fast.detect(img_r, 20.0, cell=16, max_corners=80)
        depth = scene.depth(c.xy, SE3.identity())
        rp = pyramid.build_pyramid(img_r, 3)
        cp = pyramid.build_pyramid(img_c, 3)
        pts_w = CAM.pixel_to_world(c.xy, SE3.identity(), depth=depth,
                                   distorted=False)
        patches = sample_patches(img_r, c.xy, 10)
        prep = align2d_prepare(patches)
        ref_prep = sa.prepare_reference(rp, CAM, c.xy, depth, c.mask,
                                        distorted=False)

        orig_tpu, orig_var = ak.on_tpu, sa.FUSED_VARIANT
        ak.on_tpu = lambda: True
        sa.FUSED_VARIANT = 3
        try:
            def step(unified):
                T0 = SE3.identity()
                org = CAM.world_to_pixel(pts_w, T0, distorted=False)
                fw = None
                if unified:
                    fw = sa.gather_frame_windows(
                        cp, CAM, ref_prep, T0, distorted=False,
                        max_level=2, a2d_centers=org)
                st = sa.sparse_image_align(
                    rp, cp, CAM, c.xy, depth, c.mask, T0,
                    distorted=False, ref_prep=ref_prep,
                    frame_windows=fw)
                proj = CAM.world_to_pixel(pts_w, st.T_cur_ref,
                                          distorted=False)
                ares = align2d(cp[0], patches, proj, prep=prep,
                               pregathered=None if fw is None else fw.a2d)
                return st, ares

            st_u, ar_u = step(True)
            st_s, ar_s = step(False)
        finally:
            ak.on_tpu = orig_tpu
            sa.FUSED_VARIANT = orig_var

        # Sparse windows are identical by construction -> same pose.
        assert float(se3.distance(st_u.T_cur_ref, st_s.T_cur_ref)) < 1e-6
        assert float(se3.distance(st_u.T_cur_ref, T_gt)) < 1e-2
        both = np.asarray(ar_u.converged & ar_s.converged)
        assert both.sum() >= 0.8 * int(np.asarray(c.mask).sum())
        du = np.asarray(jnp.linalg.norm(ar_u.xy - ar_s.xy, axis=-1))
        # align2d sampling values are origin-independent on the shared
        # lattice; accepted points must agree to float tolerance.
        assert du[both].max() < 1e-3, du[both].max()


class TestFusedAlignerRowGrid:
    def test_grid_path_matches_single_block(self):
        """N > _ROW_BLOCK takes the row-grid pallas_call; results must
        be identical to slicing the batch through the single-block
        path (the multi-sequence S*N case)."""
        from ygz_slam_tpu.ops.pallas import align2d_fused as af
        import numpy as np

        rng = np.random.default_rng(3)
        H, W = 240, 320
        img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
        N = 600                       # > _ROW_BLOCK=256 -> grid path
        xy = jnp.asarray(
            np.c_[rng.uniform(24, W - 24, N),
                  rng.uniform(24, H - 24, N)].astype(np.float32))
        from ygz_slam_tpu.ops.interp import sample_patches
        patches = sample_patches(img, xy, 10)
        prep = af.align2d_prepare(patches)
        xy0 = xy + jnp.asarray(
            rng.uniform(-2, 2, (N, 2)).astype(np.float32))
        out_g = af.align2d_fused(img, prep, xy0)
        # Reference: run in single-block chunks of 200.
        outs = []
        for lo in range(0, N, 200):
            hi = min(lo + 200, N)
            prep_s = af.Align2DPrep(*[a[lo:hi] for a in prep])
            outs.append(af.align2d_fused(img, prep_s, xy0[lo:hi]))
        xy_ref = jnp.concatenate([o[0] for o in outs])
        assert np.allclose(np.asarray(out_g[0]), np.asarray(xy_ref),
                           atol=1e-4)
        err_ref = jnp.concatenate([o[2] for o in outs])
        assert np.allclose(np.asarray(out_g[2]), np.asarray(err_ref),
                           atol=1e-3)
