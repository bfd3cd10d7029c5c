"""Whole-track-step fused kernel vs the composed XLA pipeline
(interpret mode on CPU; the same code compiles to Mosaic on TPU)."""
import functools

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # whole-step fusion A/B run
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _scene(motion, seed=3, H=240, W=320):
    from ygz_slam_tpu.ops import pyramid, fast
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.utils.synthetic import PlaneScene
    from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3

    cam = PinholeCamera.create(320.0, 320.0, W / 2, H / 2)
    scene = PlaneScene(cam, plane_z=3.0, seed=seed)
    T_gt = se3.exp(jnp.asarray(motion, jnp.float32))
    img_r = scene.render(SE3.identity(), (H, W))
    img_c = scene.render(T_gt, (H, W))
    c = fast.detect(img_r, 20.0, cell=16, max_corners=80)
    depth = scene.depth(c.xy, SE3.identity())
    rp = pyramid.build_pyramid(img_r, 3)
    cp = pyramid.build_pyramid(img_c, 3)
    patches = sample_patches(img_r, c.xy, 10)
    pts_ref = cam.pixel_to_camera(c.xy, depth, distorted=False)
    return cam, T_gt, c, depth, rp, cp, patches, pts_ref


def test_matches_composed_pipeline():
    from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
    from ygz_slam_tpu.ops import sparse_align as sa
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    from ygz_slam_tpu.ops.pallas.track_fused import track_step_fused
    from ygz_slam_tpu.solvers.ba import pose_only_ba
    from ygz_slam_tpu.geometry import SE3, se3

    motion = [0.03, -0.02, 0.01, 0.002, -0.004, 0.002]
    cam, T_gt, c, depth, rp, cp, patches, pts_ref = _scene(motion)

    # Composed XLA reference: sparse align -> align2d -> pose BA.
    st = sa.sparse_image_align(rp, cp, cam, c.xy, depth, c.mask,
                               SE3.identity(), distorted=False)
    proj = cam.camera_to_pixel(st.T_cur_ref.apply(pts_ref),
                               distorted=False)
    ares = align2d(cp[0], patches, proj, use_tpu=False)
    T_x, inl_x, _ = pose_only_ba(
        st.T_cur_ref, pts_ref, ares.xy, ares.converged & c.mask, cam,
        use_fused=False,
    )

    # Fused whole-step kernel (lanes-packed reference prep).
    orig = ak.on_tpu
    ak.on_tpu = lambda: True
    try:
        ref_prep = sa.prepare_reference(rp, cam, c.xy, depth, c.mask,
                                        distorted=False)
        a2d_prep = align2d_prepare(patches)
        R, t, chi2_sp, chi2_ba, n_inl, xy, err, conv, inlier = (
            track_step_fused(
                cp, ref_prep.levels, ref_prep.p_ref, a2d_prep, pts_ref,
                c.mask, jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32), cam, distorted=False,
                max_level=2,
            )
        )
    finally:
        ak.on_tpu = orig
    T_f = SE3(R, t)

    d_f = float(se3.distance(T_f, T_gt))
    d_x = float(se3.distance(T_x, T_gt))
    assert d_f < 1e-2, (d_f, d_x)
    assert abs(d_f - d_x) < 2e-3, (d_f, d_x)

    # Align2d agreement on mutually converged points.
    both = np.asarray(conv & ares.converged & c.mask)
    assert both.sum() >= 0.5 * int(np.asarray(c.mask).sum())
    dxy = np.linalg.norm(np.asarray(xy - ares.xy), axis=1)
    assert np.quantile(dxy[both], 0.9) < 0.5, np.quantile(dxy[both], 0.9)

    # Inlier behavior: healthy count, and the MAD-bisection round-0
    # scale must not change the classification materially.
    n_x = int(np.asarray(inl_x).sum())
    n_f = int(np.asarray(inlier).sum())
    assert n_f > 0.7 * n_x, (n_f, n_x)
    assert np.isfinite(float(chi2_sp)) and np.isfinite(float(chi2_ba))


def test_masked_landmarks_stay_out():
    from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
    from ygz_slam_tpu.ops import sparse_align as sa
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    from ygz_slam_tpu.ops.pallas.track_fused import track_step_fused
    from ygz_slam_tpu.geometry import SE3, se3

    motion = [0.02, -0.01, 0.015, 0.001, -0.002, 0.001]
    cam, T_gt, c, depth, rp, cp, patches, pts_ref = _scene(motion, seed=5)
    bad = np.zeros(pts_ref.shape[0], bool)
    bad[:10] = True
    mask2 = c.mask & ~jnp.asarray(bad)

    orig = ak.on_tpu
    ak.on_tpu = lambda: True
    try:
        ref_prep = sa.prepare_reference(rp, cam, c.xy, depth, c.mask,
                                        distorted=False)
        a2d_prep = align2d_prepare(patches)
        R, t, _, _, n_inl, xy, err, conv, inlier = track_step_fused(
            cp, ref_prep.levels, ref_prep.p_ref, a2d_prep, pts_ref,
            mask2, jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), cam, distorted=False, max_level=2,
        )
    finally:
        ak.on_tpu = orig
    assert float(se3.distance(SE3(R, t), T_gt)) < 1e-2
    assert not np.asarray(conv)[bad].any()
    assert not np.asarray(inlier)[bad].any()
