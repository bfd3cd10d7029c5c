"""Jitted per-frame compute steps of the VO frontend.

These are the device-side halves of the reference's tracking modules,
each one fused XLA computation invoked by the host state machine
(models/visual_odometry.py):

- detect_multilevel : gridded FAST over the pyramid + ORB
  (FeatureDetector::Detect, src/Algorithm/FeatureDetector.cpp:345-444)
- track_ref_frame   : sparse-direct alignment + motion gate
  (Matcher::SparseImageAlignment, Matcher.cpp:468-492;
   VisualOdometry::TrackRefFrame :281-302)
- track_local_map   : project landmarks -> batched patch alignment ->
  pose-only BA -> stats update (LocalMapping::TrackLocalMap,
  LocalMapping.cpp:24-146, Matcher::FindDirectProjection :356-417)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..ops import fast, orb, pyramid as pyr
from ..ops.align import align2d, AlignResult
from ..ops.warp import warp_affine_matrix, best_search_level, warp_patches
from ..ops.interp import sample_patches, in_bounds
from ..solvers.ba import pose_only_ba
from ..ops.sparse_align import sparse_image_align


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (level-0 coordinates)."""

    px: jnp.ndarray      # [F, 2]
    level: jnp.ndarray   # [F] int32
    score: jnp.ndarray   # [F]
    angle: jnp.ndarray   # [F]
    desc: jnp.ndarray    # [F, 8] uint32
    depth: jnp.ndarray   # [F] (-1 unknown)
    valid: jnp.ndarray   # [F] bool


def detect_multilevel(
    pyramid: tuple[jnp.ndarray, ...],
    threshold: float,
    cell: int,
    budgets: tuple[int, ...],
    existing_px: jnp.ndarray | None = None,
    existing_mask: jnp.ndarray | None = None,
    min_dist: float = 8.0,
) -> Features:
    """Gridded FAST per pyramid level with per-level budgets, ORB
    angle/descriptor computed at each feature's detection level,
    coordinates returned at level-0 scale.

    With `existing_px`, new detections too close to existing (tracked)
    features are suppressed — the reference's Detect(frame,
    overwrite=false) grid-occupancy behavior (FeatureDetector.cpp:390-426).
    """
    all_px, all_lvl, all_score, all_angle, all_desc, all_mask = (
        [], [], [], [], [], []
    )
    for lvl, budget in enumerate(budgets):
        img = pyramid[lvl]
        c = fast.detect(img, threshold, cell, budget)
        keep = c.mask
        if existing_px is not None:
            scale = 2.0 ** lvl
            d2 = jnp.sum(
                (c.xy[:, None, :] * scale - existing_px[None, :, :]) ** 2,
                axis=-1,
            )
            d2 = jnp.where(existing_mask[None, :], d2, jnp.inf)
            keep = keep & (jnp.min(d2, axis=1) > min_dist * min_dist)
        ang, desc = orb.compute(img, c.xy)
        all_px.append(c.xy * (2.0 ** lvl))
        all_lvl.append(jnp.full(budget, lvl, jnp.int32))
        all_score.append(c.score)
        all_angle.append(ang)
        all_desc.append(desc)
        all_mask.append(keep)
    F = sum(budgets)
    return Features(
        px=jnp.concatenate(all_px),
        level=jnp.concatenate(all_lvl),
        score=jnp.concatenate(all_score),
        angle=jnp.concatenate(all_angle),
        desc=jnp.concatenate(all_desc),
        depth=jnp.full(F, -1.0, pyramid[0].dtype),
        valid=jnp.concatenate(all_mask),
    )


class TrackRefResult(NamedTuple):
    T_cw: SE3
    ok: jnp.ndarray       # motion-gate pass
    chi2: jnp.ndarray
    n_visible: jnp.ndarray


def track_ref_frame(
    ref_pyr,
    cur_pyr,
    cam,
    ref_T_cw: SE3,
    feat_px,
    feat_depth,
    feat_mask,
    T_cw_init: SE3,
    max_motion: float = 0.2,
) -> TrackRefResult:
    """Sparse-direct frame tracking with the reference's motion sanity
    gate: reject when ||log T_cur_ref|| > 0.2 and keep the init pose
    (Matcher.cpp:482-488; fallback handled by the caller's motion
    model, VisualOdometry.cpp:286-291)."""
    T_cr_init = T_cw_init.compose(ref_T_cw.inverse())
    stats = sparse_image_align(
        ref_pyr, cur_pyr, cam, feat_px, feat_depth,
        feat_mask & (feat_depth > 0), T_cr_init,
    )
    motion = jnp.linalg.norm(se3m.log(stats.T_cur_ref))
    ok = (motion <= max_motion) & (stats.n_visible > 10)
    T_cw_new = stats.T_cur_ref.compose(ref_T_cw)
    T_cw = jax.tree.map(
        lambda good, bad: jnp.where(ok, good, bad), T_cw_new, T_cw_init
    )
    return TrackRefResult(T_cw=T_cw, ok=ok, chi2=stats.chi2,
                          n_visible=stats.n_visible)


class TrackMapResult(NamedTuple):
    T_cw: SE3
    n_inliers: jnp.ndarray
    candidate: jnp.ndarray   # [L] landmark was searched
    found: jnp.ndarray       # [L] landmark matched + inlier
    obs_px: jnp.ndarray      # [L, 2] refined observation pixel


def track_local_map(
    cur_pyr,
    cam,
    T_cw_init: SE3,
    pt_pos,
    pt_valid,
    ref_patches,          # [L, 10, 10] warped reference patches
    patch_ok,             # [L] patch source validity
    search_lvl=None,      # [L] int32 per-landmark search level (None=0)
    max_align_error: float = 30.0,
    max_step_motion: float = 0.2,
) -> TrackMapResult:
    """Track against the local map: project landmarks, refine each
    projection with batched inverse-compositional patch alignment AT
    EACH LANDMARK'S BEST SEARCH LEVEL, then pose-only BA on the
    survivors.

    Condenses LocalMapping::TrackLocalMap (FindCandidates :47-80 ->
    ProjectMapPoints :82-120 -> OptimizeCurrent :122-146) into one
    jitted step; Matcher::FindDirectProjection's warp happens in the
    caller (needs keyframe images), the alignment happens here.

    Per-level TPU design: instead of one align2d per level (3x kernel
    cost), the cached windows are fetched from a padded pyramid STACK
    with a per-point level index (gather_windows_multi) and fed to the
    single fused align2d kernel via its pregathered path — per-level
    search at flat-level kernel cost.
    """
    H, W = cur_pyr[0].shape
    pc = T_cw_init.apply(pt_pos)
    px_proj = cam.camera_to_pixel(pc)
    if search_lvl is None:
        search_lvl = jnp.zeros(pt_pos.shape[0], jnp.int32)
    lscale = 2.0 ** search_lvl.astype(px_proj.dtype)
    px_l = px_proj / lscale[:, None]
    # Per-point level dimensions gate the frustum test.
    Wl = W / lscale
    Hl = H / lscale
    m = 8.0
    inb_l = (
        (px_l[:, 0] >= m) & (px_l[:, 1] >= m)
        & (px_l[:, 0] < Wl - m) & (px_l[:, 1] < Hl - m)
    )
    in_frustum = pt_valid & (pc[:, 2] > 0.05) & inb_l & patch_ok
    from ..ops.pallas import align2d_kernel as _ak

    if _ak.on_tpu() and _ak.usable((H, W), 11) and len(cur_pyr) > 1:
        from ..ops.pallas import align2d_fused as _af

        nL = len(cur_pyr)
        stack = jnp.zeros((nL, H, W), cur_pyr[0].dtype)
        for l, img in enumerate(cur_pyr):
            h, w = img.shape
            stack = stack.at[l, :h, :w].set(img)
        half = (_ak.PATCH - 1) / 2.0
        px_ls = jnp.nan_to_num(px_l)
        ox = jnp.clip(
            jnp.floor(px_ls[:, 0] - half) - _ak.CACHE_SLACK,
            0, Wl - _ak.CACHE_WIN,
        ).astype(jnp.int32)
        oy = jnp.clip(
            jnp.floor(px_ls[:, 1] - half) - _ak.CACHE_SLACK,
            0, Hl - _ak.CACHE_WIN,
        ).astype(jnp.int32)
        wins = _ak.gather_windows_multi(
            stack, search_lvl, ox, oy, _ak.CACHE_WIN
        )
        pre = _af.A2DWindows(wins=wins, ox=ox, oy=oy, center=px_ls)
        res = align2d(cur_pyr[0], ref_patches, px_ls,
                      max_error=max_align_error, pregathered=pre)
    else:
        # CPU / single-level fallback: one align2d per level, combined
        # by the per-point level assignment.
        res = align2d(cur_pyr[0], ref_patches, px_l,
                      max_error=max_align_error)
        for l in range(1, len(cur_pyr)):
            r_l = align2d(cur_pyr[l], ref_patches, px_l,
                          max_error=max_align_error)
            sel = search_lvl == l
            res = AlignResult(
                xy=jnp.where(sel[:, None], r_l.xy, res.xy),
                converged=jnp.where(sel, r_l.converged, res.converged),
                error=jnp.where(sel, r_l.error, res.error),
            )
    xy0 = res.xy * lscale[:, None]       # back to level-0 coordinates
    matched = in_frustum & res.converged
    T_opt, inlier, chi2 = pose_only_ba(
        T_cw_init, pt_pos, xy0, matched, cam
    )
    # Whole-step motion sanity gate: on self-similar texture, patch
    # alignment can latch coherently onto WRONG minima and pose BA
    # then accepts a large consistent jump (perceptual aliasing — the
    # classic direct-method kidnap failure).  The reference gates only
    # the sparse alignment (Matcher.h:30 _max_alignment_motion); here
    # the same bound also applies to the pose-BA correction, so an
    # aliased solve reports FAILURE (zero inliers -> LOST -> BoW
    # relocalization) instead of teleporting the camera.
    step = jnp.linalg.norm(
        se3m.log(T_opt.compose(T_cw_init.inverse()))
    )
    sane = step <= max_step_motion
    inlier = inlier & sane
    T_out = jax.tree.map(
        lambda a, b: jnp.where(sane, a, b), T_opt, T_cw_init
    )
    return TrackMapResult(
        T_cw=T_out,
        n_inliers=jnp.sum(inlier),
        candidate=in_frustum,
        found=inlier,
        obs_px=xy0,
    )


def reference_patches_for_landmarks(
    kf_images,            # [K, H, W] level-0 keyframe images
    kf_pose7,             # [K, 7]
    feat_px_flat,         # [K*F, 2]
    feat_level_flat,      # [K*F]
    pt_ref_feat,          # [L] flat index into K*F (-1 invalid)
    pt_pos,               # [L, 3]
    pt_valid,             # [L]
    cam,
    T_cw_cur: SE3,
    max_level: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build affine-warped 10x10 reference patches for every landmark
    from its reference observation (GetWarpAffineMatrix + WarpAffine,
    Matcher.cpp:420-466), batched over the whole map.

    With max_level > 0, each landmark also picks its best pyramid
    SEARCH level in the current frame (GetBestSearchLevel,
    Matcher.h:123-134 via FindDirectProjection, Matcher.cpp:356-417):
    the level where the warped patch is closest to unit scale.  The
    reference patch is warped into that level's geometry (offsets
    scaled by 2^level before the inverse-affine map), so alignment
    stays well-conditioned under scale change (forward motion, distant
    revisits) instead of shedding inliers at level 0.

    Returns (patches [L, 10, 10], ok [L], search_level [L] int32).
    """
    L = pt_pos.shape[0]
    K = kf_images.shape[0]
    F = feat_px_flat.shape[0] // K
    rf = jnp.clip(pt_ref_feat, 0, feat_px_flat.shape[0] - 1)
    kf_of = rf // F
    px_ref = feat_px_flat[rf]
    lvl_ref = feat_level_flat[rf]
    T_ref = SE3.from_params7(kf_pose7[kf_of])          # batched [L]
    # Depth of the landmark in its reference keyframe.
    p_ref_cam = T_ref.apply(pt_pos)
    depth_ref = jnp.maximum(p_ref_cam[:, 2], 1e-3)
    T_cur_ref = T_cw_cur.compose(T_ref.inverse())      # batched [L]
    A = warp_affine_matrix(cam, px_ref, depth_ref, lvl_ref, T_cur_ref)
    search_lvl = best_search_level(A, max_level)
    ok = (
        pt_valid & (pt_ref_feat >= 0) & (p_ref_cam[:, 2] > 1e-3)
        & jnp.isfinite(A).all(axis=(1, 2))
    )
    Ainv = jnp.linalg.inv(A + 1e-6 * jnp.eye(2))
    size = 10
    d = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    gx, gy = jnp.meshgrid(d, d)
    offs = jnp.stack([gx, gy], axis=-1)                # [10,10,2]
    # Patch offsets live on the SEARCH level: scale to level-0 units
    # before mapping back into the reference image.
    lscale = (2.0 ** search_lvl.astype(jnp.float32))[:, None, None, None]
    src = jnp.einsum("lab,lijb->lija", Ainv, offs[None] * lscale)
    coords = src + px_ref[:, None, None, :]

    def gather_one(img_idx, c):
        # c: [10,10,2] in one keyframe image
        from ..ops.interp import bilinear
        return bilinear(kf_images[img_idx], c)

    patches = jax.vmap(gather_one)(kf_of, coords)
    return patches, ok, search_lvl


def preprocess(img: jnp.ndarray, n_levels: int = 3):
    """Image -> float pyramid (Frame::InitFrame, Frame.cpp:22-40)."""
    return pyr.build_pyramid(img.astype(jnp.float32), n_levels)
