"""Whole-frame sparse-direct image alignment (SVO-style), batched.

TPU-native replacement for the reference's SparseImgAlign
(src/Algorithm/SparseImageAlign.cpp): coarse-to-fine photometric
alignment of the current frame against the reference frame using 4x4
patches around features with known depth, inverse-compositional
Jacobians precomputed on the reference (:59-122), residual/Hessian
accumulation (:124-223), 6x6 solve (:225-231) and right-multiplicative
update T <- T * exp(-x) (:233-238).

The reference's per-feature/per-pixel scalar hot loop becomes one
[N, 16] tensor contraction per GN iteration; each pyramid level's GN
runs as a fused `lax.while_loop` via solvers.nlls.gauss_newton, so a
full 3-level alignment is a single jit-compiled computation.

Sign note: the reference's JacobXYZ2Cam has the negative sign baked in
(CVUtils.h:76 "已经取了负号") and solves H x = -sum(J r) then updates
T*exp(-x); with our positive-sign geometry.jacobians.duv_dxi this is
equivalent to b = -sum(J r), dx = H^-1 b, T <- T * exp(dx), which is
what the generic GN engine computes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry import jacobians as jac
from ..solvers.nlls import gauss_newton
from ..solvers import robust
from .interp import bilinear, in_bounds

PATCH_HALF = 2
PATCH = 2 * PATCH_HALF          # 4x4 patches (SparseImageAlign.h)
PATCH_AREA = PATCH * PATCH

# Bench-level A/B toggle for the fused per-level GN kernel
# (_bench_ablate.py); the fused path needs on_tpu() and no robust
# weights.
USE_FUSED_LEVEL = True
# Fused-kernel variant: 3 = ALL levels' GN in ONE kernel, windows
# gathered at the frame-init pose (sparse_align_mega); 2 =
# frozen-Hessian substitution-only per-level kernel with in-kernel
# while_loop early exit (sparse_align_fused._kernel_v2); 1 =
# fully-unrolled per-level kernel recomputing H every iteration
# (_kernel).
FUSED_VARIANT = 3


class AlignStats(NamedTuple):
    T_cur_ref: SE3
    chi2: jnp.ndarray        # final mean squared residual (last level)
    n_visible: jnp.ndarray   # features used on the finest level
    H: jnp.ndarray           # 6x6 Fisher-style information (last level)


def _patch_offsets(dtype=jnp.float32):
    d = jnp.arange(PATCH, dtype=dtype) - (PATCH_HALF - 0.5)
    gx, gy = jnp.meshgrid(d, d)
    return gx.reshape(-1), gy.reshape(-1)   # [16]


class LevelRef(NamedTuple):
    """Per-level precomputed reference data for sparse_image_align.

    Depends only on the REFERENCE frame (its pyramid, feature pixels
    and depths) — the analog of precomputeReferencePatches
    (src/Algorithm/SparseImageAlign.cpp:59-122), which the reference
    evaluates once per alignment because it is constant in the
    optimized pose.  Computing it once per KEYFRAME (prepare_reference)
    removes one window fetch + Jacobian build per level from every
    tracked frame."""
    vis: jnp.ndarray        # [N] feature usable at this level
    ref_patch: jnp.ndarray  # [N, 16] reference patch intensities
    J: jnp.ndarray          # [N, 16, 6] inverse-compositional Jacobians
    # Packed lane layouts for the fused Pallas GN kernel (None on the
    # CPU/jnp path): patch entry (r, c) at lane 16r+c.
    refp_lanes: jnp.ndarray | None = None   # [N, 256]
    jlanes: jnp.ndarray | None = None       # [N, 6*256]


def _prep_level(ref_img, cam, px_ref, p_ref, visible0, level) -> LevelRef:
    """Reference patches + inverse-compositional Jacobians for one
    pyramid level (constant w.r.t. the optimized pose)."""
    scale = 1.0 / (2.0 ** level)
    Hh, Ww = ref_img.shape
    gx, gy = _patch_offsets(ref_img.dtype)
    from .pallas import align2d_kernel as _ak

    use_tpu_windows = _ak.on_tpu() and _ak.usable((Hh, Ww), PATCH + 2)
    u_ref = px_ref * scale
    vis = visible0 & in_bounds(u_ref, Hh, Ww, margin=PATCH_HALF + 2)
    if use_tpu_windows:
        # One 6x6 bilinear window per point supplies the 4x4 patch AND
        # its central-difference gradients (offset grids align).
        p6 = _ak.bilinear_patches(ref_img, u_ref, PATCH + 2)
        ref_patch = p6[:, 1:5, 1:5].reshape(-1, PATCH_AREA)
        dx = (0.5 * (p6[:, 1:5, 2:6] - p6[:, 1:5, 0:4])).reshape(-1, PATCH_AREA)
        dy = (0.5 * (p6[:, 2:6, 1:5] - p6[:, 0:4, 1:5])).reshape(-1, PATCH_AREA)
    else:
        coords = jnp.stack(
            [u_ref[:, 0, None] + gx[None], u_ref[:, 1, None] + gy[None]],
            axis=-1,
        )                                                   # [N,16,2]
        ref_patch = bilinear(ref_img, coords)               # [N,16]
        dx = 0.5 * (
            bilinear(ref_img, coords + jnp.array([1.0, 0.0]))
            - bilinear(ref_img, coords + jnp.array([-1.0, 0.0]))
        )
        dy = 0.5 * (
            bilinear(ref_img, coords + jnp.array([0.0, 1.0]))
            - bilinear(ref_img, coords + jnp.array([0.0, -1.0]))
        )
    J_proj = jac.duv_dxi(p_ref, cam.fx * scale, cam.fy * scale)  # [N,2,6]
    J = dx[..., None] * J_proj[:, None, 0, :] + dy[..., None] * J_proj[:, None, 1, :]
    refp_lanes = jlanes = None
    if use_tpu_windows:
        from .pallas import sparse_align_fused as _sf
        refp_lanes = _sf.pack_patch_lanes(ref_patch)
        jlanes = _sf.pack_jacobian_lanes(J)
    return LevelRef(vis=vis, ref_patch=ref_patch, J=J,
                    refp_lanes=refp_lanes, jlanes=jlanes)


def _level_align(
    ref_img, cur_img, cam, px_ref, p_ref, visible0, T_init, n_iter, level,
    use_weights, cache_windows=False, level_ref: LevelRef | None = None,
):
    """One pyramid level's GN alignment; returns (T, chi2, H, n_used).

    With cache_windows (fine levels, where the pose correction left by
    the coarser level moves projections by at most a few px), each
    point's current-image neighborhood is fetched ONCE into a [16, 16]
    cache and every GN iteration samples inside it; points that drift
    out of their cache are masked out of that iteration's normal
    equations (not clamped — clamping would bias the pose)."""
    scale = 1.0 / (2.0 ** level)
    Hh, Ww = ref_img.shape
    N = px_ref.shape[0]

    from .pallas import align2d_kernel as _ak

    use_tpu_windows = _ak.on_tpu() and _ak.usable((Hh, Ww), PATCH + 2)
    if level_ref is None:
        level_ref = _prep_level(ref_img, cam, px_ref, p_ref, visible0, level)
    vis, ref_patch, J = level_ref[:3]
    gx, gy = _patch_offsets(ref_img.dtype)

    if (USE_FUSED_LEVEL and use_tpu_windows and not use_weights
            and level_ref.refp_lanes is not None):
        # Entire GN loop for this level as ONE Pallas kernel (window
        # gather + fused sampling/normal-equations/solve/retract with
        # gauss_newton's rollback semantics) — the per-iteration
        # kernel-launch chain of the while_loop path costs ~25 us/iter.
        from .pallas import sparse_align_fused as _sf
        if FUSED_VARIANT == 2:
            R_out, t_out, chi2, Hm = _sf.level_align_fused_v2(
                cur_img, level_ref.refp_lanes, level_ref.jlanes,
                level_ref.J, p_ref, vis,
                T_init.R, T_init.t, cam, level, distorted=True,
                n_iter=min(n_iter, 12), eps=1e-4,
            )
        else:
            R_out, t_out, chi2, Hm = _sf.level_align_fused(
                cur_img, level_ref.refp_lanes, level_ref.jlanes, p_ref, vis,
                T_init.R, T_init.t, cam, level, distorted=True,
                n_iter=min(n_iter, 12), eps=1e-4,
            )
        return SE3(R_out, t_out), chi2, Hm, jnp.sum(vis)

    use_cache = use_tpu_windows and cache_windows
    if use_cache:
        CWIN = 16
        half6 = (PATCH + 1) / 2.0           # 2.5 (6-point bilinear grid)
        cslack = (CWIN - PATCH - 3) / 2.0   # 4.5 px at this level
        px_c0 = cam.camera_to_pixel(T_init.apply(p_ref)) * scale
        px_c0 = jnp.nan_to_num(px_c0)
        ox = jnp.clip(
            jnp.floor(px_c0[:, 0] - half6) - jnp.floor(cslack), 0, Ww - CWIN
        ).astype(jnp.int32)
        oy = jnp.clip(
            jnp.floor(px_c0[:, 1] - half6) - jnp.floor(cslack), 0, Hh - CWIN
        ).astype(jnp.int32)
        cwins = _ak.gather_windows(cur_img, ox, oy, CWIN)    # [N,16,16]

        def sample_cached(px_cur):
            """6x6 bilinear window from the per-point cache; returns
            (p6c [N,6,6], inwin [N])."""
            posx = px_cur[:, 0] - half6 - ox
            posy = px_cur[:, 1] - half6 - oy
            inwin = (
                (posx >= 0.0) & (posx <= CWIN - PATCH - 3)
                & (posy >= 0.0) & (posy <= CWIN - PATCH - 3)
            )
            posx = jnp.clip(posx, 0.0, CWIN - PATCH - 3.0)
            posy = jnp.clip(posy, 0.0, CWIN - PATCH - 3.0)
            x0 = jnp.floor(posx).astype(jnp.int32)
            y0 = jnp.floor(posy).astype(jnp.int32)
            ax = (posx - x0)[:, None, None]
            ay = (posy - y0)[:, None, None]
            rows = y0[:, None] + jnp.arange(PATCH + 3)[None, :]
            cols = x0[:, None] + jnp.arange(PATCH + 3)[None, :]
            sub = jnp.take_along_axis(cwins, rows[:, :, None], axis=1)
            sub = jnp.take_along_axis(sub, cols[:, None, :], axis=2)
            s = PATCH + 2
            p6c = (
                sub[:, :s, :s] * (1 - ax) * (1 - ay)
                + sub[:, :s, 1:] * ax * (1 - ay)
                + sub[:, 1:, :s] * (1 - ax) * ay
                + sub[:, 1:, 1:] * ax * ay
            )
            return p6c, inwin

    def compute(T):
        p_cur = T.apply(p_ref)
        behind = p_cur[:, 2] < 1e-3
        px_cur = cam.camera_to_pixel(p_cur) * scale
        okc = vis & (~behind) & in_bounds(px_cur, Hh, Ww, margin=PATCH_HALF + 2)
        if use_cache:
            p6c, inwin = sample_cached(jnp.nan_to_num(px_cur))
            cur_patch = p6c[:, 1:5, 1:5].reshape(-1, PATCH_AREA)
            okc = okc & inwin
        elif use_tpu_windows:
            # Sample a size-6 window and take its interior: the grids
            # are nested (floor(c-2.5) = floor(c-1.5)-1), so this IS
            # the 4x4 patch — and it reuses the ref sampler's Mosaic
            # kernel signature (remote kernel compiles cost minutes;
            # one kernel per pyramid level instead of two).
            p6c = _ak.bilinear_patches(cur_img, px_cur, PATCH + 2)
            cur_patch = p6c[:, 1:5, 1:5].reshape(-1, PATCH_AREA)
        else:
            coords_c = jnp.stack(
                [px_cur[:, 0, None] + gx[None], px_cur[:, 1, None] + gy[None]],
                axis=-1,
            )
            cur_patch = bilinear(cur_img, coords_c)
        r = cur_patch - ref_patch                            # [N,16]
        w = okc[:, None].astype(r.dtype)
        if use_weights:
            sigma = jnp.maximum(
                robust.mad_scale(jnp.abs(r).reshape(-1), w.reshape(-1) > 0), 1.0
            )
            w = w * robust.tdist_weight(r / sigma)
        H = jnp.einsum("npa,np,npb->ab", J, w, J)
        b = -jnp.einsum("npa,np->a", J, w * r)
        chi2 = jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0)
        return H, b, chi2

    def retract(T, dxi):
        return T.compose(se3m.exp(dxi))

    # eps 1e-4 in the tangent is ~0.03 px at f=500 — far below noise;
    # enables early exit from the sequential GN loop (throughput).
    T_out, stats = gauss_newton(compute, retract, T_init, n_iter=n_iter, eps=1e-4)
    # The GN carry's (H, chi2) are already evaluated at T_out — no
    # extra compute() pass (each pass costs a Pallas window fetch on
    # the non-cached levels).
    return T_out, stats.chi2, stats.H, jnp.sum(vis)


class ReferencePrep(NamedTuple):
    """Precomputed reference side of sparse_image_align: 3D points in
    the ref camera + per-level patches/Jacobians.  Constant per
    keyframe; compute once with prepare_reference and pass to every
    sparse_image_align against that keyframe."""
    p_ref: jnp.ndarray              # [N, 3] ref-camera points
    levels: tuple                   # LevelRef per level, coarse..fine order
                                    # indexed [level]
    # Level-concatenated lane packs for the mega kernel (None off-TPU):
    # keyframe constants, hoisted here so the per-frame path carries no
    # multi-MB concats (XLA's invariant hoisting out of scan bodies is
    # not guaranteed).
    mega_refp: jnp.ndarray | None = None    # [N, L*FLAT]
    mega_jl: jnp.ndarray | None = None      # [N, L*6*FLAT]


def prepare_reference(
    ref_pyr: tuple[jnp.ndarray, ...],
    cam,
    px_ref: jnp.ndarray,
    depth_ref: jnp.ndarray,
    mask: jnp.ndarray,
    max_level: int | None = None,
    min_level: int = 0,
    distorted: bool = True,
) -> ReferencePrep:
    """Precompute everything sparse_image_align needs from the
    reference frame (the per-keyframe analog of
    precomputeReferencePatches, SparseImageAlign.cpp:59-122)."""
    if max_level is None:
        max_level = len(ref_pyr) - 1
    p_ref = cam.pixel_to_camera(px_ref, depth_ref, distorted=distorted)
    visible0 = mask & (depth_ref > 1e-3)
    levels = [None] * len(ref_pyr)
    for level in range(max_level, min_level - 1, -1):
        levels[level] = _prep_level(
            ref_pyr[level], cam, px_ref, p_ref, visible0, level
        )
    mega_refp = mega_jl = None
    if (min_level == 0 and levels[0] is not None
            and levels[0].refp_lanes is not None):
        n_lv = max_level - min_level + 1
        mega_refp = jnp.concatenate(
            [levels[li].refp_lanes for li in range(n_lv)], axis=1)
        mega_jl = jnp.concatenate(
            [levels[li].jlanes for li in range(n_lv)], axis=1)
    return ReferencePrep(p_ref=p_ref, levels=tuple(levels),
                         mega_refp=mega_refp, mega_jl=mega_jl)


class FrameWindows(NamedTuple):
    """All of one tracking step's VMEM window fetches, performed by ONE
    pallas_call (gather_frame_windows): the sparse-align levels' caches
    plus (optionally) the align2d patch caches.  Every gather depends
    only on the frame-INIT pose, so none of them waits on a kernel."""
    mega_wins: tuple | None          # per-level [N, CWIN, CWIN]
    a2d: object | None               # align2d_fused.A2DWindows


def gather_frame_windows(
    cur_pyr: tuple[jnp.ndarray, ...],
    cam,
    ref_prep: ReferencePrep,
    T_init: SE3,
    distorted: bool = True,
    max_level: int | None = None,
    a2d_centers: jnp.ndarray | None = None,
    a2d_img: jnp.ndarray | None = None,
) -> FrameWindows:
    """Fetch the frame's sparse-align level windows and (optionally)
    align2d cache windows in one fused gather kernel.

    `a2d_centers` are predicted patch positions (e.g. local-map points
    projected at the frame-init pose); passing them here instead of
    letting align2d gather at its refined init positions trades
    CACHE_SLACK margin (the pose correction, a couple of px at video
    rates) for a gather that overlaps the sparse-align kernel instead
    of serializing behind it."""
    from .pallas.sparse_align_mega import (
        mega_init_projection, mega_window_requests,
    )
    from .pallas import align2d_fused as _af
    from .pallas.align2d_kernel import gather_windows_grouped

    if max_level is None:
        max_level = len(cur_pyr) - 1
    n_levels = max_level + 1
    _, px0_l0 = mega_init_projection(
        ref_prep.p_ref, T_init.R, T_init.t, cam, distorted
    )
    reqs, _, _ = mega_window_requests(cur_pyr, px0_l0, n_levels)
    centers = ox = oy = None
    if a2d_centers is not None:
        img0 = cur_pyr[0] if a2d_img is None else a2d_img
        Hh, Ww = img0.shape
        centers = jnp.nan_to_num(a2d_centers.astype(img0.dtype))
        ox, oy = _af.a2d_window_origins(centers, Hh, Ww)
        reqs.append((img0, ox, oy, _af.CACHE_WIN))
    outs = gather_windows_grouped(reqs)
    a2d = None
    if a2d_centers is not None:
        a2d = _af.A2DWindows(wins=outs[n_levels], ox=ox, oy=oy,
                             center=centers)
    return FrameWindows(mega_wins=tuple(outs[:n_levels]), a2d=a2d)


def sparse_image_align(
    ref_pyr: tuple[jnp.ndarray, ...],
    cur_pyr: tuple[jnp.ndarray, ...],
    cam,
    px_ref: jnp.ndarray,
    depth_ref: jnp.ndarray,
    mask: jnp.ndarray,
    T_init: SE3,
    n_iter: int = 30,
    max_level: int | None = None,
    min_level: int = 0,
    use_weights: bool = False,
    distorted: bool = True,
    ref_prep: ReferencePrep | None = None,
    frame_windows: FrameWindows | None = None,
) -> AlignStats:
    """Coarse-to-fine sparse-direct alignment.

    Args:
      ref_pyr / cur_pyr: image pyramids (tuples, level 0 full-res).
      cam: PinholeCamera (level-0 intrinsics).
      px_ref: [N, 2] level-0 feature pixels in the ref frame.
      depth_ref: [N] feature depths in the ref frame (z, ref camera).
      mask: [N] validity (features with depth).
      T_init: initial T_cur_ref guess.
    Returns AlignStats with the refined relative pose (run: levels
    max->min, 30 GN iterations each, SparseImageAlign.cpp:39-47 via
    Matcher.cpp:18 defaults).
    """
    if max_level is None:
        max_level = len(ref_pyr) - 1
    if ref_prep is None:
        ref_prep = prepare_reference(
            ref_pyr, cam, px_ref, depth_ref, mask,
            max_level=max_level, min_level=min_level, distorted=distorted,
        )
    p_ref = ref_prep.p_ref
    visible0 = mask & (depth_ref > 1e-3)

    # Whole-alignment mega kernel: every level's GN loop in ONE Pallas
    # kernel, window gathers hoisted to the frame-init pose (they
    # become independent DMAs instead of a level-serialized chain).
    from .pallas import align2d_kernel as _ak

    if (USE_FUSED_LEVEL and FUSED_VARIANT == 3 and not use_weights
            and min_level == 0 and _ak.on_tpu()
            and ref_prep.levels[max_level] is not None
            and ref_prep.levels[max_level].refp_lanes is not None):
        from .pallas.sparse_align_mega import sparse_align_mega

        R_out, t_out, chi2, Hm = sparse_align_mega(
            cur_pyr, ref_prep.levels, p_ref, T_init.R, T_init.t, cam,
            distorted=distorted, max_level=max_level, min_level=0,
            n_iter=min(n_iter, 12), eps=1e-4,
            mega_refp=ref_prep.mega_refp, mega_jl=ref_prep.mega_jl,
            pregathered=(None if frame_windows is None
                         else frame_windows.mega_wins),
        )
        n_vis = jnp.sum(ref_prep.levels[0].vis)
        return AlignStats(T_cur_ref=SE3(R_out, t_out), chi2=chi2,
                          n_visible=n_vis, H=Hm)

    T = T_init
    chi2 = jnp.asarray(0.0, ref_pyr[0].dtype)
    H = jnp.zeros((6, 6), ref_pyr[0].dtype)
    n_vis = jnp.asarray(0, jnp.int32)
    for level in range(max_level, min_level - 1, -1):
        T, chi2, H, n_vis = _level_align(
            ref_pyr[level], cur_pyr[level], cam, px_ref, p_ref, visible0,
            T, n_iter, level, use_weights,
            # Fine levels start from the coarser level's solution, so
            # per-point motion is a few px at most — safe to serve all
            # GN iterations from one cached window per point.  The
            # coarsest level absorbs the unknown initial motion and
            # keeps per-iteration fetches.
            cache_windows=(level < max_level),
            level_ref=ref_prep.levels[level],
        )
    return AlignStats(T_cur_ref=T, chi2=chi2, n_visible=n_vis, H=H)
