"""Batched inverse-compositional patch alignment (direct method core).

TPU-native replacement for the reference's hand-SIMD aligners:
- cvutils::Align2D (src/Algorithm/CVUtils.cpp:186-318) and its
  SSE2/NEON variants (:322-487, :489-...): 8x8 inverse-compositional
  Gauss-Newton on (du, dv, mean_diff), 10 iterations, 0.03 px
  convergence.
- cvutils::Align1D (:64-184): alignment constrained to an epipolar
  direction.
- The batched KLT below replaces cv::calcOpticalFlowPyrLK
  (src/Algorithm/Tracker.cpp:92-98; win 21, 4 levels).

Where the reference aligns one patch at a time with intrinsics, every
aligner here runs all N points simultaneously: per-point 3x3 (or 2x2)
normal equations are closed-form solves on the VPU, and the fixed
iteration count runs as a `lax.fori_loop` with per-point convergence
masking — the batch dimension replaces SSE lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .interp import bilinear, in_bounds


class AlignResult(NamedTuple):
    xy: jnp.ndarray         # [N, 2] refined positions
    converged: jnp.ndarray  # [N] bool
    error: jnp.ndarray      # [N] final mean abs residual


def _patch_grid(size: int, dtype=jnp.float32):
    d = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    gx, gy = jnp.meshgrid(d, d)  # gx varies along columns
    return gx, gy


def align2d(
    cur_img: jnp.ndarray,
    ref_patch_border: jnp.ndarray,
    xy_init: jnp.ndarray,
    n_iter: int = 10,
    patch: int = 8,
    conv_eps: float = 0.03,
    max_error: float = 30.0,
    use_tpu: bool | None = None,
    prep=None,
    origin_xy: jnp.ndarray | None = None,
    pregathered=None,
) -> AlignResult:
    """Batched Align2D: refine N 2-D positions in `cur_img` so the local
    patch matches the reference patch, estimating (du, dv, mean_diff).

    Args:
      cur_img: [H, W] target image (one pyramid level).
      ref_patch_border: [N, patch+2, patch+2] reference patches *with a
        1-px border* (for gradients), already warped to the target
        level (the reference warps with GetWarpAffineMatrix first).
      xy_init: [N, 2] initial positions (patch centers) in cur_img.
      origin_xy: optional [N, 2] window-gather centers (TPU path only).
        Passing a pose-PREDICTED projection here decouples the VMEM
        window fetch from upstream kernels that refine xy_init; results
        are additionally gated on drift from origin_xy so the reduced
        slack never admits clamped samples.
    Returns:
      AlignResult with refined positions, convergence mask and final
      mean |residual| per point (for acceptance gating).
    """
    N = ref_patch_border.shape[0]
    H, W = cur_img.shape
    # TPU fast path: the whole-image-in-VMEM Pallas window kernel runs
    # the same optimization ~4.5x faster than the XLA-gather loop.
    from .pallas import align2d_kernel as _ak

    tpu_ok = _ak.on_tpu() if use_tpu is None else use_tpu
    if tpu_ok and _ak.usable((H, W), patch + 3) and patch == 8:
        from .pallas import align2d_fused as _af

        xy0 = xy_init.astype(cur_img.dtype)
        inb0 = in_bounds(xy0, H, W, margin=patch / 2 + 2)
        xy0s = jnp.where(inb0[:, None], xy0, jnp.full_like(xy0, patch + 2.0))
        if prep is None:
            prep = _af.align2d_prepare(ref_patch_border)
        org = None
        if pregathered is not None:
            # Windows (and their centers) were fetched up front by
            # gather_frame_windows; gate drift against those centers.
            org = pregathered.center
        elif origin_xy is not None:
            org = jnp.nan_to_num(origin_xy.astype(cur_img.dtype))
            org = jnp.where(inb0[:, None], org, jnp.full_like(org, patch + 2.0))
        xy, mean_diff, err = _af.align2d_fused(
            cur_img, prep, xy0s, n_iter=n_iter, conv_eps=conv_eps,
            origin_xy=None if pregathered is not None else org,
            pregathered=pregathered,
        )
        inb = in_bounds(xy, H, W, margin=patch / 2 + 1)
        drift = jnp.linalg.norm(xy - xy_init, axis=-1)
        # The cached-window kernel clamps sampling beyond CACHE_SLACK
        # px of drift — such points must be rejected, not trusted.
        max_drift = min(patch * 2.0, float(_ak.CACHE_SLACK))
        converged = inb0 & inb & (err < max_error) & (drift < max_drift)
        if org is not None:
            # Window centered at origin_xy: clamp kicks in relative to
            # it, so gate that drift too.
            converged = converged & (
                jnp.linalg.norm(xy - org, axis=-1) < float(_ak.CACHE_SLACK)
            )
        return AlignResult(xy=xy, converged=converged, error=err)
    # Interior reference patch and its gradients (inverse compositional:
    # Jacobians live on the reference, computed once).
    ref = ref_patch_border[:, 1:-1, 1:-1]                       # [N,p,p]
    dx = 0.5 * (ref_patch_border[:, 1:-1, 2:] - ref_patch_border[:, 1:-1, :-2])
    dy = 0.5 * (ref_patch_border[:, 2:, 1:-1] - ref_patch_border[:, :-2, 1:-1])
    J = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)         # [N,p,p,3]
    Jf = J.reshape(N, -1, 3)
    H3 = jnp.einsum("npa,npb->nab", Jf, Jf)                     # [N,3,3]
    Hinv = jnp.linalg.inv(H3 + 1e-6 * jnp.eye(3))
    gx, gy = _patch_grid(patch, cur_img.dtype)

    def cond(state):
        _, _, active, it = state
        return jnp.any(active) & (it < n_iter)

    def body(state):
        xy, mean_diff, active, it = state
        coords = jnp.stack(
            [
                xy[:, 0, None, None] + gx[None],
                xy[:, 1, None, None] + gy[None],
            ],
            axis=-1,
        )                                                        # [N,p,p,2]
        cur = bilinear(cur_img, coords)
        r = (cur - ref + mean_diff[:, None, None]).reshape(N, -1)
        upd = jnp.einsum("nab,npb,np->na", Hinv, Jf, r)          # [N,3]
        # Inverse-compositional: subtract the update.
        xy_new = xy - upd[:, :2]
        mean_new = mean_diff - upd[:, 2]
        step = jnp.linalg.norm(upd[:, :2], axis=-1)
        still = active & (step >= conv_eps)
        xy = jnp.where(active[:, None], xy_new, xy)
        mean_diff = jnp.where(active, mean_new, mean_diff)
        return xy, mean_diff, still, it + 1

    xy0 = xy_init.astype(cur_img.dtype)
    inb0 = in_bounds(xy0, H, W, margin=patch / 2 + 2)
    xy0 = jnp.where(inb0[:, None], xy0, jnp.full_like(xy0, patch + 2.0))
    state = (xy0, jnp.zeros(N, cur_img.dtype), inb0,
             jnp.asarray(0, jnp.int32))
    # while_loop with an all-converged early exit: typical batches
    # settle in 3-5 iterations, and the per-iteration gather is the
    # cost center.
    xy, mean_diff, active, _ = jax.lax.while_loop(cond, body, state)
    # Final residual for acceptance.
    coords = jnp.stack(
        [xy[:, 0, None, None] + gx[None], xy[:, 1, None, None] + gy[None]],
        axis=-1,
    )
    cur = bilinear(cur_img, coords)
    err = jnp.mean(jnp.abs(cur - ref + mean_diff[:, None, None]), axis=(1, 2))
    inb = in_bounds(xy, H, W, margin=patch / 2 + 1)
    drift = jnp.linalg.norm(xy - xy_init, axis=-1)
    converged = inb0 & inb & (err < max_error) & (drift < patch * 2.0)
    return AlignResult(xy=xy, converged=converged, error=err)


def align1d(
    cur_img: jnp.ndarray,
    ref_patch_border: jnp.ndarray,
    xy_init: jnp.ndarray,
    direction: jnp.ndarray,
    n_iter: int = 10,
    patch: int = 8,
    conv_eps: float = 0.03,
    max_error: float = 30.0,
) -> AlignResult:
    """Batched Align1D: like align2d but motion is constrained to a unit
    `direction [N, 2]` (the epipolar line), estimating (step, mean_diff)
    (CVUtils.cpp:64-184)."""
    N = ref_patch_border.shape[0]
    H, W = cur_img.shape
    ref = ref_patch_border[:, 1:-1, 1:-1]
    dx = 0.5 * (ref_patch_border[:, 1:-1, 2:] - ref_patch_border[:, 1:-1, :-2])
    dy = 0.5 * (ref_patch_border[:, 2:, 1:-1] - ref_patch_border[:, :-2, 1:-1])
    dir_ = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9
    )
    dd = dx * dir_[:, None, None, 0] + dy * dir_[:, None, None, 1]
    J = jnp.stack([dd, jnp.ones_like(dd)], axis=-1).reshape(N, -1, 2)
    H2 = jnp.einsum("npa,npb->nab", J, J)
    Hinv = jnp.linalg.inv(H2 + 1e-6 * jnp.eye(2))
    gx, gy = _patch_grid(patch, cur_img.dtype)

    def body(_, state):
        s, mean_diff, active = state
        xy = xy_init + s[:, None] * dir_
        coords = jnp.stack(
            [xy[:, 0, None, None] + gx[None], xy[:, 1, None, None] + gy[None]],
            axis=-1,
        )
        cur = bilinear(cur_img, coords)
        r = (cur - ref + mean_diff[:, None, None]).reshape(N, -1)
        upd = jnp.einsum("nab,npb,np->na", Hinv, J, r)
        s_new = s - upd[:, 0]
        mean_new = mean_diff - upd[:, 1]
        still = active & (jnp.abs(upd[:, 0]) >= conv_eps)
        s = jnp.where(active, s_new, s)
        mean_diff = jnp.where(active, mean_new, mean_diff)
        return s, mean_diff, still

    state = (
        jnp.zeros(N, cur_img.dtype),
        jnp.zeros(N, cur_img.dtype),
        jnp.ones(N, bool),
    )
    s, mean_diff, _ = jax.lax.fori_loop(0, n_iter, body, state)
    xy = xy_init + s[:, None] * dir_
    coords = jnp.stack(
        [xy[:, 0, None, None] + gx[None], xy[:, 1, None, None] + gy[None]],
        axis=-1,
    )
    cur = bilinear(cur_img, coords)
    err = jnp.mean(jnp.abs(cur - ref + mean_diff[:, None, None]), axis=(1, 2))
    inb = in_bounds(xy, H, W, margin=patch / 2 + 1)
    converged = inb & (err < max_error)
    return AlignResult(xy=xy, converged=converged, error=err)


def klt_pyramidal(
    ref_pyr: tuple[jnp.ndarray, ...],
    cur_pyr: tuple[jnp.ndarray, ...],
    xy_ref: jnp.ndarray,
    xy_init: jnp.ndarray | None = None,
    win: int = 21,
    iters: int = 10,
    min_eig: float = 1e-3,
    max_residual: float = 25.0,
) -> AlignResult:
    """Batched pyramidal Lucas-Kanade tracking (the KLT Tracker,
    src/Algorithm/Tracker.cpp:65-113: win 21, 4 levels,
    OPTFLOW_USE_INITIAL_FLOW semantics via `xy_init`).

    Coarse-to-fine over the shared pyramid; per level an
    inverse-compositional translation-only GN with the reference
    window's 2x2 normal matrix.  All N tracks advance together.
    """
    n_levels = len(ref_pyr)
    N = xy_ref.shape[0]
    if xy_init is None:
        xy_init = xy_ref
    scale_top = 2.0 ** (n_levels - 1)
    xy = xy_init / scale_top
    half = (win - 1) / 2.0
    d = jnp.arange(win, dtype=jnp.float32) - half
    gx, gy = jnp.meshgrid(d, d)

    from .pallas import align2d_kernel as _ak

    for lvl in range(n_levels - 1, -1, -1):
        ref_img = ref_pyr[lvl]
        cur_img = cur_pyr[lvl]
        Hl, Wl = ref_img.shape
        use_tpu = _ak.on_tpu() and _ak.usable((Hl, Wl), win + 3)
        xyr = xy_ref / (2.0 ** lvl)
        # Reference window + gradients at this level (fixed during iters).
        if use_tpu:
            # One (win+2)-sized VMEM window supplies the window and its
            # central-difference gradients.
            p2 = _ak.bilinear_patches(ref_img, xyr, win + 2)
            ref_w = p2[:, 1:-1, 1:-1]
            Ix = 0.5 * (p2[:, 1:-1, 2:] - p2[:, 1:-1, :-2])
            Iy = 0.5 * (p2[:, 2:, 1:-1] - p2[:, :-2, 1:-1])
        else:
            coords_r = jnp.stack(
                [xyr[:, 0, None, None] + gx[None],
                 xyr[:, 1, None, None] + gy[None]],
                axis=-1,
            )
            ref_w = bilinear(ref_img, coords_r)                  # [N,w,w]
            rx = bilinear(ref_img, coords_r + jnp.array([1.0, 0.0]))
            lx = bilinear(ref_img, coords_r + jnp.array([-1.0, 0.0]))
            uy = bilinear(ref_img, coords_r + jnp.array([0.0, -1.0]))
            dyy = bilinear(ref_img, coords_r + jnp.array([0.0, 1.0]))
            Ix = 0.5 * (rx - lx)
            Iy = 0.5 * (dyy - uy)
        Ixx = jnp.sum(Ix * Ix, axis=(1, 2))
        Iyy = jnp.sum(Iy * Iy, axis=(1, 2))
        Ixy = jnp.sum(Ix * Iy, axis=(1, 2))
        det = Ixx * Iyy - Ixy * Ixy
        tr = Ixx + Iyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        trackable = eig_min / (win * win) > min_eig
        det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)

        def body(_, xy):
            if use_tpu:
                cur_w = _ak.bilinear_patches(cur_img, xy, win)
            else:
                coords_c = jnp.stack(
                    [xy[:, 0, None, None] + gx[None],
                     xy[:, 1, None, None] + gy[None]],
                    axis=-1,
                )
                cur_w = bilinear(cur_img, coords_c)
            r = cur_w - ref_w
            bx = jnp.sum(Ix * r, axis=(1, 2))
            by = jnp.sum(Iy * r, axis=(1, 2))
            du = (Iyy * bx - Ixy * by) / det_safe
            dv = (Ixx * by - Ixy * bx) / det_safe
            upd = jnp.stack([du, dv], axis=-1)
            return xy - jnp.where(trackable[:, None], upd, 0.0)

        xy = jax.lax.fori_loop(0, iters, body, xy)
        if lvl > 0:
            xy = xy * 2.0

    # Final acceptance on the base level.
    ref_img, cur_img = ref_pyr[0], cur_pyr[0]
    coords_r = jnp.stack(
        [xy_ref[:, 0, None, None] + gx[None], xy_ref[:, 1, None, None] + gy[None]],
        axis=-1,
    )
    coords_c = jnp.stack(
        [xy[:, 0, None, None] + gx[None], xy[:, 1, None, None] + gy[None]],
        axis=-1,
    )
    ref_w = bilinear(ref_img, coords_r)
    cur_w = bilinear(cur_img, coords_c)
    ref_mean = jnp.mean(ref_w, axis=(1, 2), keepdims=True)
    cur_mean = jnp.mean(cur_w, axis=(1, 2), keepdims=True)
    err = jnp.mean(jnp.abs((cur_w - cur_mean) - (ref_w - ref_mean)), axis=(1, 2))
    H0, W0 = cur_img.shape
    ok = (
        in_bounds(xy, H0, W0, margin=2.0)
        & in_bounds(xy_ref, H0, W0, margin=2.0)
        & (err < max_residual)
        & jnp.isfinite(xy).all(axis=-1)
    )
    return AlignResult(xy=xy, converged=ok, error=err)
