"""Rectified stereo matching: per-feature depth from a left/right pair.

The reference *declares* a STEREO sensor mode (include/ygz/system.h:
19-21, TrackStereo :49-52) but contains no stereo code at all.  This
module implements it TPU-natively so the System facade's sensor
switching is real: for each left-image feature, a batched ZMSSD scan
along the horizontal epipolar segment (disparity range from the depth
prior) followed by subpixel align1d refinement, then depth = fx*b/d.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .zmssd import epipolar_search
from .align import align1d
from .interp import sample_patches, in_bounds


class StereoDepth(NamedTuple):
    depth: jnp.ndarray      # [N] z-depth in the left camera (-1 invalid)
    disparity: jnp.ndarray  # [N] px
    ok: jnp.ndarray         # [N]


def match_stereo(
    left_img: jnp.ndarray,
    right_img: jnp.ndarray,
    px_left: jnp.ndarray,     # [N, 2]
    valid: jnp.ndarray,       # [N]
    fx,
    baseline: float,
    min_depth: float = 0.3,
    max_depth: float = 20.0,
    n_samples: int = 48,
    max_err: float = 20.0,
) -> StereoDepth:
    """Batched rectified stereo matching.

    Disparity search range comes from [min_depth, max_depth]; the
    coarse ZMSSD scan localizes the match, align1d (epipolar direction
    (−1, 0)) refines to subpixel; a left-right consistency margin is
    enforced by the alignment residual gate.
    """
    H, W = left_img.shape
    fxb = fx * baseline
    d_min = fxb / max_depth
    d_max = fxb / min_depth
    patches = sample_patches(left_img, px_left, 8)
    px_a = px_left - jnp.stack(
        [jnp.full(px_left.shape[0], d_min), jnp.zeros(px_left.shape[0])],
        axis=-1,
    )
    px_b = px_left - jnp.stack(
        [jnp.full(px_left.shape[0], d_max), jnp.zeros(px_left.shape[0])],
        axis=-1,
    )
    m = epipolar_search(
        right_img, patches, px_a, px_b, valid, n_samples=n_samples
    )
    patches10 = sample_patches(left_img, px_left, 10)
    direction = jnp.tile(jnp.asarray([[1.0, 0.0]]), (px_left.shape[0], 1))
    res = align1d(right_img, patches10, m.xy, direction, max_error=max_err)
    disparity = px_left[:, 0] - res.xy[:, 0]
    # Left-right consistency: independently re-SEARCH the right patch
    # in the left image over the mirrored disparity range; a true match
    # comes back to px_left, a texture-alias lock does not (self-similar
    # scenes produce low-residual false matches when the true disparity
    # lies outside the search range).  The back-match must be a search,
    # not an alignment seeded at px_left (that converges trivially).
    patches_r = sample_patches(right_img, res.xy, 8)
    bx_a = res.xy + jnp.stack(
        [jnp.full(res.xy.shape[0], d_min), jnp.zeros(res.xy.shape[0])],
        axis=-1,
    )
    bx_b = res.xy + jnp.stack(
        [jnp.full(res.xy.shape[0], d_max), jnp.zeros(res.xy.shape[0])],
        axis=-1,
    )
    mb = epipolar_search(
        left_img, patches_r, bx_a, bx_b, valid, n_samples=n_samples
    )
    back = align1d(
        left_img, sample_patches(right_img, res.xy, 10), mb.xy,
        direction, max_error=max_err,
    )
    lr_ok = (
        mb.ok
        & back.converged
        & (jnp.abs(back.xy[:, 0] - px_left[:, 0]) < 1.5)
        & (jnp.abs(back.xy[:, 1] - px_left[:, 1]) < 1.5)
    )
    ok = (
        valid
        & m.ok
        & res.converged
        & lr_ok
        & (disparity > jnp.maximum(d_min, 0.1))
        & (disparity < d_max)
        & in_bounds(res.xy, H, W, margin=4.0)
    )
    depth = jnp.where(ok, fxb / jnp.maximum(disparity, 1e-6), -1.0)
    return StereoDepth(depth=depth, disparity=disparity, ok=ok)
