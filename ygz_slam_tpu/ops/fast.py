"""FAST corner detection + Shi-Tomasi scoring + gridded selection,
fully vectorized over the image plane.

TPU-native replacement for libfast's SSE2/NEON FAST-10 + nonmax
(reference: src/Algorithm/FeatureDetector.cpp:345-444 uses
fast_corner_detect_10_sse2, fast_nonmax_3x3, then one best corner per
grid cell scored by ShiTomasiScore, :467-507).

Design: the reference runs a hand-SIMD scalar scan producing a sparse
corner list, then per-corner scalar scoring.  Here the *entire image*
is the data-parallel dimension: the 16-pixel Bresenham circle test is
evaluated for every pixel at once with shifted image views (pure VPU
work, no gathers), Shi-Tomasi is computed densely from gradient maps,
non-max suppression is a 3x3 max-pool compare, and grid selection is
a reshape + per-cell argmax — giving fixed-shape [N] feature tensors
that the rest of the pipeline consumes (XLA needs static shapes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

# Bresenham circle of radius 3 (same 16 offsets as FAST); (dx, dy).
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
BORDER = 3


def _shift(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """View of img displaced by (dx, dy) with edge clamping: out[y, x] =
    img[y + dy, x + dx].  Border pixels are masked out of the corner
    test anyway, so clamping is safe and avoids dynamic pads."""
    H, W = img.shape
    y0 = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    x0 = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[y0][:, x0]


def fast_score_map(
    img: jnp.ndarray, threshold: float, arc_length: int = 10
) -> jnp.ndarray:
    """Boolean corner map via the FAST segment test (default FAST-10,
    matching fast_corner_detect_10; reference dispatch
    FeatureDetector.cpp:365-377).

    A pixel is a corner if >= arc_length *contiguous* circle pixels are
    all brighter than center+t or all darker than center-t.  The
    contiguity test runs as arc_length-deep AND-reductions over all 16
    rotations of the circle — 16 x arc_length boolean ops over the
    whole image, pure VPU.
    """
    ring = jnp.stack([_shift(img, dx, dy) for (dx, dy) in CIRCLE])  # [16,H,W]
    bright = ring > (img + threshold)[None]
    dark = ring < (img - threshold)[None]

    def has_arc(flags):
        # flags [16, H, W] -> any contiguous circular run >= arc_length
        doubled = jnp.concatenate([flags, flags[: arc_length - 1]], axis=0)
        ok = jnp.zeros(img.shape, dtype=bool)
        for start in range(16):
            run = jnp.all(doubled[start : start + arc_length], axis=0)
            ok = ok | run
        return ok

    corner = has_arc(bright) | has_arc(dark)
    # Mask the border where the circle would leave the image.
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (
        (yy >= BORDER) & (yy < H - BORDER) & (xx >= BORDER) & (xx < W - BORDER)
    )
    return corner & inside


def shi_tomasi_map(img: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Dense Shi-Tomasi (min eigenvalue of the structure tensor) score
    for every pixel, matching ShiTomasiScore's 8x8 box of central
    differences normalized by 2*box_area (FeatureDetector.cpp:467-507).
    """
    dx = 0.5 * (_shift(img, 1, 0) - _shift(img, -1, 0))
    dy = 0.5 * (_shift(img, 0, 1) - _shift(img, 0, -1))
    # The reference uses unhalved differences; keep its scaling: its
    # dx = right-left = 2 * central, and normalizes by 2*box_area.
    dx = dx * 2.0
    dy = dy * 2.0
    box = 2 * halfbox

    def box_sum(x):
        # Sum over a box x box window anchored like the reference:
        # rows [v-h, v+h), cols [u-h, u+h) -> use cumsum (integral image).
        ii = jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
        ii = jnp.pad(ii, ((1, 0), (1, 0)))
        # window sum at (v, u) = sum over rows [v-h, v+h), cols [u-h, u+h)
        h = halfbox
        core = (
            ii[box:, box:] - ii[:-box, box:] - ii[box:, :-box] + ii[:-box, :-box]
        )
        out = jnp.zeros_like(x)
        return lax.dynamic_update_slice(out, core, (h, h))

    dxx = box_sum(dx * dx)
    dyy = box_sum(dy * dy)
    dxy = box_sum(dx * dy)
    norm = 1.0 / (2.0 * box * box)
    dxx, dyy, dxy = dxx * norm, dyy * norm, dxy * norm
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


def nonmax_3x3(score: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3 local maxima of `score` among `mask` pixels
    (fast_nonmax_3x3 equivalent via max-pool compare)."""
    s = jnp.where(mask, score, -jnp.inf)
    m = lax.reduce_window(
        s, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    return mask & (s >= m) & jnp.isfinite(s)


class Corners(NamedTuple):
    """Fixed-capacity corner set for one pyramid level."""

    xy: jnp.ndarray     # [N, 2] float (x, y) at the *detection level*'s scale
    score: jnp.ndarray  # [N]
    mask: jnp.ndarray   # [N] bool — rows beyond the detected count are invalid


def grid_select(
    score: jnp.ndarray,
    corner_mask: jnp.ndarray,
    cell: int,
    max_corners: int,
    min_score: float = 1e-5,
) -> Corners:
    """One best corner per cell x cell grid cell, then global top-K to a
    fixed capacity (the reference keeps one best feature per cell,
    FeatureDetector.cpp:390-426; capacity replaces its dynamic vector).
    """
    H, W = score.shape
    Hc, Wc = H // cell, W // cell
    s = jnp.where(corner_mask, score, -jnp.inf)
    s = s[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    s = s.transpose(0, 2, 1, 3).reshape(Hc * Wc, cell * cell)
    best = jnp.argmax(s, axis=1)
    best_score = jnp.take_along_axis(s, best[:, None], axis=1)[:, 0]
    cy = best // cell + (jnp.arange(Hc * Wc) // Wc) * cell
    cx = best % cell + (jnp.arange(Hc * Wc) % Wc) * cell
    valid = jnp.isfinite(best_score) & (best_score > min_score)
    # Global top-K across cells.
    k = min(max_corners, Hc * Wc)
    top_scores, top_idx = lax.top_k(jnp.where(valid, best_score, -jnp.inf), k)
    xy = jnp.stack(
        [cx[top_idx].astype(jnp.float32), cy[top_idx].astype(jnp.float32)],
        axis=-1,
    )
    mask = jnp.isfinite(top_scores)
    out_scores = jnp.where(mask, top_scores, 0.0)
    if k < max_corners:
        pad = max_corners - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        out_scores = jnp.concatenate([out_scores, jnp.zeros(pad)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    return Corners(xy=xy, score=out_scores, mask=mask)


def detect(
    img: jnp.ndarray,
    threshold: float,
    cell: int,
    max_corners: int,
    arc_length: int = 10,
    min_score: float = 1e-5,
) -> Corners:
    """Full single-level detection: FAST mask -> dense Shi-Tomasi ->
    3x3 nonmax -> grid selection to a fixed-capacity corner set."""
    corner = fast_score_map(img, threshold, arc_length)
    score = shi_tomasi_map(img)
    keep = nonmax_3x3(score, corner)
    return grid_select(score, keep, cell, max_corners, min_score)
