"""Zero-mean SSD patch scoring + discrete epipolar-line search.

TPU-native replacement for the reference's legacy
FindEpipolarMatchDirect + ZMSSD machinery (include/ygz/utils.h:221-230
and :269-465 — the PTAM-derived hand-unrolled SSE2 8x8 patch scorer
at :336-444; src/utils.cpp:330-...).

The hand-SIMD 64-pixel scorer becomes a batched tensor contraction:
all N candidates x S samples along each epipolar segment score in one
fused pass; the continuous refinement afterwards is ops.align.align1d
(the reference follows its discrete search with subpixel alignment
too).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .interp import bilinear, in_bounds

PATCH = 8


def zmssd(ref_patch: jnp.ndarray, cur_patches: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean SSD between one reference patch per row and a set of
    candidate patches: [N, p, p] x [N, S, p, p] -> [N, S] scores.

    score = sum((cur - mean(cur)) - (ref - mean(ref)))^2 — exactly the
    ZMSSD the SSE2 code computes, for all rows/candidates at once."""
    rz = ref_patch - jnp.mean(ref_patch, axis=(-2, -1), keepdims=True)
    cz = cur_patches - jnp.mean(cur_patches, axis=(-2, -1), keepdims=True)
    d = cz - rz[:, None]
    return jnp.sum(d * d, axis=(-2, -1))


class EpipolarMatch(NamedTuple):
    xy: jnp.ndarray        # [N, 2] best position on the segment
    score: jnp.ndarray     # [N] best ZMSSD
    ok: jnp.ndarray        # [N]


def epipolar_search(
    cur_img: jnp.ndarray,
    ref_patches: jnp.ndarray,   # [N, 8, 8] (already warped)
    px_a: jnp.ndarray,          # [N, 2] segment start (min depth proj)
    px_b: jnp.ndarray,          # [N, 2] segment end (max depth proj)
    mask: jnp.ndarray,
    n_samples: int = 32,
    max_score: float = 2e4,
) -> EpipolarMatch:
    """Discrete ZMSSD search along epipolar segments, batched over all
    N seeds (FindEpipolarMatchDirect's scan loop).  Callers refine the
    winner with align1d/align2d for subpixel accuracy."""
    H, W = cur_img.shape
    t = jnp.linspace(0.0, 1.0, n_samples)[None, :, None]     # [1,S,1]
    centers = px_a[:, None, :] * (1 - t) + px_b[:, None, :] * t  # [N,S,2]
    d = jnp.arange(PATCH, dtype=cur_img.dtype) - (PATCH - 1) / 2.0
    gx, gy = jnp.meshgrid(d, d)
    coords = jnp.stack(
        [
            centers[..., 0][..., None, None] + gx,
            centers[..., 1][..., None, None] + gy,
        ],
        axis=-1,
    )                                                        # [N,S,p,p,2]
    cur = bilinear(cur_img, coords)
    scores = zmssd(ref_patches, cur)                         # [N,S]
    inb = in_bounds(centers, H, W, margin=PATCH / 2 + 1)
    scores = jnp.where(inb, scores, jnp.inf)
    best = jnp.argmin(scores, axis=1)
    best_score = jnp.min(scores, axis=1)
    xy = jnp.take_along_axis(centers, best[:, None, None], axis=1)[:, 0]
    ok = mask & jnp.isfinite(best_score) & (best_score < max_score)
    return EpipolarMatch(xy=xy, score=best_score, ok=ok)
