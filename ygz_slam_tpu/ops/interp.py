"""Bilinear sampling and patch extraction, batched.

TPU-native equivalent of the reference's per-pixel interpolation
helpers (cvutils::GetBilateralInterp* , include/ygz/Algorithm/CVUtils.h:43-71)
and the implicit patch gathers inside its aligners.  Coordinates are
(x, y) pixel convention matching the reference (u right, v down).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of `img [H, W]` at `xy [..., 2]` (x, y) coords.

    Out-of-range coordinates are clamped (callers mask validity
    separately with `in_bounds`).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0.astype(img.dtype)
    wy = y - y0.astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def in_bounds(xy: jnp.ndarray, h: int, w: int, margin: float = 0.0) -> jnp.ndarray:
    """Mask [...] of coords with a full bilinear support inside the image."""
    x, y = xy[..., 0], xy[..., 1]
    return (
        (x >= margin) & (y >= margin) & (x < w - 1 - margin) & (y < h - 1 - margin)
    )


def extract_patches(
    img: jnp.ndarray, centers: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Integer-aligned square patches around `centers [N, 2]` (x, y).

    Returns [N, size, size].  Centers are rounded; patches touching the
    border are shifted inside (callers should mask those separately).
    """
    H, W = img.shape
    half = size // 2
    cx = jnp.round(centers[..., 0]).astype(jnp.int32) - half
    cy = jnp.round(centers[..., 1]).astype(jnp.int32) - half
    cx = jnp.clip(cx, 0, W - size)
    cy = jnp.clip(cy, 0, H - size)

    def one(cx_i, cy_i):
        return jax.lax.dynamic_slice(img, (cy_i, cx_i), (size, size))

    return jax.vmap(one)(cx, cy)


def sample_patches(
    img: jnp.ndarray, centers: jnp.ndarray, size: int, offsets: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Bilinear patches at *sub-pixel* centers [N, 2] -> [N, size, size].

    The sampling grid is *symmetric* about the center: pixel (i, j)
    reads img at (x + j - (size-1)/2, y + i - (size-1)/2) bilinearly —
    matching align2d's interior grid so a border patch of size p+2
    yields exactly the p x p samples the aligner compares against
    (an asymmetric size//2 grid introduces a half-pixel bias).
    """
    d = jnp.arange(size, dtype=img.dtype) - (size - 1) / 2.0
    if offsets is None:
        gx = centers[:, None, None, 0] + d[None, None, :]
        gy = centers[:, None, None, 1] + d[None, :, None]
        gx = jnp.broadcast_to(gx, (centers.shape[0], size, size))
        gy = jnp.broadcast_to(gy, (centers.shape[0], size, size))
    else:
        gx = centers[:, None, None, 0] + offsets[..., 0]
        gy = centers[:, None, None, 1] + offsets[..., 1]
    return bilinear(img, jnp.stack([gx, gy], axis=-1))


def image_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients (dx, dy), same shape as img."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy
