"""Affine patch warping between views, batched.

TPU-native replacement for the reference's warp helpers used by
direct map-point projection (Matcher::GetWarpAffineMatrix
src/Algorithm/Matcher.cpp:420-436, Matcher::WarpAffine :438-466,
Matcher::GetBestSearchLevel Matcher.h:123-134).

All functions broadcast over N candidate points: the 2x2 affine is
derived by projecting three displaced points per candidate, the best
search level comes from its determinant, and the warped reference
patches are one batched bilinear gather.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import SE3
from .interp import bilinear

WARP_HALF = 4  # WarpHalfPatchSize (Basic/Common.h:90-91: 8x8 patches)


def warp_affine_matrix(
    cam,
    px_ref: jnp.ndarray,
    depth_ref: jnp.ndarray,
    level_ref: jnp.ndarray,
    T_cur_ref: SE3,
) -> jnp.ndarray:
    """Per-point 2x2 first-order affine A_cur_ref: how a pixel offset in
    the ref image maps to the cur image (GetWarpAffineMatrix).

    px_ref [N,2] level-0 pixels; depth_ref [N]; level_ref [N] int
    (the pyramid level the feature was detected on, scaling the probe
    offset like the reference's (1<<level)).
    """
    scale = (2.0 ** level_ref.astype(jnp.float32))[:, None]
    pt_ref = cam.pixel_to_camera(px_ref, depth_ref)
    du = cam.pixel_to_camera(
        px_ref + jnp.array([WARP_HALF, 0.0]) * scale, depth_ref
    )
    dv = cam.pixel_to_camera(
        px_ref + jnp.array([0.0, WARP_HALF]) * scale, depth_ref
    )
    px_cur = cam.camera_to_pixel(T_cur_ref.apply(pt_ref))
    px_du = cam.camera_to_pixel(T_cur_ref.apply(du))
    px_dv = cam.camera_to_pixel(T_cur_ref.apply(dv))
    col0 = (px_du - px_cur) / WARP_HALF
    col1 = (px_dv - px_cur) / WARP_HALF
    return jnp.stack([col0, col1], axis=-1)  # [N, 2, 2]


def best_search_level(A_cur_ref: jnp.ndarray, max_level: int) -> jnp.ndarray:
    """Pyramid level in the current frame where the warped patch is
    closest to unit scale (GetBestSearchLevel: halve until det <= 3)."""
    D = jnp.abs(jnp.linalg.det(A_cur_ref))
    # level = ceil(log4(D / 3)) clamped to [0, max_level].
    lvl = jnp.ceil(jnp.log(jnp.maximum(D / 3.0, 1e-9)) / jnp.log(4.0))
    return jnp.clip(lvl, 0, max_level).astype(jnp.int32)


def warp_patches(
    img_ref: jnp.ndarray,
    px_ref: jnp.ndarray,
    level_ref: jnp.ndarray,
    A_cur_ref: jnp.ndarray,
    search_level: jnp.ndarray,
    half_patch: int = WARP_HALF + 1,
) -> jnp.ndarray:
    """Warp reference patches into the current frame's geometry
    (WarpAffine, inverse map): output pixel (x, y) reads the ref image
    at A_cur_ref^-1 @ (x, y) * 2^search_level + px_ref/2^level_ref.

    img_ref is the ref pyramid level `level_ref` image — because level
    is per-point, callers pass the level-0 image and we scale px_ref
    only (adequate when features live on level 0; multi-level callers
    invoke once per level with masks).

    Returns [N, 2*half_patch, 2*half_patch] patches (default 10x10 =
    8x8 + 1px border for Align2D's gradients).
    """
    N = px_ref.shape[0]
    size = 2 * half_patch
    Ainv = jnp.linalg.inv(
        A_cur_ref + 1e-6 * jnp.eye(2, dtype=A_cur_ref.dtype)
    )
    d = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    gx, gy = jnp.meshgrid(d, d)
    offs = jnp.stack([gx, gy], axis=-1)                      # [s,s,2]
    scale_search = (2.0 ** search_level.astype(jnp.float32))[:, None, None, None]
    offs = offs[None] * scale_search                         # [N,s,s,2]
    src = jnp.einsum("nab,nijb->nija", Ainv, offs)
    scale_ref = (2.0 ** level_ref.astype(jnp.float32))[:, None]
    center = (px_ref / scale_ref)[:, None, None, :]
    return bilinear(img_ref, src + center)
