"""Two-view triangulation, batched.

TPU-native equivalents of the reference's triangulators:
- `cvutils::DepthFromTriangulation` (include/ygz/Algorithm/CVUtils.h:18-38):
  2x3 least-squares depth along two bearing rays.
- `Initializer::Triangulate` (src/Algorithm/Initializer.cpp:649-668):
  linear DLT triangulation from two projection matrices.

Both broadcast over leading dims so a full match set triangulates in
one batched solve instead of the reference's per-point loop.
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import SE3


def depth_from_triangulation(
    T_cur_ref: SE3, f_ref: jnp.ndarray, f_cur: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth of a point along the *reference* bearing ray.

    Solves  [f_cur, -R f_ref] [d_cur, d_ref]^T = t  in least squares,
    exactly the 3x2 system of DepthFromTriangulation (CVUtils.h:24-38).

    Args:
      T_cur_ref: transform taking ref-frame points to cur frame (batched ok).
      f_ref, f_cur: bearing vectors [..., 3] (need not be unit norm).
    Returns:
      (depth_ref, ok): depth along f_ref [...], and a validity mask
      (False where the 2x2 normal matrix is near-singular — parallel rays).
    """
    Rf = jnp.einsum("...ij,...j->...i", T_cur_ref.R, f_ref)
    # A = [f_cur | -Rf]  (3x2), solve A x = t via normal equations.
    a00 = jnp.sum(f_cur * f_cur, axis=-1)
    a01 = -jnp.sum(f_cur * Rf, axis=-1)
    a11 = jnp.sum(Rf * Rf, axis=-1)
    b0 = jnp.sum(f_cur * T_cur_ref.t, axis=-1)
    b1 = -jnp.sum(Rf * T_cur_ref.t, axis=-1)
    det = a00 * a11 - a01 * a01
    ok = jnp.abs(det) > 1e-9
    det_safe = jnp.where(ok, det, 1.0)
    # x = A^-1 b ; depth along f_ref is the second unknown.
    depth_ref = (a00 * b1 - a01 * b0) / det_safe
    return depth_ref, ok


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Linear (DLT) triangulation from two 3x4 projection matrices.

    Mirrors Initializer::Triangulate (Initializer.cpp:649-668) but
    batched: builds the 4x4 design matrix per correspondence and takes
    the null vector via SVD.

    Args:
      P1, P2: [..., 3, 4] projection matrices (may broadcast).
      x1, x2: [..., 2] image observations (in the same units as P).
    Returns:
      [..., 3] Euclidean points.
    """
    rows = [
        x1[..., 0:1, None] * P1[..., 2:3, :] - P1[..., 0:1, :],
        x1[..., 1:2, None] * P1[..., 2:3, :] - P1[..., 1:2, :],
        x2[..., 0:1, None] * P2[..., 2:3, :] - P2[..., 0:1, :],
        x2[..., 1:2, None] * P2[..., 2:3, :] - P2[..., 1:2, :],
    ]
    A = jnp.concatenate(rows, axis=-2)  # [..., 4, 4]
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w_safe[..., None]


def reprojection_error(
    pw: jnp.ndarray, T_cw: SE3, obs_px: jnp.ndarray, cam
) -> jnp.ndarray:
    """Pixel reprojection error norm [...] for a batch of points."""
    proj = cam.world_to_pixel(pw, T_cw)
    return jnp.linalg.norm(proj - obs_px, axis=-1)
