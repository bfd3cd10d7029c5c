"""SO(3) manifold operations, batched over arbitrary leading dims.

TPU-native replacement for the reference's vendored Sophus `SO3`
(reference: thirdparty/Sophus/sophus/so3.cpp; used via typedefs in
include/ygz/Basic/Common.h:36-39).  Rotations are stored as 3x3
matrices for compute and quaternions (wxyz) for compact serialization.

All functions are pure, jittable, and broadcast over leading batch
dimensions; Taylor expansions guard the small-angle limit so gradients
stay finite at theta = 0.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: tangent [..., 3] -> rotation matrix [..., 3, 3].

    Small-angle-safe: sin(t)/t and (1-cos t)/t^2 use Taylor fallbacks.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # Double-where: keep the untaken branch finite so autodiff through
    # the division does not produce NaN gradients at theta = 0.
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(theta)/theta  and  (1 - cos(theta))/theta^2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> tangent [..., 3].

    Uses the trace formula with a small-angle Taylor guard; the
    near-pi case is handled via the symmetric part (diagonal-dominant
    axis extraction), accurate to ~1e-6 for float32 use.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    theta2 = theta * theta
    # theta / (2 sin theta), Taylor-guarded
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta2 / 12.0,
        theta / (2.0 * jnp.maximum(sin_t, _EPS)),
    )
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    w = factor[..., None] * w_skew
    # Near theta = pi the antisymmetric part vanishes; recover axis from
    # the diagonal of R = I + 2*sin^2(t/2)*(aa^T - I) => aa^T = (R + I)/2.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal sums (a_i * a_j = (R_ij + R_ji)/4 / s^2...)
    # Use the largest-axis column of (R + I) for a stable sign pattern.
    RpI = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    major = jnp.argmax(axis2, axis=-1)
    col = jnp.take_along_axis(
        RpI, major[..., None, None].repeat(3, axis=-2), axis=-1
    )[..., 0]
    norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis_pi = col / jnp.maximum(norm, _EPS)
    w_pi = axis_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize via SVD (projects onto SO(3))."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype)
    d = d.at[..., 2].set(det)
    return u @ (d[..., :, None] * vt)


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Shepperd's method via the four squared components; branch-free
    (computes all four candidates, selects the numerically largest).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # Candidate quaternions scaled by 4*q_i (unnormalized); each row is the
    # quaternion built assuming component i is the largest.
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    comps = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(comps, axis=-1)
    q = jnp.take_along_axis(
        cands, idx[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
