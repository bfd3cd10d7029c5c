"""Analytic projection Jacobians, batched.

TPU-native equivalents of the reference's `cvutils::JacobXYZ2Cam` /
`JacobXYZ2Pixel` (include/ygz/Algorithm/CVUtils.h:77-126): derivatives
of the projected (normalized or pixel) coordinates of a camera-frame
point with respect to a *left-multiplicative* se(3) perturbation of the
camera pose, tangent ordered (rho, phi) = (translation, rotation).

With p' = exp(xi) * p  ~  p + rho + phi x p, the derivative of the
camera point w.r.t. xi is [I | -hat(p)], and the projection chain rule
gives the 2x6 Jacobians below.  Sign convention matches the reference
(it negates so residual = measurement - projection gets J directly).
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import hat


def duv_dxyz(pc: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """d(pixel u,v)/d(camera-frame point xyz): [..., 2, 3] (no distortion)."""
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zinv = 1.0 / jnp.maximum(z, 1e-9)
    zinv2 = zinv * zinv
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([fx * zinv, zero, -fx * x * zinv2], axis=-1)
    row_v = jnp.stack([zero, fy * zinv, -fy * y * zinv2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def dxyz_dxi(pc: jnp.ndarray) -> jnp.ndarray:
    """d(camera point)/d(left-mul se3 tangent): [..., 3, 6] = [I | -hat(p)]."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -hat(pc)], axis=-1)


def duv_dxi(pc: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """d(pixel)/d(pose tangent): [..., 2, 6].

    Closed form matching cvutils::JacobXYZ2Pixel (CVUtils.h:103-126),
    in (rho, phi) tangent order with +projection sign (caller negates
    for residual = obs - proj if desired).
    """
    return duv_dxyz(pc, fx, fy) @ dxyz_dxi(pc)


def dnorm_dxi(pc: jnp.ndarray) -> jnp.ndarray:
    """d(normalized x/z, y/z)/d(pose tangent): [..., 2, 6]
    (JacobXYZ2Cam, CVUtils.h:77-100, i.e. fx = fy = 1)."""
    one = jnp.ones_like(pc[..., 0])
    return duv_dxi(pc, one, one)


def duv_dpoint(pc: jnp.ndarray, R_cw: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """d(pixel)/d(world point): [..., 2, 3] = duv_dxyz @ R_cw."""
    return duv_dxyz(pc, fx, fy) @ R_cw
