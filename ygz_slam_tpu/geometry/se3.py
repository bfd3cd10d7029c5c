"""SE(3) manifold operations, batched over arbitrary leading dims.

TPU-native replacement for the reference's Sophus `SE3`
(thirdparty/Sophus/sophus/se3.cpp; typedef'd in
include/ygz/Basic/Common.h:36-39).  A pose is a pytree `SE3(R, t)`
with rotation matrix `R [..., 3, 3]` and translation `t [..., 3]`.

Tangent convention matches Sophus: xi = (rho, phi) with translation
part first, rotation part second, and the left-multiplicative update
`T <- exp(-x) * T` used by the reference's solvers
(src/Algorithm/SparseImageAlign.cpp:233-238, include/ygz/G2oTypes.h:13-47).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3

_EPS = 1e-8


class SE3(NamedTuple):
    """Rigid transform: x_out = R @ x + t.  Batched over leading dims."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(R, t)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points [..., 3]."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self * other (apply `other` first, then `self`)."""
        return SE3(self.R @ other.R, self.apply(other.t))

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix [..., 4, 4]."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            batch + (1, 4),
        )
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def params7(self) -> jnp.ndarray:
        """Compact [..., 7] storage: quaternion (wxyz) + translation."""
        return jnp.concatenate([so3.to_quaternion(self.R), self.t], axis=-1)

    @staticmethod
    def from_params7(p: jnp.ndarray) -> "SE3":
        return SE3(so3.from_quaternion(p[..., :4]), p[..., 4:7])

    def normalize(self) -> "SE3":
        return SE3(so3.normalize(self.R), self.t)


def _left_jacobian_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): V in exp([rho, phi]) t-part = J @ rho."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    W = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _left_jacobian_inv_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3) (closed form, Taylor-guarded)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / theta2_safe,
    )
    W = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


def exp(xi: jnp.ndarray) -> SE3:
    """se(3) exponential: tangent [..., 6] = (rho, phi) -> SE3."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3.exp(phi)
    V = _left_jacobian_so3(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return SE3(R, t)


def log(T: SE3) -> jnp.ndarray:
    """SE3 -> tangent [..., 6] = (rho, phi)."""
    phi = so3.log(T.R)
    Vinv = _left_jacobian_inv_so3(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([rho, phi], axis=-1)


def boxplus(T: SE3, xi: jnp.ndarray) -> SE3:
    """Left-multiplicative retraction: exp(xi) * T (solver update)."""
    return exp(xi).compose(T)


def adjoint(T: SE3) -> jnp.ndarray:
    """Adjoint matrix [..., 6, 6] mapping tangents across frames."""
    tR = so3.hat(T.t) @ T.R
    zeros = jnp.zeros_like(T.R)
    top = jnp.concatenate([T.R, tR], axis=-1)
    bot = jnp.concatenate([zeros, T.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def distance(Ta: SE3, Tb: SE3) -> jnp.ndarray:
    """Norm of log(Ta * Tb^-1): the reference's motion sanity metric
    (src/Algorithm/Matcher.cpp:482-488 uses ||log T_CR|| <= 0.2)."""
    return jnp.linalg.norm(log(Ta.compose(Tb.inverse())), axis=-1)
