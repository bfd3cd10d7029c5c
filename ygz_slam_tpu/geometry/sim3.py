"""Sim(3) manifold operations, batched over arbitrary leading dims.

Monocular SLAM accumulates SCALE drift that an SE(3) pose graph cannot
absorb (the reference logs the two-view-BA scale-drift problem in
note.md:63-66 and its loop-closing slot, include/ygz/loop_closing.h:5-7,
never got far enough to need this).  The standard fix — ORB-SLAM's
essential-graph optimization — corrects keyframes over 7-DoF
similarity transforms; this module supplies the group.

Convention: x_out = s * R @ x + t (scale-rotate-translate), matching
SE3's x_out = R @ x + t with s = 1.  Tangent ordering is
[rho (3), phi (3), sigma (1)] to parallel se3's (rho, phi); exp/log
use the closed-form W matrix (Strasdat's thesis / Sophus sim3.hpp),
small-angle/small-scale-safe via double-where Taylor guards exactly
like so3.exp.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3

_EPS = 1e-8


class Sim3(NamedTuple):
    """Similarity transform: x_out = s * R @ x + t."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]
    s: jnp.ndarray  # [...]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        s = jnp.ones(batch_shape, dtype=dtype)
        return Sim3(R, t, s)

    @staticmethod
    def from_se3(T, s=None) -> "Sim3":
        """Lift an SE3 (optionally with a scale) into Sim3."""
        scale = (
            jnp.ones(T.t.shape[:-1], T.t.dtype) if s is None
            else jnp.asarray(s, T.t.dtype)
        )
        return Sim3(T.R, T.t, scale)

    def to_se3(self):
        """Project to SE3 by ABSORBING the scale into translation:
        [sR | t] ~ s * [R | t/s] — the standard extraction of a metric
        camera pose from a corrected S_cw (ORB-SLAM LoopClosing)."""
        from .se3 import SE3

        return SE3(self.R, self.t / self.s[..., None])

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return (
            self.s[..., None]
            * jnp.einsum("...ij,...j->...i", self.R, x)
            + self.t
        )

    def compose(self, other: "Sim3") -> "Sim3":
        """self * other (apply `other` first, then `self`)."""
        return Sim3(
            self.R @ other.R,
            self.apply(other.t),
            self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            Rt,
            -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t),
            s_inv,
        )

    def params8(self) -> jnp.ndarray:
        """Compact [..., 8]: quaternion (wxyz) + translation + scale."""
        return jnp.concatenate(
            [so3.to_quaternion(self.R), self.t, self.s[..., None]], axis=-1
        )

    @staticmethod
    def from_params8(p: jnp.ndarray) -> "Sim3":
        return Sim3(
            so3.from_quaternion(p[..., :4]), p[..., 4:7], p[..., 7]
        )


def _W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'V' matrix: t = W @ rho in exp (Sophus sim3 details).

    W = C I + A hat(phi) + B hat(phi)^2 with coefficients branching on
    theta -> 0 and sigma -> 0; all four branches are evaluated with
    safe denominators and combined with where (jit-friendly, finite
    gradients at the limits).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    small_t = theta2 < _EPS
    theta2_safe = jnp.where(small_t, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    small_s = jnp.abs(sigma) < 1e-5
    sigma_safe = jnp.where(small_s, jnp.ones_like(sigma), sigma)
    s = jnp.exp(sigma)

    # sigma ~ 0 branch
    C0 = jnp.ones_like(sigma)
    A0 = jnp.where(
        small_t, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe
    )
    B0 = jnp.where(
        small_t,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    # general sigma branch
    C1 = (s - 1.0) / sigma_safe
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c_ = theta2_safe + sigma * sigma
    A1_small_t = ((sigma - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    B1_small_t = (
        (0.5 * sigma * sigma - sigma + 1.0) * s - 1.0
    ) / (sigma_safe ** 3)
    A1_big = (a_ * sigma + (1.0 - b_) * theta) / (theta * c_)
    B1_big = (C1 - ((b_ - 1.0) * sigma + a_ * theta) / c_) / theta2_safe
    A1 = jnp.where(small_t, A1_small_t, A1_big)
    B1 = jnp.where(small_t, B1_small_t, B1_big)

    A = jnp.where(small_s, A0, A1)
    B = jnp.where(small_s, B0, B1)
    C = jnp.where(small_s, C0, C1)
    Phi = so3.hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (
        C[..., None, None] * eye
        + A[..., None, None] * Phi
        + B[..., None, None] * Phi2
    )


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate; W is well-conditioned
    for SLAM-scale rotations/scales)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def exp(xi: jnp.ndarray) -> Sim3:
    """sim(3) exponential: tangent [..., 7] = (rho, phi, sigma) -> Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", _W(phi, sigma), rho)
    return Sim3(R, t, jnp.exp(sigma))


def log(S: Sim3) -> jnp.ndarray:
    """Sim3 -> tangent [..., 7] = (rho, phi, sigma)."""
    sigma = jnp.log(S.s)
    phi = so3.log(S.R)
    rho = jnp.einsum(
        "...ij,...j->...i", _inv3(_W(phi, sigma)), S.t
    )
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def boxplus(S: Sim3, xi: jnp.ndarray) -> Sim3:
    """Left-multiplicative retraction: exp(xi) * S (solver update)."""
    return exp(xi).compose(S)


def adjoint(S: Sim3) -> jnp.ndarray:
    """Adjoint [..., 7, 7]: Ad(S) xi = log(S exp(xi) S^-1).

    [[ s R,  hat(t) R,  -t ],
     [  0,       R,      0 ],
     [  0,       0,      1 ]]
    """
    sR = S.s[..., None, None] * S.R
    tR = so3.hat(S.t) @ S.R
    z33 = jnp.zeros_like(S.R)
    batch = S.t.shape[:-1]
    z31 = jnp.zeros(batch + (3, 1), S.t.dtype)
    one = jnp.ones(batch + (1, 1), S.t.dtype)
    z13 = jnp.zeros(batch + (1, 3), S.t.dtype)
    top = jnp.concatenate([sR, tR, -S.t[..., :, None]], axis=-1)
    mid = jnp.concatenate([z33, S.R, z31], axis=-1)
    bot = jnp.concatenate([z13, z13, one], axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def distance(Sa: Sim3, Sb: Sim3) -> jnp.ndarray:
    """Norm of log(Sa * Sb^-1)."""
    return jnp.linalg.norm(log(Sa.compose(Sb.inverse())), axis=-1)
