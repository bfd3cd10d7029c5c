"""Batched closed-form quartic root solver (Ferrari / the general
radical formula) in complex64 — the enabling primitive for a
TPU-native P3P minimal solver.

Why not a companion-matrix eigensolve: XLA:TPU has no nonsymmetric
`eig`, and per-sample host fallbacks would serialize a vmapped RANSAC.
The radical formula is pure elementwise complex arithmetic (legal and
vectorizable on every backend); float32 precision is recovered by a
few Newton polish steps on each root.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _cbrt(z: jnp.ndarray) -> jnp.ndarray:
    """Principal complex cube root."""
    r = jnp.abs(z)
    th = jnp.angle(z)
    return (r ** (1.0 / 3.0)) * jnp.exp(1j * th / 3.0)


def quartic_roots(c4, c3, c2, c1, c0, polish: int = 3) -> jnp.ndarray:
    """All four (complex) roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    Inputs broadcast; returns [..., 4] complex64.  Degenerate leading
    coefficients are regularized (RANSAC discards the resulting junk
    hypotheses by inlier count, so exactness there is not required).
    """
    c4 = jnp.asarray(c4, jnp.complex64)
    c4 = jnp.where(jnp.abs(c4) < _EPS, _EPS + 0j, c4)
    a = jnp.asarray(c3, jnp.complex64) / c4
    b = jnp.asarray(c2, jnp.complex64) / c4
    c = jnp.asarray(c1, jnp.complex64) / c4
    d = jnp.asarray(c0, jnp.complex64) / c4

    # Depressed quartic y^4 + p y^2 + q y + r,  x = y - a/4.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a * a * a / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * (a ** 4) / 256.0

    # General-formula intermediates (Wikipedia "Quartic function").
    D0 = b * b - 3.0 * a * c + 12.0 * d
    D1 = (2.0 * b ** 3 - 9.0 * a * b * c + 27.0 * a * a * d
          + 27.0 * c * c - 72.0 * b * d)
    inner = jnp.sqrt(D1 * D1 - 4.0 * D0 ** 3)
    Q = _cbrt((D1 + inner) / 2.0)
    # If Q degenerates (D0 ~ 0 and D1 + inner ~ 0), take the other sign.
    Q_alt = _cbrt((D1 - inner) / 2.0)
    Q = jnp.where(jnp.abs(Q) < 1e-6, Q_alt, Q)
    Q = jnp.where(jnp.abs(Q) < 1e-6, jnp.asarray(1e-6 + 0j), Q)
    S2 = -2.0 * p / 3.0 + (Q + D0 / Q) / 3.0
    S = 0.5 * jnp.sqrt(S2 + 0j)
    S = jnp.where(jnp.abs(S) < 1e-6, jnp.asarray(1e-6 + 0j), S)

    base = -a / 4.0
    t1 = -4.0 * S * S - 2.0 * p
    t2 = q / S
    r12 = 0.5 * jnp.sqrt(t1 + t2)
    r34 = 0.5 * jnp.sqrt(t1 - t2)
    roots = jnp.stack([
        base - S + r12,
        base - S - r12,
        base + S + r34,
        base + S - r34,
    ], axis=-1)

    # Newton polish in complex64 (recovers f32 accuracy lost in the
    # radical tower).
    a_, b_, c_, d_ = (x[..., None] for x in (a, b, c, d))
    for _ in range(polish):
        f = (((roots + a_) * roots + b_) * roots + c_) * roots + d_
        df = ((4.0 * roots + 3.0 * a_) * roots + 2.0 * b_) * roots + c_
        df = jnp.where(jnp.abs(df) < _EPS, _EPS + 0j, df)
        roots = roots - f / df
    return roots


def real_roots_mask(roots: jnp.ndarray, tol: float = 1e-3) -> jnp.ndarray:
    """Boolean [..., 4] mask of numerically real roots (|Im| below tol
    relative to magnitude)."""
    return jnp.abs(roots.imag) <= tol * (1.0 + jnp.abs(roots.real))
