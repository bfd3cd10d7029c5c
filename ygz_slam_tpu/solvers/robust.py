"""Robust cost weights and scale estimators, batched.

TPU-native equivalent of the reference's `robust_cost` namespace
(include/ygz/Algorithm/RobustCost.h:11-136): scale estimators
(Unit / t-distribution / MAD / Normal) and M-estimator weight
functions (Unit / Tukey / t-dist / Huber).  Each weight function maps
a residual magnitude tensor [...] to per-residual IRLS weights [...].
Constants match the reference's 95% efficiency tunings.
"""
from __future__ import annotations

import jax.numpy as jnp

# 95% asymptotic efficiency constants (RobustCost.h).
TUKEY_B = 4.6851
HUBER_K = 1.345
TDIST_DOF = 5.0
MAD_SCALE = 1.4826


def huber_weight(r: jnp.ndarray, k: float = HUBER_K) -> jnp.ndarray:
    """w = 1 for |r| <= k, k/|r| beyond."""
    a = jnp.abs(r)
    return jnp.where(a <= k, jnp.ones_like(a), k / jnp.maximum(a, 1e-12))


def tukey_weight(r: jnp.ndarray, b: float = TUKEY_B) -> jnp.ndarray:
    """Tukey biweight: (1 - (r/b)^2)^2 inside, 0 outside."""
    x = r / b
    w = (1.0 - x * x)
    return jnp.where(jnp.abs(x) < 1.0, w * w, jnp.zeros_like(w))


def tdist_weight(r: jnp.ndarray, dof: float = TDIST_DOF) -> jnp.ndarray:
    """Student-t weight: (dof + 1) / (dof + r^2)."""
    return (dof + 1.0) / (dof + r * r)


def unit_weight(r: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones_like(r)


def huber_loss(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Huber rho applied to *squared* residuals (Ceres convention used
    by the reference's BA, src/Algorithm/BA.cpp Huber delta=5.991)."""
    d2 = delta * delta
    return jnp.where(r2 <= d2, r2, 2.0 * delta * jnp.sqrt(jnp.maximum(r2, 0.0)) - d2)


def mad_scale(r: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Median-absolute-deviation scale estimate, mask-aware.

    sigma = 1.4826 * median(|r - median(r)|).  With a validity mask the
    medians are computed over valid entries only (invalid entries are
    pushed to +inf and a masked quantile is taken).
    """
    if mask is None:
        med = jnp.median(r)
        return MAD_SCALE * jnp.median(jnp.abs(r - med))
    n_valid = jnp.maximum(jnp.sum(mask), 1)

    def masked_median(x):
        big = jnp.where(mask, x, jnp.inf)
        s = jnp.sort(big)
        lo = jnp.clip((n_valid - 1) // 2, 0, x.shape[0] - 1)
        hi = jnp.clip(n_valid // 2, 0, x.shape[0] - 1)
        return 0.5 * (s[lo] + s[hi])

    med = masked_median(r)
    return MAD_SCALE * masked_median(jnp.abs(r - med))


def tdist_scale(
    r: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    dof: float = TDIST_DOF,
    iters: int = 5,
    init_sigma: float = 1.0,
) -> jnp.ndarray:
    """t-distribution scale via fixed-point iteration (fixed trip count
    for jittability), matching TDistributionScaleEstimator."""
    if mask is None:
        mask = jnp.ones_like(r, dtype=bool)
    n = jnp.maximum(jnp.sum(mask), 1).astype(r.dtype)
    sigma2 = jnp.asarray(init_sigma * init_sigma, dtype=r.dtype)
    r2 = r * r
    for _ in range(iters):
        w = (dof + 1.0) / (dof + r2 / jnp.maximum(sigma2, 1e-12))
        sigma2 = jnp.sum(jnp.where(mask, w * r2, 0.0)) / n
    return jnp.sqrt(jnp.maximum(sigma2, 1e-12))


def normal_scale(
    r: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gaussian scale estimator: RMS of the (masked) residuals —
    NormalDistributionScaleEstimator (RobustCost.h:11-136), the last
    of the reference's four scale estimators (Unit/TDist/MAD/Normal)."""
    if mask is None:
        mask = jnp.ones_like(r, dtype=bool)
    n = jnp.maximum(jnp.sum(mask), 1).astype(r.dtype)
    return jnp.sqrt(jnp.sum(jnp.where(mask, r * r, 0.0)) / n)
