"""Pose-prior-free camera localization: batched P3P + RANSAC.

The reference's relocalization slot is an empty TODO
(src/Module/VisualOdometry.cpp:101-104); its intended recipe (ORB-SLAM
style) is a PnP minimal solver inside RANSAC, seeding a pose-only BA.
Seeding that BA from a stored keyframe pose (the previous design here)
only works near the keyframe — a genuinely kidnapped camera needs a
pose computed FROM THE 2D-3D MATCHES alone.

TPU-native design (the `initializer.py` RANSAC pattern): sample H
hypothesis triples at once, solve every P3P in one vmapped batch
(Grunert's quartic via the closed-form solver in `quartic.py` — no
eigendecompositions, TPU-legal), score all H x 4 candidate poses
against all N correspondences with one batched reprojection, take the
best by inlier count.  The caller refines with `pose_only_ba`.

P3P algebra (Grunert 1841 / Fischler-Bolles 1981): with camera-ray
unit bearings f1,f2,f3 to world points P1,P2,P3, the pairwise angles
and distances constrain the depths s_i along each ray by the law of
cosines; eliminating s2 = u*s1, s3 = v*s1 yields a quartic in v.
Each real root gives depths -> camera-frame points -> absolute
orientation (exact 3-point Horn via orthonormal triads).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import SE3
from .quartic import quartic_roots, real_roots_mask


def _triad(p1, p2, p3):
    """Orthonormal frame from a non-degenerate point triple."""
    v1 = p2 - p1
    v2 = p3 - p1
    e1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-9)
    v2p = v2 - jnp.sum(v2 * e1, -1, keepdims=True) * e1
    e2 = v2p / jnp.maximum(jnp.linalg.norm(v2p, axis=-1, keepdims=True), 1e-9)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)       # [..., 3, 3] columns


def p3p(pts_w: jnp.ndarray, f: jnp.ndarray):
    """Grunert P3P: world triple [..., 3, 3] + unit bearings [..., 3, 3]
    (camera frame) -> up to 4 poses.

    Returns (R [..., 4, 3, 3], t [..., 4, 3], ok [..., 4]) with
    T_cw poses: x_cam = R x_world + t.  Invalid roots are masked.
    """
    P1, P2, P3 = pts_w[..., 0, :], pts_w[..., 1, :], pts_w[..., 2, :]
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]

    a = jnp.linalg.norm(P2 - P3, axis=-1)          # opposite f1-angle α
    b = jnp.linalg.norm(P1 - P3, axis=-1)
    c = jnp.linalg.norm(P1 - P2, axis=-1)
    ca = jnp.sum(f2 * f3, -1)                      # cos α
    cb = jnp.sum(f1 * f3, -1)                      # cos β
    cg = jnp.sum(f1 * f2, -1)                      # cos γ

    b2 = jnp.maximum(b * b, 1e-12)
    A = (a * a) / b2
    C = (c * c) / b2

    # u = N(v)/D(v); constraint N^2 - 2 N D cg + D^2 (1 - C*Q) = 0 is a
    # quartic p(v).  Its coefficients are recovered EXACTLY by sampling
    # p at 5 abscissae and solving the closed-form Vandermonde — this
    # avoids hand-expanding (and hand-miscopying) Grunert's published
    # coefficient algebra.
    def p_of(v):
        Q = v * v - 2.0 * v * cb + 1.0
        N = Q * (A - C) + 1.0 - v * v
        D = 2.0 * (cg - v * ca)
        return N * N - 2.0 * N * D * cg + D * D * (1.0 - C * Q)

    xs = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0])
    ys = jnp.stack([p_of(x) for x in xs], axis=-1)          # [..., 5]
    # Inverse of the fixed 5x5 Vandermonde (rows [1, x, x^2, x^3, x^4]),
    # computed with numpy at trace time so it really is float64 (a jnp
    # float64 cast is a no-op without jax_enable_x64).
    xs_np = np.asarray([-2.0, -1.0, 0.0, 1.0, 2.0], np.float64)
    V_np = np.stack([xs_np ** k for k in range(5)], axis=-1)
    Vinv = jnp.asarray(np.linalg.inv(V_np), ys.dtype)
    coef = jnp.einsum("ij,...j->...i", Vinv, ys)            # c0..c4

    roots = quartic_roots(coef[..., 4], coef[..., 3], coef[..., 2],
                          coef[..., 1], coef[..., 0])       # [..., 4]
    v = roots.real
    ok = real_roots_mask(roots) & (v > 1e-6)
    # Real-domain Newton polish on the DIRECT constraint p_of(v): the
    # sampled-coefficient polynomial and the complex64 radical tower
    # both lose precision near root clusters; the rational form is
    # better conditioned around the physical root.
    ca_, cb_, cg_ = ca[..., None], cb[..., None], cg[..., None]
    A_, C_ = A[..., None], C[..., None]

    def p_vec(v):
        Q = v * v - 2.0 * v * cb_ + 1.0
        N = Q * (A_ - C_) + 1.0 - v * v
        D = 2.0 * (cg_ - v * ca_)
        return N * N - 2.0 * N * D * cg_ + D * D * (1.0 - C_ * Q)

    h = 1e-3
    for _ in range(4):
        pv = p_vec(v)
        dp = (p_vec(v + h) - p_vec(v - h)) / (2.0 * h)
        dp = jnp.where(jnp.abs(dp) < 1e-12, 1e-12, dp)
        step = jnp.clip(pv / dp, -0.1, 0.1)
        v = v - step

    Q = v * v - 2.0 * v * cb[..., None] + 1.0
    N = Q * (A - C)[..., None] + 1.0 - v * v
    D = 2.0 * (cg[..., None] - v * ca[..., None])
    D = jnp.where(jnp.abs(D) < 1e-9, 1e-9, D)
    u = N / D
    ok = ok & (u > 1e-6)
    # s1 from the beta law of cosines: s1^2 Q = b^2.
    s1 = b[..., None] / jnp.sqrt(jnp.maximum(Q, 1e-12))
    s2 = u * s1
    s3 = v * s1

    # Camera-frame points; absolute orientation by matching triads.
    X1 = s1[..., None] * f1[..., None, :]           # [..., 4, 3]
    X2 = s2[..., None] * f2[..., None, :]
    X3 = s3[..., None] * f3[..., None, :]
    Bc = _triad(X1, X2, X3)                          # [..., 4, 3, 3]
    Aw = _triad(P1, P2, P3)                          # [..., 3, 3]
    R = Bc @ jnp.swapaxes(Aw[..., None, :, :], -1, -2)
    t = X1 - jnp.einsum("...ij,...j->...i", R, P1[..., None, :])
    finite = (jnp.isfinite(R).all((-1, -2)) & jnp.isfinite(t).all(-1))
    return R, t, ok & finite


class PnPResult(NamedTuple):
    T_cw: SE3
    n_inliers: jnp.ndarray
    inlier: jnp.ndarray     # [N]
    ok: jnp.ndarray         # bool — any usable hypothesis found


def ransac_pnp(
    pts_w: jnp.ndarray,    # [N, 3] world points
    px: jnp.ndarray,       # [N, 2] observed pixels (raw)
    mask: jnp.ndarray,     # [N] valid correspondences
    cam,
    key: jnp.ndarray | int = 0,
    n_hyp: int = 256,
    inlier_px: float = 4.0,
    min_sep_px: float = 12.0,
) -> PnPResult:
    """Pose-prior-free RANSAC over vmapped P3P hypotheses (jittable).

    All `n_hyp` triples are drawn, solved (4 roots each) and scored in
    fixed-shape batches; the inlier count uses ideal-pinhole
    reprojection error (matches pose_only_ba's solver boundary) with
    cheirality.  Triples with near-collinear pixels are demoted via a
    minimum pairwise pixel separation gate.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    N = pts_w.shape[0]
    pxu = cam.undistort_px(px)
    f_all = cam.pixel_to_camera(px, 1.0)
    f_all = f_all / jnp.maximum(
        jnp.linalg.norm(f_all, axis=-1, keepdims=True), 1e-9)

    # Weighted sampling over valid rows (invalid rows get ~0 prob).
    logits = jnp.where(mask, 0.0, -1e9)
    idx = jax.random.categorical(
        key, logits[None, :].repeat(n_hyp * 3, 0)
    ).reshape(n_hyp, 3)
    tri_w = pts_w[idx]                                # [H, 3, 3]
    tri_f = f_all[idx]
    tri_px = pxu[idx]
    tri_valid = mask[idx].all(-1)
    # Degeneracy gates: distinct indices + pixel separation.
    d01 = jnp.linalg.norm(tri_px[:, 0] - tri_px[:, 1], axis=-1)
    d02 = jnp.linalg.norm(tri_px[:, 0] - tri_px[:, 2], axis=-1)
    d12 = jnp.linalg.norm(tri_px[:, 1] - tri_px[:, 2], axis=-1)
    sep = jnp.minimum(jnp.minimum(d01, d02), d12)
    tri_valid = tri_valid & (sep >= min_sep_px)

    R, t, ok = p3p(tri_w, tri_f)                      # [H,4,...]
    H4 = n_hyp * 4
    Rf = R.reshape(H4, 3, 3)
    tf = t.reshape(H4, 3)
    okf = (ok & tri_valid[:, None]).reshape(H4)

    # Score: one big [H4, N] reprojection (MXU contraction + VPU).
    pc = jnp.einsum("hij,nj->hni", Rf, pts_w) + tf[:, None, :]
    z = pc[..., 2]
    zs = jnp.maximum(z, 1e-6)
    proj = jnp.stack([
        cam.fx * pc[..., 0] / zs + cam.cx,
        cam.fy * pc[..., 1] / zs + cam.cy,
    ], axis=-1)
    err2 = jnp.sum((proj - pxu[None]) ** 2, -1)
    good = (err2 < inlier_px * inlier_px) & (z > 1e-3) & mask[None, :]
    score = jnp.sum(good, axis=1) * okf.astype(jnp.int32)
    best = jnp.argmax(score)
    T_best = SE3(Rf[best], tf[best])
    return PnPResult(
        T_cw=T_best,
        n_inliers=score[best],
        inlier=good[best],
        ok=(score[best] > 0) & okf[best],
    )
