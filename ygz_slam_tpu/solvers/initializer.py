"""Monocular initialization: batched RANSAC homography/fundamental
estimation, model selection, and relative-pose reconstruction.

TPU-native replacement for the reference's ORB-SLAM-style Initializer
(src/Algorithm/Initializer.cpp): 200 RANSAC iterations of 8-point sets
(:33-48), H and F fitted "in parallel" (two std::threads, :55-59 —
here: one batched SVD over all hypotheses of both models at once),
model selection rh = sh/(sh+sf) > 0.4 (:65-80), reconstruction by
decomposing H (8 Faugeras solutions, ReconstructH :326-503) or F -> E
(4 solutions, ReconstructF :847-938, DecomposeE :940-964), cheirality
+ parallax scoring CheckRT (:505-647), normalized 8-point DLT
(ComputeH21 :196-249, ComputeF21 :730-770, Normalize :140-194) and
symmetric-transfer scoring (CheckHomography :251-324, CheckFundamental
:772-845).

Everything is fixed-shape and mask-aware: N matches (padded), all 200
hypotheses solved in one vmapped `jnp.linalg.svd`, all candidate
motions cheirality-checked in one vmapped triangulation pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.triangulation import triangulate_dlt

CHI2_H = 5.991   # 2-DoF transfer error threshold (CheckHomography)
CHI2_F = 3.841   # 1-DoF epipolar distance threshold (CheckFundamental)
SCORE_F = 5.991  # F scoring cap (the reference scores F with thScore)


def normalize_points(pts: jnp.ndarray, mask: jnp.ndarray):
    """Zero-mean / unit mean-abs-deviation normalization (Normalize,
    Initializer.cpp:140-194).  Returns (normalized [N,2], T [3,3])."""
    n = jnp.maximum(jnp.sum(mask), 1.0)
    m = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / n
    d = jnp.abs(pts - m)
    md = jnp.sum(jnp.where(mask[:, None], d, 0.0), axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    norm = (pts - m) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-m[0] * s[0]).at[1, 2].set(-m[1] * s[1])
    return norm, T


def _h_from_points(p1: jnp.ndarray, p2: jnp.ndarray, w=None) -> jnp.ndarray:
    """DLT homography from >= 4 correspondences (ComputeH21); optional
    per-point weights `w` enable the all-inlier refit."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2n, 9]
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def _f_from_points(p1: jnp.ndarray, p2: jnp.ndarray, w=None) -> jnp.ndarray:
    """Normalized 8-point fundamental with rank-2 projection (ComputeF21);
    optional weights enable the all-inlier refit."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # [n, 9]
    if w is not None:
        A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def check_homography(
    H21: jnp.ndarray, pts1, pts2, mask, sigma: float = 1.0
):
    """Symmetric transfer score + inliers (CheckHomography)."""
    inv_s2 = 1.0 / (sigma * sigma)
    H12 = jnp.linalg.inv(H21 + 1e-12 * jnp.eye(3))

    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=-1)
        p = ah @ H.T
        w = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        proj = p[:, :2] / w
        return jnp.sum((proj - b) ** 2, axis=-1) * inv_s2

    chi1 = transfer(H21, pts1, pts2)
    chi2 = transfer(H12, pts2, pts1)
    ok = (chi1 < CHI2_H) & (chi2 < CHI2_H) & mask
    score = jnp.sum(
        jnp.where(mask & (chi1 < CHI2_H), CHI2_H - chi1, 0.0)
        + jnp.where(mask & (chi2 < CHI2_H), CHI2_H - chi2, 0.0)
    )
    return score, ok


def check_fundamental(
    F21: jnp.ndarray, pts1, pts2, mask, sigma: float = 1.0
):
    """Symmetric epipolar-distance score + inliers (CheckFundamental)."""
    inv_s2 = 1.0 / (sigma * sigma)
    oh = jnp.ones_like(pts1[:, :1])
    x1 = jnp.concatenate([pts1, oh], axis=-1)
    x2 = jnp.concatenate([pts2, oh], axis=-1)
    l2 = x1 @ F21.T          # line in image 2
    l1 = x2 @ F21            # line in image 1
    d2 = (jnp.sum(x2 * l2, axis=-1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = (jnp.sum(x1 * l1, axis=-1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    c2 = d2 * inv_s2
    c1 = d1 * inv_s2
    ok = (c1 < CHI2_F) & (c2 < CHI2_F) & mask
    score = jnp.sum(
        jnp.where(mask & (c2 < CHI2_F), SCORE_F - c2, 0.0)
        + jnp.where(mask & (c1 < CHI2_F), SCORE_F - c1, 0.0)
    )
    return score, ok


class RansacResult(NamedTuple):
    H: jnp.ndarray          # best homography (un-normalized coords)
    F: jnp.ndarray          # best fundamental
    score_h: jnp.ndarray
    score_f: jnp.ndarray
    inliers_h: jnp.ndarray  # [N]
    inliers_f: jnp.ndarray  # [N]
    rh: jnp.ndarray         # sh / (sh + sf)


def ransac_hf(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    n_hypotheses: int = 200,
    sigma: float = 1.0,
) -> RansacResult:
    """Fit H and F with shared RANSAC 8-point samples (TryInitialize's
    parallel FindHomography/FindFundamental).  The reference's two
    threads become one batched solve: all `n_hypotheses` 16x9 / 8x9
    SVDs for both models run as two vmapped calls.
    """
    N = pts1.shape[0]
    n1, T1 = normalize_points(pts1, mask)
    n2, T2 = normalize_points(pts2, mask)
    # Sample valid indices with probability mass on mask; per-hypothesis
    # sampling WITHOUT replacement (duplicate points in an 8-tuple make
    # the DLT degenerate and can produce deceptively high-scoring bad
    # models).
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    keys = jax.random.split(key, n_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(8,), replace=False, p=p)
    )(keys)

    T2inv = jnp.linalg.inv(T2)

    def solve_one(ix):
        a, b = n1[ix], n2[ix]
        Hn = _h_from_points(a, b)
        Fn = _f_from_points(a, b)
        H = T2inv @ Hn @ T1
        F = T2.T @ Fn @ T1
        sh, _ = check_homography(H, pts1, pts2, mask, sigma)
        sf, _ = check_fundamental(F, pts1, pts2, mask, sigma)
        return H, F, sh, sf

    Hs, Fs, shs, sfs = jax.vmap(solve_one)(idx)

    # Locally-optimized RANSAC: a minimal 8-point model carries ~1 deg
    # rotation error at 0.5 px noise, which fails CheckRT's 2 px
    # reprojection gate on much of the scene, and a single best-scoring
    # hypothesis can be a self-consistent wrong model under
    # contamination.  So refit (weighted least-squares over the model's
    # inliers, iterated) from each of the TOP_K hypotheses and keep the
    # best rescored model.  Improves on the reference, which keeps the
    # raw minimal-sample model.
    TOP_K = 4

    def lo_refit(make_model, check, models, scores):
        _, top_idx = jax.lax.top_k(scores, TOP_K)

        def refine_one(i):
            M = models[i]
            s, inl = check(M, pts1, pts2, mask, sigma)

            def body(_, carry):
                M, s, inl = carry
                M2 = make_model(inl.astype(n1.dtype))
                s2, inl2 = check(M2, pts1, pts2, mask, sigma)
                take = s2 >= s
                return (
                    jnp.where(take, M2, M),
                    jnp.maximum(s, s2),
                    jnp.where(take, inl2, inl),
                )

            return jax.lax.fori_loop(0, 3, body, (M, s, inl))

        Ms, ss, inls = jax.vmap(refine_one)(top_idx)
        b = jnp.argmax(ss)
        return Ms[b], ss[b], inls[b]

    H_best, sh_best, inl_h = lo_refit(
        lambda w: T2inv @ _h_from_points(n1, n2, w) @ T1,
        check_homography, Hs, shs,
    )
    F_best, sf_best, inl_f = lo_refit(
        lambda w: T2.T @ _f_from_points(n1, n2, w) @ T1,
        check_fundamental, Fs, sfs,
    )
    rh = sh_best / jnp.maximum(sh_best + sf_best, 1e-9)
    return RansacResult(
        H=H_best, F=F_best, score_h=sh_best, score_f=sf_best,
        inliers_h=inl_h, inliers_f=inl_f, rh=rh,
    )


class CheckRTResult(NamedTuple):
    n_good: jnp.ndarray
    parallax_deg: jnp.ndarray  # 50th-largest good parallax like the ref
    points3d: jnp.ndarray      # [N, 3] in frame 1
    good: jnp.ndarray          # [N]


def check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
) -> CheckRTResult:
    """Cheirality + reprojection + parallax scoring of one (R, t)
    candidate (CheckRT, Initializer.cpp:505-647), all matches batched.
    """
    th2 = 4.0 * sigma * sigma
    # Triangulate in K-normalized coordinates: raw pixel-scale DLT is
    # too ill-conditioned for float32 (the reference runs double); with
    # O(1) entries the 4x4 SVD recovers full f32 precision.
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    f_vec = jnp.stack([fx, fy])
    c_vec = jnp.stack([cx, cy])
    xn1 = (pts1 - c_vec) / f_vec
    xn2 = (pts2 - c_vec) / f_vec
    P1 = jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_dlt(P1[None], P2[None], xn1, xn2)  # frame-1 coords
    finite = jnp.isfinite(X).all(axis=-1)
    X = jnp.where(finite[:, None], X, 0.0)
    # Parallax between the two rays.
    O2 = -R.T @ t
    n1v = X
    n2v = X - O2
    cosp = jnp.sum(n1v * n2v, axis=-1) / jnp.maximum(
        jnp.linalg.norm(n1v, axis=-1) * jnp.linalg.norm(n2v, axis=-1), 1e-12
    )
    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]

    def reproj(Xc):
        zz = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        return jnp.stack(
            [fx * Xc[:, 0] / zz + cx, fy * Xc[:, 1] / zz + cy], axis=-1
        )

    e1 = jnp.sum((reproj(X) - pts1) ** 2, axis=-1)
    e2 = jnp.sum((reproj(X2) - pts2) ** 2, axis=-1)
    has_parallax = cosp < 0.99998
    good = (
        mask & finite
        & (z1 > 0) & (z2 > 0)
        & (e1 < th2) & (e2 < th2)
        & has_parallax
    )
    n_good = jnp.sum(good)
    # Representative parallax: like the reference, take the min(50th,
    # n_good)-th largest parallax angle among good points.
    cosp_good = jnp.where(good, cosp, -1.0)  # larger angle = smaller cos
    sorted_cos = jnp.sort(cosp_good)         # ascending: best parallax first
    pick = jnp.minimum(jnp.maximum(n_good - 1, 0), 49)
    cos_pick = sorted_cos[pick]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_pick, -1.0, 1.0)))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)
    return CheckRTResult(
        n_good=n_good, parallax_deg=parallax_deg, points3d=X, good=good
    )


def decompose_e(E: jnp.ndarray):
    """E -> 4 candidate (R, t) (DecomposeE, Initializer.cpp:940-964)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = u @ W.T @ vt
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """H -> 8 candidate (R, t) via the Faugeras SVD construction
    (ReconstructH, Initializer.cpp:326-503).  Returns ([8,3,3], [8,3]).
    """
    A = jnp.linalg.inv(K) @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]
    # x1/x3 components (d' = d2 case).
    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    # Case d' = +d2: rotation about y by theta.
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, eps
    )
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    sins = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_t

    def make_pos(i):
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], H.dtype
        )
        Rp = Rp.at[0, 0].set(cos_t).at[2, 2].set(cos_t)
        Rp = Rp.at[0, 2].set(-sins[i]).at[2, 0].set(sins[i])
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    # Case d' = -d2: rotation about y by phi with a flip.
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, eps
    )
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sinps = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_p

    def make_neg(i):
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], H.dtype
        )
        Rp = Rp.at[0, 0].set(cos_p).at[2, 2].set(-cos_p)
        Rp = Rp.at[0, 2].set(sinps[i]).at[2, 0].set(sinps[i])
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), eps)

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


class InitResult(NamedTuple):
    success: jnp.ndarray      # bool
    T21: SE3                  # pose of frame 2 w.r.t. frame 1 (t unit-ish)
    points3d: jnp.ndarray     # [N, 3] triangulated in frame 1
    good: jnp.ndarray         # [N] triangulation inliers
    used_h: jnp.ndarray       # bool: homography model chosen


def reconstruct(
    res: RansacResult,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
    min_good: int = 40,
    min_parallax_deg: float = 1.0,
) -> InitResult:
    """Select H or F (rh > 0.4, TryInitialize :65-80), enumerate
    candidate motions, CheckRT them all (one vmapped pass over 12
    candidates) and accept the winner under the reference's
    distinctness/parallax/support rules (ReconstructF :899-937,
    ReconstructH :476-502)."""
    use_h = res.rh > 0.40
    Rs_h, ts_h = decompose_h(res.H, K)
    E = K.T @ res.F @ K
    Rs_f, ts_f = decompose_e(E)
    # Pad F's 4 candidates to 8 with identity (zero score).
    Rs_f = jnp.concatenate([Rs_f, jnp.broadcast_to(jnp.eye(3), (4, 3, 3))])
    ts_f = jnp.concatenate([ts_f, jnp.ones((4, 3))])
    cand_valid = jnp.concatenate(
        [jnp.ones(4, bool), jnp.zeros(4, bool)]
    )
    Rs = jnp.where(use_h, Rs_h, Rs_f)
    ts = jnp.where(use_h, ts_h, ts_f)
    valid = jnp.where(use_h, jnp.ones(8, bool), cand_valid)
    inl = jnp.where(use_h, res.inliers_h, res.inliers_f) & mask

    check = jax.vmap(lambda R, t: check_rt(R, t, pts1, pts2, inl, K, sigma))
    out = check(Rs, ts)
    n_goods = jnp.where(valid, out.n_good, -1)
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    # Distinctness: second best must be clearly worse (<0.75 * best for
    # F's 4; the reference's H path requires similar dominance).
    n_sorted = jnp.sort(n_goods)
    n_second = n_sorted[-2]
    n_inl = jnp.sum(inl)
    success = (
        (n_best >= min_good)
        & (n_best.astype(jnp.float32) > 0.9 * n_inl.astype(jnp.float32) * 0.5)
        & (n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
        & (out.parallax_deg[best] > min_parallax_deg)
    )
    T21 = SE3(Rs[best], ts[best])
    return InitResult(
        success=success,
        T21=T21,
        points3d=out.points3d[best],
        good=out.good[best],
        used_h=use_h,
    )


def initialize_two_view(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    sigma: float = 1.0,
    n_hypotheses: int = 200,
    min_good: int = 40,
) -> InitResult:
    """Full monocular bootstrap from tracked correspondences
    (Initializer::TryInitialize): RANSAC H+F -> select -> reconstruct.
    Callers follow with two-view BA + mean-depth-1 rescaling
    (VisualOdometry.cpp:148-151, :261-275).
    """
    res = ransac_hf(pts1, pts2, mask, key, n_hypotheses, sigma)
    return reconstruct(res, pts1, pts2, mask, K, sigma, min_good)
