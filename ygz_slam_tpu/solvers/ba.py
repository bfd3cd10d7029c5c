"""Bundle adjustment: two-view, pose-only, point-only, and windowed
local BA with Schur-complement landmark marginalization.

TPU-native replacement for the reference's `namespace ba` free
functions (include/ygz/Algorithm/BA.h:10-67, src/Algorithm/BA.cpp):
 - TwoViewBACeres        -> two_view_ba        (BA.cpp:11-89)
 - OptimizeCurrent       -> optimize_current   (BA.cpp:91-186)
 - OptimizeCurrentPoseOnly -> pose_only_ba     (BA.cpp:188-264, the
   ORB-style 4-round optimize/chi2-reclassify loop, threshold 5.991)
 - OptimizeCurrentPointOnly -> point_only_ba   (BA.cpp:266-322)
 - LocalBA / LocalBAG2O  -> local_ba           (BA.cpp:324-543)

Design: instead of Ceres/g2o's heap-allocated residual blocks, the
observation graph is a fixed-capacity tensor soup
  (kf_idx [O], pt_idx [O], px [O, 2], mask [O])
over pose array SE3[K] and landmark array [L, 3].  Per-observation
2x6 / 2x3 analytic Jacobians (geometry.jacobians) are built in one
vmapped pass; camera/landmark Hessian blocks are assembled with
segment-sums and scatters; the reduced camera system (Schur
complement over landmark blocks) is a small dense solve.  The whole
iteration loop runs inside one jit with no host round-trips — this is
the structure that later shards over a device mesh (parallel/).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry import jacobians as jac
from . import robust
from .nlls import gauss_newton

# Chi2 inlier threshold at 95% for 2 DoF (BA.cpp uses 5.991 throughout).
CHI2_2D = 5.991
MIN_DEPTH = 1e-2

# MXU precision for the BA einsums.  "highest" = 6-pass f32 emulation
# (bitwise-safest); "tensorfloat32" = 3-pass bf16 with f32 accumulation.
# The 1-pass DEFAULT diverged on the real chip (commit c5be0e3).
# Real-TPU A/B (_bench_ba_ab.py, same-script): tf32 931 iters/s vs
# highest 833/819, with BIT-COMPARABLE convergence (max pose error
# 0.006035 vs 0.006047 on the 10KFx500pt workload — both at the
# workload's noise floor).  3-pass it is.
MATMUL_PRECISION = "tensorfloat32"


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate/determinant).

    jnp.linalg.inv on [L, 3, 3] lowers to batched LU — scalar-heavy on
    TPU.  The adjugate form is 27 fused multiplies on the VPU and
    exact in f32 for the well-conditioned (damped) landmark blocks."""
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


class Observations(NamedTuple):
    """Fixed-capacity observation table (invalid rows masked out)."""

    kf_idx: jnp.ndarray  # [O] int32 index into pose array
    pt_idx: jnp.ndarray  # [O] int32 index into landmark array
    px: jnp.ndarray      # [O, 2] measured pixel
    mask: jnp.ndarray    # [O] bool


def reproject(poses: SE3, points: jnp.ndarray, obs: Observations, cam):
    """Residuals + analytic Jacobians for every observation.

    Returns (r [O,2], J_pose [O,2,6], J_point [O,2,3], valid [O]).
    r = projection - measurement; observations whose point falls behind
    the camera are masked invalid (the reference drops them via
    cheirality checks).

    COORDINATE CONVENTION: obs.px must be IDEAL-PINHOLE pixels.  Every
    public BA entry point undistorts raw detections once at its
    boundary (cam.undistort_px) — the reference equivalently converts
    every BA observation through Pixel2Camera2D
    (src/Algorithm/BA.cpp:33,47,106,204,276).  Projecting with
    distorted=False against those is then exact for any camera, and
    the analytic ideal-pinhole Jacobians stay valid.
    """
    T = jax.tree.map(lambda a: a[obs.kf_idx], poses)  # SE3 batched [O]
    pw = points[obs.pt_idx]
    pc = T.apply(pw)
    valid = obs.mask & (pc[..., 2] > MIN_DEPTH)
    pc_safe = pc.at[..., 2].set(jnp.maximum(pc[..., 2], MIN_DEPTH))
    proj = cam.camera_to_pixel(pc_safe, distorted=False)
    r = proj - obs.px
    Jp = jac.duv_dxi(pc_safe, cam.fx, cam.fy)
    Jl = jac.duv_dpoint(pc_safe, T.R, cam.fx, cam.fy)
    return r, Jp, Jl, valid


def _irls_weights(r: jnp.ndarray, valid: jnp.ndarray, huber_delta: float):
    """Per-observation IRLS weight from the 2D residual norm (Huber),
    zeroed on invalid rows."""
    rn = jnp.linalg.norm(r, axis=-1)
    w = robust.huber_weight(rn, huber_delta)
    return jnp.where(valid, w, 0.0)


# --------------------------------------------------------------------------
# Pose-only BA (tracking backend)
# --------------------------------------------------------------------------

def pose_only_ba(
    T_cw: SE3,
    points: jnp.ndarray,
    px: jnp.ndarray,
    mask: jnp.ndarray,
    cam,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_th: float = CHI2_2D,
    use_fused: bool | None = None,
) -> tuple[SE3, jnp.ndarray, jnp.ndarray]:
    """Optimize one camera pose against fixed 3D points, with the
    ORB-style alternating optimize / chi2-reclassify loop
    (BA.cpp:188-264: 4 rounds, Huber in early rounds, outliers'
    residuals disabled between rounds, threshold 5.991).

    Args:
      T_cw: initial pose. points: [N,3] world points. px: [N,2]
      observations. mask: [N] validity. cam: PinholeCamera.
      use_fused: force the fused Pallas kernel on/off (None = on TPU).
    Returns:
      (optimized pose, inlier mask [N], final chi2 scalar).
    """
    # Solver boundary: raw detections -> ideal-pinhole pixels (identity
    # for zero-distortion cameras; see reproject's convention note).
    px = cam.undistort_px(px)
    # TPU fast path: the whole 4-round solve as ONE Pallas kernel —
    # ~40 serial GN iterations cost launch/dependency latency as a
    # chain of small XLA ops (see ops/pallas/pose_ba_fused.py).
    from ..ops.pallas import align2d_kernel as _ak

    if use_fused is None:
        use_fused = _ak.on_tpu()
    if use_fused and points.dtype == jnp.float32:
        from ..ops.pallas.pose_ba_fused import pose_only_ba_fused

        return pose_only_ba_fused(
            T_cw, points, px, mask, cam,
            rounds=rounds, iters_per_round=iters_per_round,
            chi2_th=chi2_th,
        )
    # Specialized reproject: one pose against all points, no
    # Observations indirection — the generic path's kf_idx/pt_idx
    # gathers are identity here, and dropping them shortens the serial
    # GN dependency chain (the tracking hot path runs this ~40 deep).
    def _reproj(T):
        pc = T.apply(points)
        valid = mask & (pc[..., 2] > MIN_DEPTH)
        pc_safe = pc.at[..., 2].set(jnp.maximum(pc[..., 2], MIN_DEPTH))
        proj = cam.camera_to_pixel(pc_safe, distorted=False)
        r = proj - px
        Jp = jac.duv_dxi(pc_safe, cam.fx, cam.fy)
        return r, Jp, valid

    # The round loop is unrolled in Python (rounds is static and tiny):
    # only round 0 traces the MAD-scale medians (two sorts), and each
    # round's reclassification reproject doubles as the next round's
    # weight-freeze reproject.
    T, inlier = T_cw, mask
    r_cur, _, valid_cur = _reproj(T)
    chi2_last = jnp.asarray(0.0, px.dtype)
    for round_i in range(rounds):
        # Round 0: redescending Tukey with MAD scale — given a decent
        # initial pose this zeroes gross outliers entirely (bounded
        # Huber influence can be outvoted at high contamination).
        # Middle rounds: Huber. Last round: plain least squares on the
        # surviving inliers (the reference drops the robust kernel in
        # its final round, BA.cpp:236-241).
        # IRLS: freeze the robust weights at the round's starting pose.
        # Recomputing them inside the GN objective makes chi2
        # non-monotone (weights shift as residuals move), which falsely
        # triggers the rollback and stalls the solver.
        valid0 = valid_cur & inlier
        rn0 = jnp.linalg.norm(r_cur, axis=-1)
        if round_i == 0:
            sigma = jnp.maximum(robust.mad_scale(rn0, valid0), 1.0)
            w_frozen = robust.tukey_weight(rn0 / sigma)
        elif round_i < rounds - 1:
            w_frozen = robust.huber_weight(rn0, jnp.sqrt(chi2_th))
        else:
            w_frozen = jnp.ones_like(rn0)
        w_frozen = jnp.where(valid0, w_frozen, 0.0)

        def compute(Tc, w_frozen=w_frozen):
            r, Jp, valid = _reproj(Tc)
            w = jnp.where(valid, w_frozen, 0.0)
            H = jnp.einsum("oia,o,oib->ab", Jp, w, Jp)
            b = -jnp.einsum("oia,o,oi->a", Jp, w, r)
            chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
            return H, b, chi2

        T, stats = gauss_newton(
            compute, lambda x, dx: se3m.boxplus(x, dx), T,
            n_iter=iters_per_round, eps=1e-4,
        )
        chi2_last = stats.chi2
        # Re-classify: chi2 per observation under the new pose.
        r_cur, _, valid_cur = _reproj(T)
        chi2_per = jnp.sum(r_cur * r_cur, axis=-1)
        new_inlier = valid_cur & (chi2_per < chi2_th)
        # Guard: if classification empties the set (pose not yet
        # converged), keep the previous inlier set so later rounds can
        # still make progress.
        inlier = jnp.where(jnp.any(new_inlier), new_inlier, inlier)
    return T, inlier, chi2_last


# --------------------------------------------------------------------------
# Point-only BA (structure refinement, poses fixed)
# --------------------------------------------------------------------------

def point_only_ba(
    poses: SE3,
    points: jnp.ndarray,
    obs: Observations,
    cam,
    n_iter: int = 5,
    huber_delta: float = jnp.sqrt(CHI2_2D),
) -> jnp.ndarray:
    """Refine every landmark against fixed poses (BA.cpp:266-322).

    Each landmark is an independent 3x3 GN problem; all L problems run
    batched.  Observation blocks are accumulated per landmark with
    segment sums.  Traced at full f32 matmul precision (TPU MXU
    defaults round through bf16; see local_ba).
    """
    obs = obs._replace(px=cam.undistort_px(obs.px))  # solver boundary
    L = points.shape[0]

    def step(pts, _):
        r, _, Jl, valid = reproject(poses, pts, obs, cam)
        w = _irls_weights(r, valid, huber_delta)
        H_o = jnp.einsum("oia,o,oib->oab", Jl, w, Jl)
        b_o = -jnp.einsum("oia,o,oi->oa", Jl, w, r)
        H = jax.ops.segment_sum(H_o, obs.pt_idx, num_segments=L)
        b = jax.ops.segment_sum(b_o, obs.pt_idx, num_segments=L)
        H = H + 1e-6 * jnp.eye(3, dtype=H.dtype)
        dx = jnp.einsum("lab,lb->la", inv3x3(H), b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return pts + dx, None

    with jax.default_matmul_precision(MATMUL_PRECISION):
        pts, _ = jax.lax.scan(step, points, None, length=n_iter)
    return pts


# --------------------------------------------------------------------------
# Full BA with Schur complement (local BA / two-view BA)
# --------------------------------------------------------------------------

class BAResult(NamedTuple):
    poses: SE3
    points: jnp.ndarray
    chi2: jnp.ndarray
    inlier: jnp.ndarray  # [O] final per-observation inlier mask


def _assemble(poses, points, obs, cam, fixed_pose, huber_delta, K, L,
              w_frozen=None, fixed_point=None):
    """Build all Hessian blocks and gradients for the current state.

    If `w_frozen` is given, it is used as the (already masked) IRLS
    weight vector instead of recomputing weights from the current
    residuals — needed so LM accept/reject compares chi2 under one
    consistent objective.  `fixed_point` ([L] bool) freezes landmark
    blocks the same way `fixed_pose` freezes cameras.
    """
    r, Jp, Jl, valid = reproject(poses, points, obs, cam)
    if w_frozen is None:
        w = _irls_weights(r, valid, huber_delta)
    else:
        w = jnp.where(valid, w_frozen, 0.0)
    # Zero out Jacobians of fixed cameras (gauge fixing).
    free = (~fixed_pose)[obs.kf_idx].astype(Jp.dtype)
    Jp = Jp * free[:, None, None]
    if fixed_point is not None:
        # Zeroed landmark Jacobians -> zero Hll/W/bl blocks; with LM
        # damping on Hll the back-substituted update is exactly zero.
        freep = (~fixed_point)[obs.pt_idx].astype(Jl.dtype)
        Jl = Jl * freep[:, None, None]
    Hcc_o = jnp.einsum("oia,o,oib->oab", Jp, w, Jp)            # [O,6,6]
    Hll_o = jnp.einsum("oia,o,oib->oab", Jl, w, Jl)            # [O,3,3]
    Hcl_o = jnp.einsum("oia,o,oib->oab", Jp, w, Jl)            # [O,6,3]
    bc_o = -jnp.einsum("oia,o,oi->oa", Jp, w, r)               # [O,6]
    bl_o = -jnp.einsum("oia,o,oi->oa", Jl, w, r)               # [O,3]
    Hcc = jax.ops.segment_sum(Hcc_o, obs.kf_idx, num_segments=K)
    Hll = jax.ops.segment_sum(Hll_o, obs.pt_idx, num_segments=L)
    bc = jax.ops.segment_sum(bc_o, obs.kf_idx, num_segments=K)
    bl = jax.ops.segment_sum(bl_o, obs.pt_idx, num_segments=L)
    # Camera-landmark coupling blocks W[k, l, 6, 3] via scatter-add.
    W = jnp.zeros((K, L, 6, 3), dtype=Hcl_o.dtype)
    W = W.at[obs.kf_idx, obs.pt_idx].add(Hcl_o)
    chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return Hcc, Hll, W, bc, bl, chi2


def _schur_solve(Hcc, Hll, W, bc, bl, fixed_pose, lam):
    """Marginalize landmarks and solve the reduced camera system.

    S = Hcc - W Hll^-1 W^T (dense [6K, 6K]); landmark back-substitution
    dl = Hll^-1 (bl - W^T dc).  `lam` is LM damping added to both
    diagonals.  Fixed cameras get identity rows/cols so their update
    is exactly zero.
    """
    K, L = W.shape[0], W.shape[1]
    dtype = Hcc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    Hll_d = Hll + (lam + 1e-6) * eye3
    Hll_inv = inv3x3(Hll_d)                                    # [L,3,3]
    A = jnp.einsum("klab,lbc->klac", W, Hll_inv)               # [K,L,6,3]
    S_red = jnp.einsum("klac,mlbc->kmab", A, W)                # [K,K,6,6]
    S = -S_red
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        Hcc + lam * jnp.eye(6, dtype=dtype)
    )
    b_red = bc - jnp.einsum("klac,lc->ka", A, bl)              # [K,6]
    # Gauge fixing: identity block rows/cols for fixed cameras.
    free = (~fixed_pose).astype(dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.eye(6, dtype=dtype)[None] * fixed_pose.astype(dtype)[:, None, None]
    )
    b_red = b_red * free[:, None]
    S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    b_vec = b_red.reshape(K * 6)
    dc = jnp.linalg.solve(
        S_mat + 1e-8 * jnp.eye(K * 6, dtype=dtype), b_vec
    ).reshape(K, 6)
    dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
    dl = jnp.einsum(
        "lab,lb->la", Hll_inv, bl - jnp.einsum("klab,ka->lb", W, dc)
    )
    dl = jnp.where(jnp.isfinite(dl), dl, 0.0)
    return dc, dl


def local_ba(
    poses: SE3,
    points: jnp.ndarray,
    obs: Observations,
    cam,
    fixed_pose: jnp.ndarray,
    n_iter: int = 10,
    huber_delta: float = jnp.sqrt(CHI2_2D),
    chi2_th: float = CHI2_2D,
    fixed_point: jnp.ndarray | None = None,
) -> BAResult:
    """Windowed bundle adjustment over SE3[K] poses and [L,3] landmarks
    with an LM accept/reject schedule, replacing LocalBAG2O
    (BA.cpp:386-543: Levenberg, Huber delta=sqrt(5.991), marginalized
    landmark blocks, 20 iterations, outlier marking at the end).

    fixed_pose: [K] bool — gauge-fixed cameras (the reference fixes the
    first/oldest keyframe, BA.cpp:341,417).
    """
    obs = obs._replace(px=cam.undistort_px(obs.px))  # solver boundary
    # TPU MXU f32 contractions round through bf16 at the 1-pass default,
    # which visibly degrades the Hessian blocks / Schur reduction (see
    # parallel.sharded_ba).  Trace the BA math at >= 3-pass precision
    # (MATMUL_PRECISION above).
    with jax.default_matmul_precision(MATMUL_PRECISION):
        return _local_ba(poses, points, obs, cam, fixed_pose, n_iter,
                         huber_delta, chi2_th, fixed_point)


def _local_ba(poses, points, obs, cam, fixed_pose, n_iter,
              huber_delta, chi2_th, fixed_point=None):
    K, L = fixed_pose.shape[0], points.shape[0]

    def body(carry, _):
        T, pts, lam, chi2_old = carry
        # Freeze the IRLS weights at the iteration's start state so the
        # accept/reject test compares chi2 under one objective.
        r, _, _, valid = reproject(T, pts, obs, cam)
        w_frozen = _irls_weights(r, valid, huber_delta)
        Hcc, Hll, W, bc, bl, chi2_old_w = _assemble(
            T, pts, obs, cam, fixed_pose, huber_delta, K, L, w_frozen,
            fixed_point
        )
        dc, dl = _schur_solve(Hcc, Hll, W, bc, bl, fixed_pose, lam)
        T_new = jax.vmap(se3m.boxplus)(T, dc)
        pts_new = pts + dl
        _, _, _, _, _, chi2_new = _assemble(
            T_new, pts_new, obs, cam, fixed_pose, huber_delta, K, L,
            w_frozen, fixed_point
        )
        chi2_old = chi2_old_w
        accept = chi2_new < chi2_old
        T_next = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), T, T_new
        )
        pts_next = jnp.where(accept, pts_new, pts)
        lam_next = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam_next = jnp.clip(lam_next, 1e-8, 1e4)
        chi2_next = jnp.where(accept, chi2_new, chi2_old)
        return (T_next, pts_next, lam_next, chi2_next), chi2_next

    _, _, _, _, _, chi2_init = _assemble(
        poses, points, obs, cam, fixed_pose, huber_delta, K, L
    )
    (T, pts, _, chi2), _ = jax.lax.scan(
        body,
        (poses, points, jnp.asarray(1e-4, points.dtype), chi2_init),
        None,
        length=n_iter,
    )
    # Final outlier marking (BA.cpp:519-537).
    r, _, _, valid = reproject(T, pts, obs, cam)
    inlier = valid & (jnp.sum(r * r, axis=-1) < chi2_th)
    return BAResult(poses=T, points=pts, chi2=chi2, inlier=inlier)


def optimize_current(
    poses: SE3,
    points: jnp.ndarray,
    obs: Observations,
    cam,
    cur_k,
    n_iter: int = 10,
    huber_delta: float = jnp.sqrt(CHI2_2D),
    chi2_th: float = 4.0 * CHI2_2D,
) -> BAResult:
    """Joint refinement of ONE camera pose plus the landmarks it
    observes (OptimizeCurrent, BA.cpp:91-186).

    The reference builds a Ceres problem with (a) pose+point residuals
    for every current-frame feature and (b) point-only residuals from
    each landmark's other keyframe observations (those keyframes'
    poses enter as constants), solved with DENSE_SCHUR and a final
    chi2 classification at 4*5.991 px^2.  Here that is exactly the
    windowed Schur BA with every pose but `cur_k` gauge-fixed and
    every landmark NOT observed by `cur_k` frozen: observations from
    fixed cameras reduce to the reference's point-only anchor
    residuals, and the one-free-camera reduced system is a 6x6 solve.

    Args:
      poses: SE3[K] all camera poses (only `cur_k` moves).
      points: [L, 3] landmarks (only those observed by `cur_k` move).
      obs: observation table covering the current frame AND the
        anchoring keyframe observations of its landmarks.
      cur_k: int index of the free camera.
    Returns:
      BAResult: updated poses/points and the per-observation inlier
      mask at `chi2_th` (classification only; residuals are not
      disabled mid-solve — Huber does the down-weighting, as in the
      reference where the 4-round re-enable loop is commented out).
    """
    K = jax.tree.leaves(poses)[0].shape[0]
    L = points.shape[0]
    fixed_pose = jnp.arange(K) != cur_k
    seen = jnp.zeros(L, bool).at[obs.pt_idx].max(
        (obs.kf_idx == cur_k) & obs.mask
    )
    return local_ba(
        poses, points, obs, cam, fixed_pose,
        n_iter=n_iter, huber_delta=huber_delta, chi2_th=chi2_th,
        fixed_point=~seen,
    )


def two_view_ba(
    T_ref: SE3,
    T_cur: SE3,
    points: jnp.ndarray,
    px_ref: jnp.ndarray,
    px_cur: jnp.ndarray,
    mask: jnp.ndarray,
    cam,
    n_iter: int = 10,
) -> BAResult:
    """Two-view refinement after monocular initialization
    (TwoViewBACeres, BA.cpp:11-89): reference pose fixed, current pose
    + all points free; Huber robustification; returns per-point inlier
    classification at chi2 5.991 (both views must agree).
    """
    N = points.shape[0]
    poses = jax.tree.map(lambda a, b: jnp.stack([a, b]), T_ref, T_cur)
    obs = Observations(
        kf_idx=jnp.concatenate(
            [jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)]
        ),
        pt_idx=jnp.tile(jnp.arange(N, dtype=jnp.int32), 2),
        px=jnp.concatenate([px_ref, px_cur]),
        mask=jnp.concatenate([mask, mask]),
    )
    fixed = jnp.array([True, False])
    res = local_ba(poses, points, obs, cam, fixed, n_iter=n_iter)
    inlier_pt = res.inlier[:N] & res.inlier[N:]
    return BAResult(
        poses=res.poses, points=res.points, chi2=res.chi2, inlier=inlier_pt
    )
