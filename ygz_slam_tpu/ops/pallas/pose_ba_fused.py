"""Fully-fused pose-only bundle adjustment as ONE Pallas TPU kernel.

The XLA formulation (solvers.ba.pose_only_ba) runs the ORB-style
4-round optimize / chi2-reclassify loop (src/Algorithm/BA.cpp:188-264)
as ~40 serial Gauss-Newton iterations, each a chain of small device
ops inside `lax.while_loop`s; at 200 points the launch/dependency
latency of that chain — not the math — dominates (the same pathology
the fused align2d / sparse-align kernels removed).  Here the whole
solve — reprojection, analytic 2x6 Jacobians, the 6x6 normal
equations, Cholesky, the left-multiplicative SE(3) retraction, GN
rollback/convergence gating, per-round robust reweighting and inlier
reclassification — runs inside a single kernel.

Layout inverts the sparse-align kernel's: pose BA carries only a
handful of scalars per point, so points live on the LANE axis — every
per-point quantity is a [1, Np] row (two lane-tiles at Np=256), not a
[N, 1] column (25 sublane-tiles).  Global pose state is [1, 1] splat
tiles exactly as in sparse_align_fused (unrolled Cholesky, sqrt-free
Taylor Rodrigues exp — here composed on the LEFT, matching
se3.boxplus's exp(dx) * T).

The round-0 MAD scale (two masked medians) is hoisted to XLA in the
wrapper: it needs sorts, it depends only on the INIT pose, and
freezing it there matches the IRLS freeze-per-round rule (see
solvers.ba.pose_only_ba).

Reference: OptimizeCurrentPoseOnly (src/Algorithm/BA.cpp:188-264 — 4
rounds, Huber, outlier residuals disabled between rounds, chi2 5.991)
with solver semantics of NLSSolver_impl.hpp:16-89.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...solvers import robust

MIN_DEPTH = 1e-2
CHI2_2D = 5.991
TUKEY_B = robust.TUKEY_B
# Bench-level A/B toggle: each round's GN loop as an in-kernel
# while_loop that stops at convergence/rollback instead of paying for
# all iterations.
EARLY_EXIT = True
# Compute the round-0 MAD scale inside the kernel as 12-step bisection
# medians on [1, Np] rows instead of hoisting two XLA sorts + glue
# into the per-frame path.  A/B toggle.
MAD_IN_KERNEL = True


def _solve6(Hab, bv):
    """H dx = b via unrolled Cholesky on [1, 1] entries (damping +
    non-finite guard matching solvers.nlls._solve_spd)."""
    A = [[None] * 6 for _ in range(6)]
    k = 0
    for a in range(6):
        for b in range(a, 6):
            A[a][b] = Hab[k]
            A[b][a] = Hab[k]
            k += 1
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        d = A[j][j] + 1e-8
        for q in range(j):
            d = d - L[j][q] * L[j][q]
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-20))
        L[j][j] = Ljj
        for i in range(j + 1, 6):
            sacc = A[i][j]
            for q in range(j):
                sacc = sacc - L[i][q] * L[j][q]
            L[i][j] = sacc / Ljj
    yv = [None] * 6
    for i in range(6):
        sacc = bv[i]
        for q in range(i):
            sacc = sacc - L[i][q] * yv[q]
        yv[i] = sacc / L[i][i]
    dx = [None] * 6
    for i in range(5, -1, -1):
        sacc = yv[i]
        for q in range(i + 1, 6):
            sacc = sacc - L[q][i] * dx[q]
        dx[i] = sacc / L[i][i]
    finite = (dx[0] * 0.0 + 1.0)
    for i in range(6):
        finite = finite * jnp.where(
            (dx[i] == dx[i]) & (jnp.abs(dx[i]) < 1e9), 1.0, 0.0
        )
    return [d * finite for d in dx]


def _exp_se3(dx):
    """SE(3) exp on [1, 1] tiles: returns (Re 9-list, te 3-list) via
    sqrt-free Taylor Rodrigues (series in theta^2; a trust-region
    clamp keeps theta inside the series' accuracy radius — steps that
    large are garbage and get rolled back anyway)."""
    t2 = dx[3] * dx[3] + dx[4] * dx[4] + dx[5] * dx[5]
    theta = jnp.sqrt(jnp.maximum(t2, 1e-24))
    sc = jnp.minimum(1.0, 1.2 / theta)
    dxc = [d * sc for d in dx]
    tt = t2 * sc * sc
    a = 1.0 - tt / 6.0 * (1.0 - tt / 20.0 * (1.0 - tt / 42.0 * (1.0 - tt / 72.0)))
    b = 0.5 * (1.0 - tt / 12.0 * (1.0 - tt / 30.0 * (1.0 - tt / 56.0 * (1.0 - tt / 90.0))))
    c = (1.0 / 6.0) * (1.0 - tt / 20.0 * (1.0 - tt / 42.0 * (1.0 - tt / 72.0 * (1.0 - tt / 110.0))))
    wx, wy, wz = dxc[3], dxc[4], dxc[5]
    W = [0.0 * wx, -wz, wy, wz, 0.0 * wx, -wx, -wy, wx, 0.0 * wx]
    W2 = [None] * 9
    for i in range(3):
        for j in range(3):
            acc = 0.0 * wx
            for q in range(3):
                acc = acc + W[3 * i + q] * W[3 * q + j]
            W2[3 * i + j] = acc
    eye = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    Re = [eye[i] + a * W[i] + b * W2[i] for i in range(9)]
    Vm = [eye[i] + b * W[i] + c * W2[i] for i in range(9)]
    te = [
        Vm[3 * i + 0] * dxc[0] + Vm[3 * i + 1] * dxc[1] + Vm[3 * i + 2] * dxc[2]
        for i in range(3)
    ]
    return Re, te


def _retract_left(R, t, dx):
    """T <- exp(dx) * T on [1, 1] tiles (se3.boxplus convention)."""
    Re, te = _exp_se3(dx)
    Rn = [None] * 9
    for i in range(3):
        for j in range(3):
            acc = 0.0 * dx[0]
            for q in range(3):
                acc = acc + Re[3 * i + q] * R[3 * q + j]
            Rn[3 * i + j] = acc
    tn = [
        Re[3 * i + 0] * t[0] + Re[3 * i + 1] * t[1] + Re[3 * i + 2] * t[2]
        + te[i]
        for i in range(3)
    ]
    return Rn, tn


def _kernel(rounds: int, iters_per_round: int, eps: float, early_exit: bool,
            mad_in_kernel: bool, meta_ref, glob_ref, out_ref):
    meta = meta_ref[...]                    # [8, Np]
    glob = glob_ref[...]                    # [1, 32]
    dt = meta.dtype

    def g(k):
        return glob[:, k:k + 1]             # [1, 1]

    X = meta[0:1, :]                        # [1, Np] world points
    Y = meta[1:2, :]
    Z = meta[2:3, :]
    U = meta[3:4, :]                        # measured pixels
    V = meta[4:5, :]
    msk = meta[5:6, :]                      # validity (0/1)

    fx, fy, cx, cy = g(12), g(13), g(14), g(15)
    sigma0 = g(16)
    chi2_th = g(17)
    huber_k = jnp.sqrt(chi2_th)

    def s2(x):                              # lane reduce -> [1, 1]
        return jnp.sum(x, axis=1, keepdims=True)

    def reproj(R, t):
        """Per-point residuals + 2x6 Jacobian rows at pose (R, t).

        Returns (ru, rv [1,Np], Ju, Jv 6-lists of [1,Np], valid)."""
        x = R[0] * X + R[1] * Y + R[2] * Z + t[0]
        y = R[3] * X + R[4] * Y + R[5] * Z + t[1]
        z = R[6] * X + R[7] * Y + R[8] * Z + t[2]
        valid = msk * jnp.where(z > MIN_DEPTH, 1.0, 0.0).astype(dt)
        zs = jnp.maximum(z, MIN_DEPTH)
        zi = 1.0 / zs
        zi2 = zi * zi
        ru = fx * x * zi + cx - U
        rv = fy * y * zi + cy - V
        # duv_dxyz @ [I | -hat(pc)] (geometry.jacobians.duv_dxi).
        Ju = [fx * zi, 0.0 * zi, -fx * x * zi2,
              -fx * x * y * zi2, fx * (1.0 + x * x * zi2), -fx * y * zi]
        Jv = [0.0 * zi, fy * zi, -fy * y * zi2,
              -fy * (1.0 + y * y * zi2), fy * x * y * zi2, fy * x * zi]
        return ru, rv, Ju, Jv, valid

    def normal_eq(R, t, w_frozen):
        """(Hab 21, bv 6, chi2) under frozen IRLS weights, re-masked by
        the trial pose's cheirality (pose_only_ba.compute)."""
        ru, rv, Ju, Jv, valid = reproj(R, t)
        w = w_frozen * valid
        Hab = []
        for a in range(6):
            wJu = w * Ju[a]
            wJv = w * Jv[a]
            for b in range(a, 6):
                Hab.append(s2(wJu * Ju[b] + wJv * Jv[b]))
        bv = [-s2(w * (Ju[a] * ru + Jv[a] * rv)) for a in range(6)]
        chi2 = s2(w * (ru * ru + rv * rv))
        return Hab, bv, chi2

    R = [g(i) for i in range(9)]
    t = [g(9 + i) for i in range(3)]

    def med_bisect(vals, vmask, half_cnt):
        """Masked median via bisection on [1, Np] rows (the round-0 MAD
        scale cannot always be hoisted: sorts cost XLA ops per frame)."""
        lo = half_cnt * 0.0
        hi = jnp.max(vals * vmask, axis=1, keepdims=True)
        for _ in range(12):
            mid = 0.5 * (lo + hi)
            cnt = s2(vmask * jnp.where(vals <= mid, 1.0, 0.0))
            ge = jnp.where(cnt >= half_cnt, 1.0, 0.0)
            hi = ge * mid + (1.0 - ge) * hi
            lo = ge * lo + (1.0 - ge) * mid
        return 0.5 * (lo + hi)

    ru, rv, _, _, valid = reproj(R, t)
    inlier = msk
    chi2_out = g(16) * 0.0
    for round_i in range(rounds):
        # Frozen IRLS weights at the round's starting pose (recomputing
        # them inside the objective makes chi2 non-monotone and falsely
        # trips the rollback — see solvers.ba.pose_only_ba).
        valid0 = valid * inlier
        rn = jnp.sqrt(ru * ru + rv * rv)
        if round_i == 0:
            if mad_in_kernel:
                half_cnt = 0.5 * s2(valid0)
                med = med_bisect(rn, valid0, half_cnt)
                mad = med_bisect(jnp.abs(rn - med), valid0, half_cnt)
                sigma0 = jnp.maximum(1.4826 * mad, 1.0)
            xw = rn / (sigma0 * TUKEY_B)
            wt = (1.0 - xw * xw)
            w_frozen = jnp.where(jnp.abs(xw) < 1.0, wt * wt, 0.0 * wt)
        elif round_i < rounds - 1:
            w_frozen = jnp.where(
                rn <= huber_k, rn * 0.0 + 1.0,
                huber_k / jnp.maximum(rn, 1e-12),
            )
        else:
            w_frozen = rn * 0.0 + 1.0
        w_frozen = w_frozen * valid0

        # GN loop, semantics of nlls.gauss_newton: carried (H, b, chi2)
        # evaluated at the carried pose; one normal_eq per iteration at
        # the trial point; rollback + stop when chi2 increases; stop
        # when max|dx| < eps.  With early_exit, the loop is a
        # lax.while_loop over [1, 1] f32 carries (the only carry form
        # Mosaic legalizes) so converged rounds stop paying for the
        # remaining iterations; otherwise a fixed-trip unroll with the
        # same freeze semantics.
        Hab, bv, chi2 = normal_eq(R, t, w_frozen)

        def gn_step(R, t, Hab, bv, chi2, stop):
            one = chi2 * 0.0 + 1.0
            dx = _solve6(Hab, bv)
            amax = jnp.abs(dx[0])
            for i in range(1, 6):
                amax = jnp.maximum(amax, jnp.abs(dx[i]))
            conv = jnp.where(amax < eps, 1.0, 0.0)
            R_try, t_try = _retract_left(R, t, dx)
            Hn, bn, chi2n = normal_eq(R_try, t_try, w_frozen)
            worse = jnp.where(chi2n > chi2, 1.0, 0.0)
            upd = (one - stop) * (one - worse)
            R = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(R_try, R)]
            t = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(t_try, t)]
            Hab = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(Hn, Hab)]
            bv = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(bn, bv)]
            chi2 = upd * chi2n + (one - upd) * chi2
            stop = jnp.maximum(stop, jnp.maximum(worse, conv))
            return R, t, Hab, bv, chi2, stop

        if early_exit:
            def cond(carry):
                it, stop = carry[0], carry[1]
                return (stop[0, 0] < 0.5) & (
                    it[0, 0] < float(iters_per_round))

            def body(carry):
                it, stop = carry[0], carry[1]
                R = list(carry[2:11])
                t = list(carry[11:14])
                Hab = list(carry[14:35])
                bv = list(carry[35:41])
                chi2 = carry[41]
                R, t, Hab, bv, chi2, stop = gn_step(
                    R, t, Hab, bv, chi2, stop)
                return tuple([it + 1.0, stop] + R + t + Hab + bv + [chi2])

            it0 = chi2 * 0.0
            carry = tuple([it0, it0] + R + t + Hab + bv + [chi2])
            carry = jax.lax.while_loop(cond, body, carry)
            R = list(carry[2:11])
            t = list(carry[11:14])
            chi2 = carry[41]
        else:
            stop = chi2 * 0.0
            for _ in range(iters_per_round):
                R, t, Hab, bv, chi2, stop = gn_step(
                    R, t, Hab, bv, chi2, stop)
        chi2_out = chi2

        # Reclassify at the round's final pose (doubles as the next
        # round's weight-freeze residual pass).
        ru, rv, _, _, valid = reproj(R, t)
        chi2_per = ru * ru + rv * rv
        new_inlier = valid * jnp.where(chi2_per < chi2_th, 1.0, 0.0)
        any_new = jnp.where(s2(new_inlier) > 0.5, 1.0, 0.0)  # [1, 1]
        inlier = any_new * new_inlier + (1.0 - any_new) * inlier

    Np = meta.shape[1]
    vals = R + t + [chi2_out]               # 13 x [1, 1]
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    row0 = jnp.zeros((1, Np), dt)
    for k, v in enumerate(vals):
        row0 = row0 + v * (olane == k).astype(dt)
    out = jnp.concatenate(
        [row0, inlier, jnp.zeros((6, Np), dt)], axis=0
    )
    out_ref[...] = out


def pose_only_ba_fused(
    T_cw,
    points: jnp.ndarray,
    px: jnp.ndarray,
    mask: jnp.ndarray,
    cam,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_th: float = CHI2_2D,
    eps: float = 1e-4,
    early_exit: bool | None = None,
):
    """Drop-in fused equivalent of solvers.ba.pose_only_ba (pinhole
    path).  Returns (SE3, inlier mask [N] bool, final chi2 scalar)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ...geometry.se3 import SE3

    if early_exit is None:
        early_exit = EARLY_EXIT

    N = points.shape[0]
    dt = points.dtype
    Np = -(-N // 128) * 128

    if MAD_IN_KERNEL:
        # Round-0 MAD scale via in-kernel bisection medians.
        sigma0 = jnp.zeros((), dt)
    else:
        # Round-0 MAD scale, hoisted: residual norms at the INIT pose.
        pc = T_cw.apply(points)
        valid0 = mask & (pc[..., 2] > MIN_DEPTH)
        pc_safe = pc.at[..., 2].set(jnp.maximum(pc[..., 2], MIN_DEPTH))
        proj = cam.camera_to_pixel(pc_safe, distorted=False)
        rn0 = jnp.linalg.norm(proj - px, axis=-1)
        sigma0 = jnp.maximum(robust.mad_scale(rn0, valid0), 1.0)

    pad = Np - N
    meta = jnp.stack([
        points[:, 0], points[:, 1], points[:, 2],
        px[:, 0], px[:, 1], mask.astype(dt),
    ], axis=0)                                          # [6, N]
    meta = jnp.pad(meta, ((0, 2), (0, pad)))
    glob = jnp.concatenate([
        T_cw.R.reshape(9), T_cw.t.reshape(3),
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]).astype(dt),
        sigma0[None].astype(dt),
        jnp.asarray([chi2_th], dt),
        jnp.zeros(14, dt),
    ]).reshape(1, 32)

    out = pl.pallas_call(
        partial(_kernel, rounds, iters_per_round, eps, early_exit,
                MAD_IN_KERNEL),
        out_shape=jax.ShapeDtypeStruct((8, Np), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(meta, glob)

    R = out[0, 0:9].reshape(3, 3)
    t = out[0, 9:12]
    chi2 = out[0, 12]
    inlier = out[1, :N] > 0.5
    return SE3(R=R, t=t), inlier, chi2
