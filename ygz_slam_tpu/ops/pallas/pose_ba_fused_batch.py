"""Multi-sequence pose-only BA: S independent solves in ONE kernel.

The single-sequence fused kernel (pose_ba_fused) keeps points on the
LANE axis and the pose as [1, 1] splat tiles.  The batch path
(parallel.batch_tracking) previously vmapped the XLA formulation over
sequences — the ~40-iteration serial dependency chain of small ops is
latency-bound regardless of batching, and it dominated the batched
track step.  Here the whole batch solves together: every [1, Np] row
becomes [S, Np] (sequences on the SUBLANE axis — S=8 is exactly one
sublane tile) and every [1, 1] pose scalar becomes an [S, 1] column;
the arithmetic is unchanged because it is written with broadcasting.
Each sequence keeps its own rollback/convergence gating via [S, 1]
freeze flags; the early-exit while_loop stops when EVERY sequence has
stopped (jnp.min over the flag column).

Semantics per sequence are identical to pose_ba_fused (ORB-style
4-round optimize/chi2-reclassify, BA.cpp:188-264; GN with rollback,
NLSSolver_impl.hpp:16-89).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pose_ba_fused import (
    MIN_DEPTH, CHI2_2D, TUKEY_B, _solve6, _retract_left, EARLY_EXIT,
)


def _kernel(rounds: int, iters_per_round: int, eps: float,
            early_exit: bool, meta_ref, glob_ref, out_ref):
    meta = meta_ref[...]                    # [8, S, Np]
    glob = glob_ref[...]                    # [S, 32]
    dt = meta.dtype

    def g(k):
        return glob[:, k:k + 1]             # [S, 1]

    X = meta[0]                             # [S, Np] world points
    Y = meta[1]
    Z = meta[2]
    U = meta[3]                             # measured pixels
    V = meta[4]
    msk = meta[5]                           # validity (0/1)

    fx, fy, cx, cy = g(12), g(13), g(14), g(15)
    chi2_th = g(17)
    huber_k = jnp.sqrt(chi2_th)

    def s2(x):                              # lane reduce -> [S, 1]
        return jnp.sum(x, axis=-1, keepdims=True)

    def reproj(R, t):
        x = R[0] * X + R[1] * Y + R[2] * Z + t[0]
        y = R[3] * X + R[4] * Y + R[5] * Z + t[1]
        z = R[6] * X + R[7] * Y + R[8] * Z + t[2]
        valid = msk * jnp.where(z > MIN_DEPTH, 1.0, 0.0).astype(dt)
        zs = jnp.maximum(z, MIN_DEPTH)
        zi = 1.0 / zs
        zi2 = zi * zi
        ru = fx * x * zi + cx - U
        rv = fy * y * zi + cy - V
        Ju = [fx * zi, 0.0 * zi, -fx * x * zi2,
              -fx * x * y * zi2, fx * (1.0 + x * x * zi2), -fx * y * zi]
        Jv = [0.0 * zi, fy * zi, -fy * y * zi2,
              -fy * (1.0 + y * y * zi2), fy * x * y * zi2, fy * x * zi]
        return ru, rv, Ju, Jv, valid

    def normal_eq(R, t, w_frozen):
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
        lo = half_cnt * 0.0
        hi = jnp.max(vals * vmask, axis=-1, keepdims=True)
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
        valid0 = valid * inlier
        rn = jnp.sqrt(ru * ru + rv * rv)
        if round_i == 0:
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
            Hab = [upd * n_ + (one - upd) * o_
                   for n_, o_ in zip(Hn, Hab)]
            bv = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(bn, bv)]
            chi2 = upd * chi2n + (one - upd) * chi2
            stop = jnp.maximum(stop, jnp.maximum(worse, conv))
            return R, t, Hab, bv, chi2, stop

        if early_exit:
            # [S, 1] f32 carries; the loop runs until EVERY sequence's
            # flag is set (or the iteration cap).
            def cond(carry):
                it, stop = carry[0], carry[1]
                return (jnp.min(stop) < 0.5) & (
                    jnp.max(it) < float(iters_per_round))

            def body(carry):
                it, stop = carry[0], carry[1]
                R = list(carry[2:11])
                t = list(carry[11:14])
                Hab = list(carry[14:35])
                bv = list(carry[35:41])
                chi2 = carry[41]
                R, t, Hab, bv, chi2, stop = gn_step(
                    R, t, Hab, bv, chi2, stop)
                return tuple(
                    [it + 1.0, stop] + R + t + Hab + bv + [chi2])

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

        ru, rv, _, _, valid = reproj(R, t)
        chi2_per = ru * ru + rv * rv
        new_inlier = valid * jnp.where(chi2_per < chi2_th, 1.0, 0.0)
        any_new = jnp.where(s2(new_inlier) > 0.5, 1.0, 0.0)  # [S, 1]
        inlier = any_new * new_inlier + (1.0 - any_new) * inlier

    S, Np = X.shape
    vals = R + t + [chi2_out]               # 13 x [S, 1]
    olane = jax.lax.broadcasted_iota(jnp.int32, (S, Np), 1)
    row0 = jnp.zeros((S, Np), dt)
    for k, v in enumerate(vals):
        row0 = row0 + v * (olane == k).astype(dt)
    out = jnp.stack(
        [row0, inlier] + [jnp.zeros((S, Np), dt)] * 6, axis=0
    )
    out_ref[...] = out


def pose_only_ba_fused_batch(
    T_cw,                   # SE3 batched [S]
    points: jnp.ndarray,    # [S, N, 3]
    px: jnp.ndarray,        # [S, N, 2]
    mask: jnp.ndarray,      # [S, N]
    cam,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_th: float = CHI2_2D,
    eps: float = 1e-4,
    early_exit: bool | None = None,
):
    """S pose-only BA solves in one kernel.  Returns
    (SE3 batched [S], inlier [S, N] bool, chi2 [S])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ...geometry.se3 import SE3

    if early_exit is None:
        early_exit = EARLY_EXIT
    S, N = mask.shape
    dt = points.dtype
    Np = -(-N // 128) * 128
    pad = Np - N

    meta = jnp.stack([
        points[..., 0], points[..., 1], points[..., 2],
        px[..., 0], px[..., 1], mask.astype(dt),
        jnp.zeros((S, N), dt), jnp.zeros((S, N), dt),
    ], axis=0)                                          # [8, S, N]
    meta = jnp.pad(meta, ((0, 0), (0, 0), (0, pad)))
    glob = jnp.concatenate([
        T_cw.R.reshape(S, 9), T_cw.t.reshape(S, 3),
        jnp.broadcast_to(
            jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]).astype(dt),
            (S, 4)),
        jnp.zeros((S, 1), dt),
        jnp.full((S, 1), chi2_th, dt),
        jnp.zeros((S, 14), dt),
    ], axis=1)                                          # [S, 32]

    out = pl.pallas_call(
        partial(_kernel, rounds, iters_per_round, eps, early_exit),
        out_shape=jax.ShapeDtypeStruct((8, S, Np), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(meta, glob)

    R = out[0, :, 0:9].reshape(S, 3, 3)
    t = out[0, :, 9:12]
    chi2 = out[0, :, 12]
    inlier = out[1, :, :N] > 0.5
    return SE3(R=R, t=t), inlier, chi2
