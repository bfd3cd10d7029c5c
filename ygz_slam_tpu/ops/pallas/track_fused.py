"""The ENTIRE per-frame tracking computation — sparse-direct alignment
over all pyramid levels, map-patch alignment (align2d), and pose-only
BA — as ONE Pallas TPU kernel.

What remains in XLA per frame: the pyramid build (MXU matmuls), four
window gathers (3 sparse levels + align2d, ALL at the frame-init pose
so their DMAs are independent), input packing, and output unpacking.
Everything data-dependent and serial — three coarse-to-fine GN loops,
ten align2d iterations, four pose-BA rounds — runs in-kernel, so the
whole step costs one launch instead of ~6 launches plus ~10 XLA glue
fusions serialized between them.

Stage plumbing inside the kernel:
- sparse levels: identical machinery to sparse_align_mega._mega_kernel
  (frozen per-level Hessian assembled + Cholesky-factored in-kernel,
  substitution-only while-loop GN with [1, 1] f32 carries).
- align2d starts from the landmarks' projections at the SPARSE-RESULT
  pose (computed in-kernel); its windows were gathered at the
  frame-init pose, whose error the CACHE_SLACK=11 px budget absorbs
  on top of the per-point drift the caller accepts.  Gates match
  ops.align.align2d: in-bounds at margins 6 (init) and 5 (final),
  err < max_error, drift < min(16, CACHE_SLACK).
- pose BA consumes align2d's per-point [N, 1] columns after an MXU
  transpose (dot_general against an in-kernel iota identity — the
  lane-major [1, Np] layout makes each of its ~40 GN iterations ~2
  vector tiles instead of ~25).  The round-0 MAD scale cannot be
  hoisted here (its residuals are against in-kernel align2d output),
  so the masked medians run as 12-step bisections on [1, Np] rows.

Reference: the per-frame tracking pipeline TrackRefFrame ->
TrackLocalMap -> OptimizeCurrentPoseOnly
(src/Module/VisualOdometry.cpp:281-302, src/Module/LocalMapping.cpp:
24-146, src/Algorithm/BA.cpp:188-264).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .align2d_kernel import gather_windows, CACHE_WIN, CACHE_SLACK
from .align2d_kernel import PATCH as A2D_PATCH
from .sparse_align_fused import (
    CWIN, FLAT, PATCH, SUP, _SMAX_BITS, SLACK, _HALF,
)
from .pose_ba_fused import _solve6, _retract_left, TUKEY_B

A2D_FLAT = CACHE_WIN * CACHE_WIN        # 1024
_A2D_BITS = 10
MIN_DEPTH = 1e-2


def _chol6(Hab):
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
    return L


def _subst6(L, bv):
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


def _retract_right(R, t, dx):
    """T <- T * exp(dx) on [1, 1] tiles (sparse-align convention)."""
    from .pose_ba_fused import _exp_se3

    Re, te = _exp_se3(dx)
    Rn = [None] * 9
    for i in range(3):
        for j in range(3):
            acc = 0.0 * dx[0]
            for q in range(3):
                acc = acc + R[3 * i + q] * Re[3 * q + j]
            Rn[3 * i + j] = acc
    tn = [
        R[3 * i + 0] * te[0] + R[3 * i + 1] * te[1] + R[3 * i + 2] * te[2]
        + t[i]
        for i in range(3)
    ]
    return Rn, tn


def _kernel(n_levels: int, sp_iter: int, sp_eps: float,
            a2d_iter: int, a2d_eps: float, a2d_max_err: float,
            ba_rounds: int, ba_iters: int, ba_eps: float, chi2_th: float,
            wins_sp_ref, refp_sp_ref, jl_sp_ref, meta_sp_ref,
            wins_a2_ref, ref_a2_ref, jx_a2_ref, jy_a2_ref, hinv_a2_ref,
            meta_a2_ref, meta_po_ref, glob_ref,
            out_glob_ref, out_pts_ref):
    from jax.experimental.pallas import tpu as pltpu

    wins_sp = wins_sp_ref[...]
    refp_sp = refp_sp_ref[...]
    jl_sp = jl_sp_ref[...]
    meta_sp = meta_sp_ref[...]
    wins_a2 = wins_a2_ref[...]
    ref_a2 = ref_a2_ref[...]
    jx_a2 = jx_a2_ref[...]
    jy_a2 = jy_a2_ref[...]
    hinv = hinv_a2_ref[...]
    meta_a2 = meta_a2_ref[...]
    meta_po = meta_po_ref[...]              # [8, Np2]
    glob = glob_ref[...]
    dt = wins_sp.dtype
    N2 = wins_a2.shape[0]
    Np2 = meta_po.shape[1]

    def g(k):
        return glob[:, k:k + 1]

    # ---------------- stage 1: sparse-direct alignment ----------------
    prx = meta_sp[:, 0:1]
    pry = meta_sp[:, 1:2]
    prz = meta_sp[:, 2:3]
    svis = meta_sp[:, 3:4]
    fx0, fy0, cx0, cy0 = g(12), g(13), g(14), g(15)
    k1, k2, p1, p2 = g(16), g(17), g(18), g(19)
    margin = float(PATCH // 2 + 2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
    valid = (((lane // CWIN) < PATCH) & ((lane % CWIN) < PATCH)).astype(dt)

    def s2(x):
        return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1,
                       keepdims=True)

    R = [g(i) for i in range(9)]
    t = [g(9 + i) for i in range(3)]
    chi2_sp = g(0) * 0.0

    for li in range(n_levels - 1, -1, -1):
        scale = 1.0 / float(2 ** li)
        fxs, fys = fx0 * scale, fy0 * scale
        cxs, cys = cx0 * scale, cy0 * scale
        Hl = g(20 + 2 * li)
        Wl = g(21 + 2 * li)
        wins = wins_sp[:, li * FLAT:(li + 1) * FLAT]
        refp = refp_sp[:, li * FLAT:(li + 1) * FLAT]
        J = [
            jl_sp[:, (li * 6 + a) * FLAT:(li * 6 + a + 1) * FLAT]
            for a in range(6)
        ]
        ox = meta_sp[:, 4 + 2 * li:5 + 2 * li]
        oy = meta_sp[:, 5 + 2 * li:6 + 2 * li]
        lvis = meta_sp[:, 10 + li:11 + li]

        def project(R, t):
            x = R[0] * prx + R[1] * pry + R[2] * prz + t[0]
            y = R[3] * prx + R[4] * pry + R[5] * prz + t[1]
            z = R[6] * prx + R[7] * pry + R[8] * prz + t[2]
            zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            xn = x / zs
            yn = y / zs
            r2 = xn * xn + yn * yn
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
            yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
            u = fxs * xd + cxs
            v = fys * yd + cys
            okc = (
                (svis > 0.5) & (lvis > 0.5) & (z > 1e-3)
                & (u >= margin) & (u < Wl - 1.0 - margin)
                & (v >= margin) & (v < Hl - 1.0 - margin)
            )
            return u, v, okc

        def residual_pass(R, t):
            u, v, okc = project(R, t)
            fxw = u - _HALF - ox
            fyw = v - _HALF - oy
            inwin = (
                (fxw >= 0.0) & (fxw <= CWIN - SUP)
                & (fyw >= 0.0) & (fyw <= CWIN - SUP)
            )
            fxw = jnp.clip(fxw, 0.0, float(CWIN - SUP))
            fyw = jnp.clip(fyw, 0.0, float(CWIN - SUP))
            x0 = jnp.floor(fxw)
            y0 = jnp.floor(fyw)
            ax = fxw - x0
            ay = fyw - y0
            s = y0.astype(jnp.int32) * CWIN + x0.astype(jnp.int32)
            w = wins
            for bb in range(_SMAX_BITS):
                bit = ((s >> bb) & 1).astype(dt)
                w = bit * pltpu.roll(w, FLAT - (1 << bb), 1) + (1.0 - bit) * w
            cur = (
                (1 - ax) * (1 - ay) * w
                + ax * (1 - ay) * pltpu.roll(w, FLAT - 1, 1)
                + (1 - ax) * ay * pltpu.roll(w, FLAT - CWIN, 1)
                + ax * ay * pltpu.roll(w, FLAT - (CWIN + 1), 1)
            )
            r = (cur - refp) * valid
            wgt = (okc & inwin).astype(dt)
            rw = r * wgt
            bv = [-s2(J[a] * rw) for a in range(6)]
            denom = jnp.maximum(s2(wgt * valid), 1.0)
            chi2 = s2(rw * r) / denom
            return bv, chi2

        u0, v0, okc0 = project(R, t)
        fxw0 = u0 - _HALF - ox
        fyw0 = v0 - _HALF - oy
        inwin0 = (
            (fxw0 >= 0.0) & (fxw0 <= CWIN - SUP)
            & (fyw0 >= 0.0) & (fyw0 <= CWIN - SUP)
        )
        w0 = (okc0 & inwin0).astype(dt)
        Jw = [Ja * w0 for Ja in J]
        Hab = []
        for a in range(6):
            for b in range(a, 6):
                Hab.append(s2(Jw[a] * J[b]))
        L = _chol6(Hab)

        bv, chi2_sp = residual_pass(R, t)
        it0 = chi2_sp * 0.0

        def cond(carry):
            it, stop = carry[0], carry[1]
            return (stop[0, 0] < 0.5) & (it[0, 0] < float(sp_iter))

        def body(carry, L=L, residual_pass=residual_pass):
            it, stop = carry[0], carry[1]
            R = list(carry[2:11])
            t = list(carry[11:14])
            bv = list(carry[14:20])
            chi2 = carry[20]
            one = chi2 * 0.0 + 1.0
            dx = _subst6(L, bv)
            amax = jnp.abs(dx[0])
            for i in range(1, 6):
                amax = jnp.maximum(amax, jnp.abs(dx[i]))
            conv = jnp.where(amax < sp_eps, 1.0, 0.0)
            R_try, t_try = _retract_right(R, t, dx)
            bn, chi2n = residual_pass(R_try, t_try)
            worse = jnp.where(chi2n > chi2, 1.0, 0.0)
            upd = one - worse
            R = [upd * n_ + worse * o_ for n_, o_ in zip(R_try, R)]
            t = [upd * n_ + worse * o_ for n_, o_ in zip(t_try, t)]
            bv = [upd * n_ + worse * o_ for n_, o_ in zip(bn, bv)]
            chi2 = upd * chi2n + worse * chi2
            stop = jnp.maximum(worse, conv)
            return tuple([it + 1.0, stop] + R + t + bv + [chi2])

        carry = tuple([it0, it0 * 0.0] + R + t + bv + [chi2_sp])
        carry = jax.lax.while_loop(cond, body, carry)
        R = list(carry[2:11])
        t = list(carry[11:14])
        chi2_sp = carry[20]

    # ---------------- stage 2: align2d against the local map ----------
    a2x = meta_a2[:, 0:1]                   # ref-frame point x (a2d set)
    a2y = meta_a2[:, 1:2]
    a2z = meta_a2[:, 2:3]
    a2ox = meta_a2[:, 3:4]
    a2oy = meta_a2[:, 4:5]
    a2msk = meta_a2[:, 5:6]
    Hl0 = g(20)
    Wl0 = g(21)

    # Landmark projections at the sparse-result pose = align2d inits.
    xs = R[0] * a2x + R[1] * a2y + R[2] * a2z + t[0]
    ys = R[3] * a2x + R[4] * a2y + R[5] * a2z + t[1]
    zs_ = R[6] * a2x + R[7] * a2y + R[8] * a2z + t[2]
    zsafe = jnp.where(jnp.abs(zs_) < 1e-9, 1e-9, zs_)
    xn = xs / zsafe
    yn = ys / zsafe
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    xinit = fx0 * xd + cx0
    yinit = fy0 * yd + cy0
    inb0 = (
        (zs_ > 0.05)
        & (xinit >= A2D_PATCH / 2 + 2)
        & (xinit < Wl0 - 1.0 - (A2D_PATCH / 2 + 2))
        & (yinit >= A2D_PATCH / 2 + 2)
        & (yinit < Hl0 - 1.0 - (A2D_PATCH / 2 + 2))
    )

    a2lane = jax.lax.broadcasted_iota(jnp.int32, (1, A2D_FLAT), 1)
    a2valid = (((a2lane // CACHE_WIN) < A2D_PATCH)
               & ((a2lane % CACHE_WIN) < A2D_PATCH)).astype(dt)
    a2half = (A2D_PATCH - 1) / 2.0
    a2lim = float(CACHE_WIN - A2D_PATCH - 1)
    npix = float(A2D_PATCH * A2D_PATCH)

    def a2_sample(x, y):
        fx = jnp.clip(x - a2half - a2ox, 0.0, a2lim)
        fy = jnp.clip(y - a2half - a2oy, 0.0, a2lim)
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = fx - x0
        ay = fy - y0
        s = y0.astype(jnp.int32) * CACHE_WIN + x0.astype(jnp.int32)
        w = wins_a2
        for b in range(_A2D_BITS):
            bit = ((s >> b) & 1).astype(dt)
            w = bit * pltpu.roll(w, A2D_FLAT - (1 << b), 1) + (1.0 - bit) * w
        cur = (
            (1 - ax) * (1 - ay) * w
            + ax * (1 - ay) * pltpu.roll(w, A2D_FLAT - 1, 1)
            + (1 - ax) * ay * pltpu.roll(w, A2D_FLAT - CACHE_WIN, 1)
            + ax * ay * pltpu.roll(w, A2D_FLAT - (CACHE_WIN + 1), 1)
        )
        return cur

    ax_ = xinit
    ay_ = yinit
    amean = jnp.zeros((N2, 1), dt)
    afro = jnp.zeros((N2, 1), dt)
    for _ in range(a2d_iter):
        cur = a2_sample(ax_, ay_)
        r = (cur - ref_a2 + amean) * a2valid
        gx = jnp.sum(r * jx_a2, axis=1, keepdims=True)
        gy = jnp.sum(r * jy_a2, axis=1, keepdims=True)
        gm = jnp.sum(r, axis=1, keepdims=True)
        du = hinv[:, 0:1] * gx + hinv[:, 1:2] * gy + hinv[:, 2:3] * gm
        dv = hinv[:, 3:4] * gx + hinv[:, 4:5] * gy + hinv[:, 5:6] * gm
        dm = hinv[:, 6:7] * gx + hinv[:, 7:8] * gy + hinv[:, 8:9] * gm
        small = jnp.where(du * du + dv * dv < a2d_eps * a2d_eps, 1.0, 0.0
                          ).astype(dt)
        act = (1.0 - small) * (1.0 - afro)
        ax_ = ax_ - act * du
        ay_ = ay_ - act * dv
        amean = amean - act * dm
        afro = jnp.maximum(afro, small)
    cur = a2_sample(ax_, ay_)
    aerr = jnp.sum(jnp.abs((cur - ref_a2 + amean) * a2valid), axis=1,
                   keepdims=True) / npix

    drift2 = (ax_ - xinit) ** 2 + (ay_ - yinit) ** 2
    max_drift = float(min(A2D_PATCH * 2.0, float(CACHE_SLACK)))
    inb1 = (
        (ax_ >= A2D_PATCH / 2 + 1)
        & (ax_ < Wl0 - 1.0 - (A2D_PATCH / 2 + 1))
        & (ay_ >= A2D_PATCH / 2 + 1)
        & (ay_ < Hl0 - 1.0 - (A2D_PATCH / 2 + 1))
    )
    aconv = (
        inb0 & inb1 & (aerr < a2d_max_err)
        & (drift2 < max_drift * max_drift)
        & (a2msk > 0.5)
    ).astype(dt)                                         # [N2, 1]

    # ---------------- stage 3: pose-only BA ---------------------------
    # Transpose align2d outputs to lane-major rows via MXU identity
    # contractions: out[k, j] = sum_i col[i, k] * E[i, j].
    Ecol = (jax.lax.broadcasted_iota(jnp.int32, (N2, Np2), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (N2, Np2), 1)
            ).astype(dt)

    def to_row(col):
        return jax.lax.dot_general(
            col, Ecol, (((0,), (0,)), ((), ())),
            preferred_element_type=dt,
        )                                                # [1, Np2]

    U = to_row(ax_)
    V = to_row(ay_)
    bamsk = to_row(aconv) * meta_po[3:4, :]
    X = meta_po[0:1, :]
    Y = meta_po[1:2, :]
    Z = meta_po[2:3, :]

    def r2_(x):
        return jnp.sum(x, axis=1, keepdims=True)         # [1, 1]

    def ba_reproj(R, t):
        x = R[0] * X + R[1] * Y + R[2] * Z + t[0]
        y = R[3] * X + R[4] * Y + R[5] * Z + t[1]
        z = R[6] * X + R[7] * Y + R[8] * Z + t[2]
        bvalid = bamsk * jnp.where(z > MIN_DEPTH, 1.0, 0.0).astype(dt)
        zsb = jnp.maximum(z, MIN_DEPTH)
        zi = 1.0 / zsb
        zi2 = zi * zi
        ru = fx0 * x * zi + cx0 - U
        rv = fy0 * y * zi + cy0 - V
        Ju = [fx0 * zi, 0.0 * zi, -fx0 * x * zi2,
              -fx0 * x * y * zi2, fx0 * (1.0 + x * x * zi2), -fx0 * y * zi]
        Jv = [0.0 * zi, fy0 * zi, -fy0 * y * zi2,
              -fy0 * (1.0 + y * y * zi2), fy0 * x * y * zi2, fy0 * x * zi]
        return ru, rv, Ju, Jv, bvalid

    def ba_normal_eq(R, t, w_frozen):
        ru, rv, Ju, Jv, bvalid = ba_reproj(R, t)
        w = w_frozen * bvalid
        Hab = []
        for a in range(6):
            wJu = w * Ju[a]
            wJv = w * Jv[a]
            for b in range(a, 6):
                Hab.append(r2_(wJu * Ju[b] + wJv * Jv[b]))
        bv = [-r2_(w * (Ju[a] * ru + Jv[a] * rv)) for a in range(6)]
        chi2 = r2_(w * (ru * ru + rv * rv))
        return Hab, bv, chi2

    def med_bisect(vals, vmask, half_cnt):
        """Masked median via bisection on [1, Np2] rows."""
        lo = half_cnt * 0.0
        hi = jnp.max(vals * vmask, axis=1, keepdims=True)
        for _ in range(12):
            mid = 0.5 * (lo + hi)
            cnt = r2_(vmask * jnp.where(vals <= mid, 1.0, 0.0))
            ge = jnp.where(cnt >= half_cnt, 1.0, 0.0)
            hi = ge * mid + (1.0 - ge) * hi
            lo = ge * lo + (1.0 - ge) * mid
        return 0.5 * (lo + hi)

    huber_k = jnp.sqrt(jnp.asarray(chi2_th, dt))
    ru, rv, _, _, bvalid = ba_reproj(R, t)
    inlier = bamsk
    chi2_ba = chi2_sp * 0.0
    for round_i in range(ba_rounds):
        valid0 = bvalid * inlier
        rn = jnp.sqrt(ru * ru + rv * rv)
        if round_i == 0:
            nv = r2_(valid0)
            half_cnt = 0.5 * nv
            med = med_bisect(rn, valid0, half_cnt)
            mad = med_bisect(jnp.abs(rn - med), valid0, half_cnt)
            sigma0 = jnp.maximum(1.4826 * mad, 1.0)
            xw = rn / (sigma0 * TUKEY_B)
            wt = (1.0 - xw * xw)
            w_frozen = jnp.where(jnp.abs(xw) < 1.0, wt * wt, 0.0 * wt)
        elif round_i < ba_rounds - 1:
            w_frozen = jnp.where(
                rn <= huber_k, rn * 0.0 + 1.0,
                huber_k / jnp.maximum(rn, 1e-12),
            )
        else:
            w_frozen = rn * 0.0 + 1.0
        w_frozen = w_frozen * valid0

        Hab, bv, chi2 = ba_normal_eq(R, t, w_frozen)

        def cond(carry):
            it, stop = carry[0], carry[1]
            return (stop[0, 0] < 0.5) & (it[0, 0] < float(ba_iters))

        def body(carry, w_frozen=w_frozen):
            it, stop = carry[0], carry[1]
            R = list(carry[2:11])
            t = list(carry[11:14])
            Hab = list(carry[14:35])
            bv = list(carry[35:41])
            chi2 = carry[41]
            one = chi2 * 0.0 + 1.0
            dx = _solve6(Hab, bv)
            amax = jnp.abs(dx[0])
            for i in range(1, 6):
                amax = jnp.maximum(amax, jnp.abs(dx[i]))
            conv = jnp.where(amax < ba_eps, 1.0, 0.0)
            R_try, t_try = _retract_left(R, t, dx)
            Hn, bn, chi2n = ba_normal_eq(R_try, t_try, w_frozen)
            worse = jnp.where(chi2n > chi2, 1.0, 0.0)
            upd = (one - stop) * (one - worse)
            R = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(R_try, R)]
            t = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(t_try, t)]
            Hab = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(Hn, Hab)]
            bv = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(bn, bv)]
            chi2 = upd * chi2n + (one - upd) * chi2
            stop = jnp.maximum(stop, jnp.maximum(worse, conv))
            return tuple([it + 1.0, stop] + R + t + Hab + bv + [chi2])

        it0 = chi2 * 0.0
        carry = tuple([it0, it0 * 0.0] + R + t + Hab + bv + [chi2])
        carry = jax.lax.while_loop(cond, body, carry)
        R = list(carry[2:11])
        t = list(carry[11:14])
        chi2_ba = carry[41]

        ru, rv, _, _, bvalid = ba_reproj(R, t)
        chi2_per = ru * ru + rv * rv
        new_inlier = bvalid * jnp.where(chi2_per < chi2_th, 1.0, 0.0)
        any_new = jnp.where(r2_(new_inlier) > 0.5, 1.0, 0.0)
        inlier = any_new * new_inlier + (1.0 - any_new) * inlier

    n_inl = r2_(inlier)

    # ---------------- outputs ----------------------------------------
    vals = R + t + [chi2_sp, chi2_ba, n_inl]             # 15 x [1, 1]
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    acc = jnp.zeros((1, 64), dt)
    for k, v in enumerate(vals):
        acc = acc + v * (olane == k).astype(dt)
    out_glob_ref[...] = acc

    # inlier row back to a column: col[i, k] = sum_j E[i, j] inl[k, j].
    inl_col = jax.lax.dot_general(
        Ecol, inlier, (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
    )                                                    # [N2, 1]
    out_pts_ref[...] = jnp.concatenate(
        [ax_, ay_, aerr, aconv, inl_col, jnp.zeros((N2, 3), dt)], axis=1)


def track_step_fused(
    cur_pyr,
    level_refs,
    p_ref_sp: jnp.ndarray,
    a2d_prep,
    p_ref_a2: jnp.ndarray,
    a2_mask: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cam,
    distorted: bool,
    max_level: int,
    sp_iter: int = 12,
    a2d_iter: int = 10,
    a2d_max_err: float = 30.0,
    ba_rounds: int = 4,
    ba_iters: int = 10,
    chi2_th: float = 5.991,
):
    """One whole tracking step in one kernel.

    Args:
      cur_pyr: current-frame pyramid (level 0 full-res).
      level_refs: LevelRef list (lanes packed) for the sparse stage.
      p_ref_sp: [N1, 3] sparse-stage points in the ref camera frame.
      a2d_prep: Align2DPrep for the map-patch stage.
      p_ref_a2: [N2, 3] map landmarks in the ref camera frame.
      a2_mask: [N2] landmark validity.
      R0, t0: init T_cur_ref.
    Returns (R, t, chi2_sparse, chi2_ba, n_inliers,
             a2d_xy [N2, 2], a2d_err [N2], a2d_converged [N2] bool,
             ba_inlier [N2] bool).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = cur_pyr[0].dtype
    N1 = p_ref_sp.shape[0]
    N2 = p_ref_a2.shape[0]
    Np2 = -(-N2 // 128) * 128
    n_levels = max_level + 1

    # Sparse windows at the frame-init pose (as sparse_align_mega).
    pc0 = p_ref_sp @ R0.T + t0
    px0_l0 = jnp.nan_to_num(cam.camera_to_pixel(pc0, distorted=distorted))
    wins, oxs, oys, lvis = [], [], [], []
    for li in range(n_levels):
        img = cur_pyr[li]
        Hl, Wl = img.shape
        px0 = px0_l0 / (2.0 ** li)
        ox = jnp.clip(jnp.floor(px0[:, 0] - _HALF) - SLACK, 0, Wl - CWIN
                      ).astype(jnp.int32)
        oy = jnp.clip(jnp.floor(px0[:, 1] - _HALF) - SLACK, 0, Hl - CWIN
                      ).astype(jnp.int32)
        wins.append(gather_windows(img, ox, oy, CWIN).reshape(N1, FLAT))
        oxs.append(ox.astype(dt))
        oys.append(oy.astype(dt))
        lvis.append(level_refs[li].vis.astype(dt))
    wins_sp = jnp.concatenate(wins, axis=1)
    refp_sp = jnp.concatenate(
        [level_refs[li].refp_lanes.astype(dt) for li in range(n_levels)],
        axis=1)
    jl_sp = jnp.concatenate(
        [level_refs[li].jlanes.astype(dt) for li in range(n_levels)],
        axis=1)
    meta_cols = [p_ref_sp[:, 0], p_ref_sp[:, 1], p_ref_sp[:, 2],
                 jnp.ones(N1, dt)]
    for li in range(n_levels):
        meta_cols += [oxs[li], oys[li]]
    while len(meta_cols) < 10:
        meta_cols.append(jnp.zeros(N1, dt))
    meta_cols += lvis
    meta_sp = jnp.stack(meta_cols, axis=1)
    meta_sp = jnp.pad(meta_sp, ((0, 0), (0, 16 - meta_sp.shape[1])))

    # Align2d windows at the frame-init projections of the MAP points.
    pc0_a2 = p_ref_a2 @ R0.T + t0
    pxa0 = jnp.nan_to_num(cam.camera_to_pixel(pc0_a2, distorted=distorted))
    H0i, W0i = cur_pyr[0].shape
    a2half = (A2D_PATCH - 1) / 2.0
    a2ox = jnp.clip(jnp.floor(pxa0[:, 0] - a2half) - CACHE_SLACK,
                    0, W0i - CACHE_WIN).astype(jnp.int32)
    a2oy = jnp.clip(jnp.floor(pxa0[:, 1] - a2half) - CACHE_SLACK,
                    0, H0i - CACHE_WIN).astype(jnp.int32)
    wins_a2 = gather_windows(cur_pyr[0], a2ox, a2oy, CACHE_WIN
                             ).reshape(N2, A2D_FLAT)
    meta_a2 = jnp.stack(
        [p_ref_a2[:, 0], p_ref_a2[:, 1], p_ref_a2[:, 2],
         a2ox.astype(dt), a2oy.astype(dt), a2_mask.astype(dt)], axis=1)
    meta_a2 = jnp.pad(meta_a2, ((0, 0), (0, 2)))

    meta_po = jnp.stack([
        p_ref_a2[:, 0], p_ref_a2[:, 1], p_ref_a2[:, 2],
        a2_mask.astype(dt),
    ], axis=0)
    meta_po = jnp.pad(meta_po, ((0, 4), (0, Np2 - N2)))

    if distorted:
        kk = jnp.stack([cam.k1, cam.k2, cam.p1, cam.p2])
    else:
        kk = jnp.zeros(4, dt)
    dims = []
    for li in range(n_levels):
        dims += list(cur_pyr[li].shape)
    dims += [0.0] * (12 - len(dims))
    glob = jnp.concatenate([
        R0.reshape(9), t0.reshape(3),
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]),
        kk,
        jnp.asarray(dims, dt),
    ]).reshape(1, 32).astype(dt)

    out_glob, out_pts = pl.pallas_call(
        partial(_kernel, n_levels, sp_iter, 1e-4,
                a2d_iter, 0.03, a2d_max_err,
                ba_rounds, ba_iters, 1e-4, chi2_th),
        out_shape=(
            jax.ShapeDtypeStruct((1, 64), dt),
            jax.ShapeDtypeStruct((N2, 8), dt),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(wins_sp, refp_sp, jl_sp, meta_sp,
      wins_a2, a2d_prep.ref.astype(dt), a2d_prep.jx.astype(dt),
      a2d_prep.jy.astype(dt), a2d_prep.hinv.astype(dt), meta_a2,
      meta_po, glob)

    R = out_glob[0, 0:9].reshape(3, 3)
    t = out_glob[0, 9:12]
    chi2_sp = out_glob[0, 12]
    chi2_ba = out_glob[0, 13]
    n_inl = out_glob[0, 14]
    xy = out_pts[:, 0:2]
    err = out_pts[:, 2]
    conv = out_pts[:, 3] > 0.5
    inlier = out_pts[:, 4] > 0.5
    return R, t, chi2_sp, chi2_ba, n_inl, xy, err, conv, inlier
