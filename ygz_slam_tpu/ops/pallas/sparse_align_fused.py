"""Fully-fused sparse-direct image alignment: one pyramid level's
ENTIRE Gauss-Newton optimization as ONE Pallas TPU kernel.

The XLA formulation (ops/sparse_align._level_align) runs each GN
iteration of SparseImgAlign (src/Algorithm/SparseImageAlign.cpp:124-238)
as a chain of ~10 device kernels inside a `lax.while_loop`; at 200
points the launch/dependency latency of that chain — not the math —
dominates (measured ~25 us per iteration, the same pathology the fused
align2d kernel removed).  Here a level's whole optimization — per-point
4x4 patch sampling from cached VMEM windows, photometric residuals,
the 6x6 normal equations, an unrolled Cholesky solve, the SE(3)
retraction T <- T * exp(dx), and the rollback-on-chi2-increase /
convergence gating of solvers.nlls.gauss_newton — runs inside a single
kernel, so an iteration costs vector ops instead of kernel launches.

Layout and sampling follow ops/pallas/align2d_fused.py:

- Each point owns a CWIN x CWIN (16x16) current-image window fetched
  once (align2d_kernel.gather_windows), flattened to [N, 256] lanes.
  The 5x5 bilinear support of the 4x4 patch at integer offset (y0, x0)
  is reached by a lane-roll of s = y0*16 + x0, realized as 8 bit-masked
  static power-of-two rolls (Mosaic rejects per-point dynamic slices,
  and pltpu.roll miscompiles dynamic shifts).  Points whose projection
  drifts outside the window are MASKED out of that iteration's normal
  equations (not clamped — clamping would bias the pose).  Window
  slack is ~5 px per level; the caller re-centers windows at each
  level's init pose, so the slack only needs to absorb that level's
  own correction.
- Reference patches and Jacobians arrive pre-packed in the same padded
  lane layout (entry (r, c) of the 4x4 patch at lane 16r + c), hoisted
  per keyframe by sparse_align.prepare_reference.
- GLOBAL state (R, t, H, b, chi2, stop flag) lives in [1, 1] arrays —
  every scalar op is a one-tile vector op, avoiding scalar-core
  transcendentals.  exp(dx) uses Taylor series in theta^2 for
  sin/cos-derived coefficients (sqrt-free Rodrigues; a trust-region
  clamp keeps theta inside the series' accuracy radius — steps that
  large are garbage and would be rolled back anyway).
- GN semantics mirror solvers.nlls.gauss_newton exactly: one
  compute() per iteration at the trial point, rollback + stop when
  chi2 increases, stop when max|dx| < eps.

Reference: SparseImgAlign (src/Algorithm/SparseImageAlign.cpp:21-238)
driven by NLLSSolver::optimizeGaussNewton (NLSSolver_impl.hpp:16-89).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .align2d_kernel import gather_windows

CWIN = 16                      # cached window side
FLAT = CWIN * CWIN             # 256 flattened lanes
PATCH = 4                      # 4x4 patch (SparseImageAlign.h)
SUP = PATCH + 1                # 5x5 bilinear support
_SMAX_BITS = 8                 # max roll (16-5)*16 + (16-5) = 187 < 256
# Window origin sits SLACK px up-left of the support start, so the
# support can move ~[-SLACK, +SLACK] px before masking kicks in.
SLACK = (CWIN - SUP) // 2      # 5 px at the level's scale
_HALF = (PATCH - 1) / 2.0      # 1.5: patch grid arange(4) - 1.5


def pack_patch_lanes(vals: jnp.ndarray) -> jnp.ndarray:
    """[N, 4, 4] (or [N, 16]) -> [N, FLAT] with (r, c) at lane 16r+c."""
    N = vals.shape[0]
    v = vals.reshape(N, PATCH, PATCH)
    rows = jnp.concatenate(
        [v, jnp.zeros((N, PATCH, CWIN - PATCH), v.dtype)], axis=2
    ).reshape(N, PATCH * CWIN)
    return jnp.concatenate(
        [rows, jnp.zeros((N, FLAT - PATCH * CWIN), v.dtype)], axis=1
    )


def pack_jacobian_lanes(J: jnp.ndarray) -> jnp.ndarray:
    """[N, 16, 6] inverse-compositional Jacobians -> [N, 6*FLAT]
    (column a of J at lanes [a*FLAT, (a+1)*FLAT) in patch layout)."""
    cols = [pack_patch_lanes(J[:, :, a]) for a in range(6)]
    return jnp.concatenate(cols, axis=1)


def _kernel(n_iter: int, eps: float,
            wins_ref, refp_ref, jlanes_ref, meta_ref, glob_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu

    wins = wins_ref[...]                    # [N, FLAT]
    refp = refp_ref[...]                    # [N, FLAT] (zeros off-patch)
    jl = jlanes_ref[...]                    # [N, 6*FLAT]
    meta = meta_ref[...]                    # [N, 8]
    glob = glob_ref[...]                    # [1, 32]
    dt = wins.dtype

    def g(k):                               # [1, 1] global scalar
        return glob[:, k:k + 1]

    J = [jl[:, a * FLAT:(a + 1) * FLAT] for a in range(6)]
    prx = meta[:, 0:1]                      # [N, 1]
    pry = meta[:, 1:2]
    prz = meta[:, 2:3]
    ox = meta[:, 3:4]
    oy = meta[:, 4:5]
    vis = meta[:, 5:6]

    fxs, fys, cxs, cys = g(12), g(13), g(14), g(15)
    k1, k2, p1, p2 = g(16), g(17), g(18), g(19)
    Hh, Ww = g(20), g(21)
    margin = float(PATCH // 2 + 2)          # in_bounds margin, PATCH_HALF+2

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
    lr = lane // CWIN
    lc = lane % CWIN
    valid = ((lr < PATCH) & (lc < PATCH)).astype(dt)      # [1, FLAT]

    def s2(x):                              # full reduce -> [1, 1]
        return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1,
                       keepdims=True)

    def compute(R, t):
        """Residual pass at pose (R [9 x [1,1]], t [3 x [1,1]]);
        returns (Hab 21, bv 6, chi2) — the normal equations of
        computeResiduals (SparseImageAlign.cpp:124-223)."""
        x = R[0] * prx + R[1] * pry + R[2] * prz + t[0]   # [N, 1]
        y = R[3] * prx + R[4] * pry + R[5] * prz + t[1]
        z = R[6] * prx + R[7] * pry + R[8] * prz + t[2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        xn = x / zs
        yn = y / zs
        # Radial-tangential distortion (zero coeffs = pinhole).
        r2 = xn * xn + yn * yn
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
        u = fxs * xd + cxs                                 # level coords
        v = fys * yd + cys
        okc = (
            (vis > 0.5) & (z > 1e-3)
            & (u >= margin) & (u < Ww - 1.0 - margin)
            & (v >= margin) & (v < Hh - 1.0 - margin)
        )
        # Window-relative support position.
        fx = u - _HALF - ox
        fy = v - _HALF - oy
        inwin = (
            (fx >= 0.0) & (fx <= CWIN - SUP) & (fy >= 0.0) & (fy <= CWIN - SUP)
        )
        fx = jnp.clip(fx, 0.0, float(CWIN - SUP))
        fy = jnp.clip(fy, 0.0, float(CWIN - SUP))
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = fx - x0
        ay = fy - y0
        s = y0.astype(jnp.int32) * CWIN + x0.astype(jnp.int32)  # [N, 1]
        w = wins
        # Left-roll by k == right-roll by FLAT - k (pltpu.roll wants
        # non-negative static shifts; dynamic shifts miscompile).
        for bb in range(_SMAX_BITS):
            bit = ((s >> bb) & 1).astype(dt)               # [N, 1]
            w = bit * pltpu.roll(w, FLAT - (1 << bb), 1) + (1.0 - bit) * w
        cur = (
            (1 - ax) * (1 - ay) * w
            + ax * (1 - ay) * pltpu.roll(w, FLAT - 1, 1)
            + (1 - ax) * ay * pltpu.roll(w, FLAT - CWIN, 1)
            + ax * ay * pltpu.roll(w, FLAT - (CWIN + 1), 1)
        )
        r = (cur - refp) * valid                           # [N, FLAT]
        wgt = (okc & inwin).astype(dt)                     # [N, 1]
        rw = r * wgt
        Jw = [Ja * wgt for Ja in J]
        Hab = []
        for a in range(6):
            for b in range(a, 6):
                Hab.append(s2(Jw[a] * J[b]))
        bv = [-s2(Jw[a] * r) for a in range(6)]
        denom = jnp.maximum(s2(wgt * valid), 1.0)
        chi2 = s2(rw * r) / denom
        return Hab, bv, chi2

    def solve6(Hab, bv):
        """H dx = b via unrolled Cholesky on [1,1] entries (the 6x6
        LDLT of SparseImageAlign.cpp:225-231; damping + non-finite
        guard match solvers.nlls._solve_spd)."""
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

    def retract(R, t, dx):
        """T <- T * exp(dx), dx = (rho, phi) — SE3 exp via sqrt-free
        Taylor Rodrigues (series in theta^2; trust-region clamp keeps
        theta within the series' accuracy radius)."""
        t2 = dx[3] * dx[3] + dx[4] * dx[4] + dx[5] * dx[5]
        theta = jnp.sqrt(jnp.maximum(t2, 1e-24))
        sc = jnp.minimum(1.0, 1.2 / theta)
        dxc = [d * sc for d in dx]
        tt = t2 * sc * sc
        a = 1.0 - tt / 6.0 * (1.0 - tt / 20.0 * (1.0 - tt / 42.0 * (1.0 - tt / 72.0)))
        b = 0.5 * (1.0 - tt / 12.0 * (1.0 - tt / 30.0 * (1.0 - tt / 56.0 * (1.0 - tt / 90.0))))
        c = (1.0 / 6.0) * (1.0 - tt / 20.0 * (1.0 - tt / 42.0 * (1.0 - tt / 72.0 * (1.0 - tt / 110.0))))
        wx, wy, wz = dxc[3], dxc[4], dxc[5]
        # W and W^2 entries.
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
        Rn = [None] * 9
        for i in range(3):
            for j in range(3):
                acc = 0.0 * wx
                for q in range(3):
                    acc = acc + R[3 * i + q] * Re[3 * q + j]
                Rn[3 * i + j] = acc
        tn = [
            R[3 * i + 0] * te[0] + R[3 * i + 1] * te[1] + R[3 * i + 2] * te[2]
            + t[i]
            for i in range(3)
        ]
        return Rn, tn

    R = [g(i) for i in range(9)]
    t = [g(9 + i) for i in range(3)]
    Hab, bv, chi2 = compute(R, t)
    one = chi2 * 0.0 + 1.0
    stop = chi2 * 0.0
    conv_out = chi2 * 0.0
    for _ in range(n_iter):
        dx = solve6(Hab, bv)
        amax = jnp.abs(dx[0])
        for i in range(1, 6):
            amax = jnp.maximum(amax, jnp.abs(dx[i]))
        conv = jnp.where(amax < eps, 1.0, 0.0)
        R_try, t_try = retract(R, t, dx)
        Hn, bn, chi2n = compute(R_try, t_try)
        worse = jnp.where(chi2n > chi2, 1.0, 0.0)
        upd = (one - stop) * (one - worse)
        R = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(R_try, R)]
        t = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(t_try, t)]
        Hab = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(Hn, Hab)]
        bv = [upd * n_ + (one - upd) * o_ for n_, o_ in zip(bn, bv)]
        chi2 = upd * chi2n + (one - upd) * chi2
        conv_out = jnp.maximum(conv_out, (one - stop) * conv)
        stop = jnp.maximum(stop, jnp.maximum(worse, conv))

    vals = R + t + [chi2] + Hab + [conv_out]               # 35 x [1, 1]
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    acc = jnp.zeros((1, 64), dt)
    for k, v in enumerate(vals):
        acc = acc + v * (olane == k).astype(dt)
    out_ref[...] = acc


def _kernel_v2(n_iter: int, eps: float,
               wins_ref, refp_ref, jlanes_ref, meta_ref, glob_ref, out_ref):
    """Substitution-only variant with data-dependent early exit.

    Two structural changes over _kernel:

    1. The 6x6 Hessian is FROZEN at the level's init pose and factored
       in XLA (inverse-compositional Jacobians are reference-side
       constants, so H varies only through the visibility mask, which
       barely moves within a level).  The kernel receives the Cholesky
       factor L in glob and does only forward/back substitution — the
       21 H-entry reduces (28 -> 7 lane-reduces/iteration) and the
       ~90-op in-kernel factorization disappear.  The gradient bv and
       chi2 still use the live per-iteration mask, so drifting points
       can't drag the objective; a slightly stale H only perturbs the
       step direction, which the rollback gate already polices.
    2. The GN loop is a lax.while_loop with [1, 1] f32 carries
       (vector<i1> carries fail to legalize; [1, 1] f32 ones compile
       and early-exit correctly — measured 90.9 us for 10/300
       iterations vs 676.5 us unrolled on the same toy body).  Warm
       tracking converges in 2-4 iterations; the unrolled kernel paid
       for all 12 every frame.
    """
    from jax.experimental.pallas import tpu as pltpu

    wins = wins_ref[...]                    # [N, FLAT]
    refp = refp_ref[...]                    # [N, FLAT]
    jl = jlanes_ref[...]                    # [N, 6*FLAT]
    meta = meta_ref[...]                    # [N, 8]
    glob = glob_ref[...]                    # [1, 64]
    dt = wins.dtype

    def g(k):
        return glob[:, k:k + 1]

    J = [jl[:, a * FLAT:(a + 1) * FLAT] for a in range(6)]
    prx = meta[:, 0:1]
    pry = meta[:, 1:2]
    prz = meta[:, 2:3]
    ox = meta[:, 3:4]
    oy = meta[:, 4:5]
    vis = meta[:, 5:6]

    fxs, fys, cxs, cys = g(12), g(13), g(14), g(15)
    k1, k2, p1, p2 = g(16), g(17), g(18), g(19)
    Hh, Ww = g(20), g(21)
    Lf = [g(22 + i) for i in range(21)]     # Cholesky factor, row-major
    margin = float(PATCH // 2 + 2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
    lr = lane // CWIN
    lc = lane % CWIN
    valid = ((lr < PATCH) & (lc < PATCH)).astype(dt)

    def s2(x):
        return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1,
                       keepdims=True)

    def residual_pass(R, t):
        """(bv 6, chi2) at pose (R, t) — the gradient side of
        computeResiduals (SparseImageAlign.cpp:124-223); H is frozen."""
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
            (vis > 0.5) & (z > 1e-3)
            & (u >= margin) & (u < Ww - 1.0 - margin)
            & (v >= margin) & (v < Hh - 1.0 - margin)
        )
        fx = u - _HALF - ox
        fy = v - _HALF - oy
        inwin = (
            (fx >= 0.0) & (fx <= CWIN - SUP) & (fy >= 0.0) & (fy <= CWIN - SUP)
        )
        fx = jnp.clip(fx, 0.0, float(CWIN - SUP))
        fy = jnp.clip(fy, 0.0, float(CWIN - SUP))
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = fx - x0
        ay = fy - y0
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

    def subst(bv):
        """Solve L L^T dx = bv (factor precomputed in XLA; non-finite
        guard matching solvers.nlls._solve_spd)."""
        L = [[None] * 6 for _ in range(6)]
        k = 0
        for i in range(6):
            for q in range(i + 1):
                L[i][q] = Lf[k]
                k += 1
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

    def retract(R, t, dx):
        """T <- T * exp(dx), sqrt-free Taylor Rodrigues (see _kernel)."""
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
        Rn = [None] * 9
        for i in range(3):
            for j in range(3):
                acc = 0.0 * wx
                for q in range(3):
                    acc = acc + R[3 * i + q] * Re[3 * q + j]
                Rn[3 * i + j] = acc
        tn = [
            R[3 * i + 0] * te[0] + R[3 * i + 1] * te[1] + R[3 * i + 2] * te[2]
            + t[i]
            for i in range(3)
        ]
        return Rn, tn

    R = [g(i) for i in range(9)]
    t = [g(9 + i) for i in range(3)]
    bv, chi2 = residual_pass(R, t)
    it0 = chi2 * 0.0

    def cond(carry):
        it, stop = carry[0], carry[1]
        return (stop[0, 0] < 0.5) & (it[0, 0] < float(n_iter))

    def body(carry):
        it, stop = carry[0], carry[1]
        R = list(carry[2:11])
        t = list(carry[11:14])
        bv = list(carry[14:20])
        chi2 = carry[20]
        one = chi2 * 0.0 + 1.0
        dx = subst(bv)
        amax = jnp.abs(dx[0])
        for i in range(1, 6):
            amax = jnp.maximum(amax, jnp.abs(dx[i]))
        conv = jnp.where(amax < eps, 1.0, 0.0)
        R_try, t_try = retract(R, t, dx)
        bn, chi2n = residual_pass(R_try, t_try)
        worse = jnp.where(chi2n > chi2, 1.0, 0.0)
        upd = one - worse
        R = [upd * n_ + worse * o_ for n_, o_ in zip(R_try, R)]
        t = [upd * n_ + worse * o_ for n_, o_ in zip(t_try, t)]
        bv = [upd * n_ + worse * o_ for n_, o_ in zip(bn, bv)]
        chi2 = upd * chi2n + worse * chi2
        stop = jnp.maximum(worse, conv)
        return tuple([it + 1.0, stop] + R + t + bv + [chi2])

    carry = tuple([it0, it0 * 0.0] + R + t + bv + [chi2])
    carry = jax.lax.while_loop(cond, body, carry)
    R = list(carry[2:11])
    t = list(carry[11:14])
    chi2 = carry[20]

    vals = R + t + [chi2]                   # 13 x [1, 1]
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    acc = jnp.zeros((1, 64), dt)
    for k, v in enumerate(vals):
        acc = acc + v * (olane == k).astype(dt)
    out_ref[...] = acc


def level_align_fused(
    cur_img: jnp.ndarray,
    refp_lanes: jnp.ndarray,
    jlanes: jnp.ndarray,
    p_ref: jnp.ndarray,
    vis: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cam,
    level: int,
    distorted: bool,
    n_iter: int = 12,
    eps: float = 1e-4,
):
    """One pyramid level of sparse-direct alignment, fully fused.

    Args:
      cur_img: [Hl, Wl] current image at this level.
      refp_lanes / jlanes: keyframe-constant packed reference patches
        [N, FLAT] and Jacobians [N, 6*FLAT] (pack_*_lanes).
      p_ref: [N, 3] points in the ref camera; vis: [N] bool.
      R0 [3,3], t0 [3]: init T_cur_ref.
    Returns (R [3,3], t [3], chi2 [], H [6,6]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hl, Wl = cur_img.shape
    N = p_ref.shape[0]
    dt = cur_img.dtype
    scale = 1.0 / (2.0 ** level)

    # Window origins centered on the init-pose projections (the level
    # only needs to absorb its own correction; the caller re-centers
    # at every level).
    pc0 = p_ref @ R0.T + t0
    px0 = cam.camera_to_pixel(pc0, distorted=distorted) * scale
    px0 = jnp.nan_to_num(px0)
    ox = jnp.clip(jnp.floor(px0[:, 0] - _HALF) - SLACK, 0, Wl - CWIN
                  ).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(px0[:, 1] - _HALF) - SLACK, 0, Hl - CWIN
                  ).astype(jnp.int32)
    wins = gather_windows(cur_img, ox, oy, CWIN).reshape(N, FLAT)

    meta = jnp.stack(
        [p_ref[:, 0], p_ref[:, 1], p_ref[:, 2],
         ox.astype(dt), oy.astype(dt), vis.astype(dt)], axis=1)
    meta = jnp.pad(meta, ((0, 0), (0, 2)))
    if distorted:
        kk = jnp.stack([cam.k1, cam.k2, cam.p1, cam.p2])
    else:
        kk = jnp.zeros(4, dt)
    glob = jnp.concatenate([
        R0.reshape(9), t0.reshape(3),
        jnp.stack([cam.fx * scale, cam.fy * scale,
                   cam.cx * scale, cam.cy * scale]),
        kk,
        jnp.asarray([Hl, Wl], dt),
        jnp.zeros(10, dt),
    ]).reshape(1, 32).astype(dt)

    out = pl.pallas_call(
        partial(_kernel, n_iter, eps),
        out_shape=jax.ShapeDtypeStruct((1, 64), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(wins, refp_lanes.astype(dt), jlanes.astype(dt), meta, glob)

    R = out[0, 0:9].reshape(3, 3)
    t = out[0, 9:12]
    chi2 = out[0, 12]
    hv = out[0, 13:34]
    iu, ju = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), dt).at[iu, ju].set(hv)
    H = H + jnp.triu(H, 1).T
    return R, t, chi2, H


def level_align_fused_v2(
    cur_img: jnp.ndarray,
    refp_lanes: jnp.ndarray,
    jlanes: jnp.ndarray,
    J: jnp.ndarray,
    p_ref: jnp.ndarray,
    vis: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cam,
    level: int,
    distorted: bool,
    n_iter: int = 12,
    eps: float = 1e-4,
):
    """level_align_fused with the frozen-Hessian / early-exit kernel.

    Extra arg J: [N, 16, 6] unpacked inverse-compositional Jacobians
    (LevelRef.J) — H = J^T W0 J is assembled here (one tiny einsum on
    the MXU) at the level-init visibility W0 and factored once; the
    kernel receives the Cholesky factor and the GN loop early-exits
    when converged or rolled back.  Returns (R, t, chi2, H) where H is
    the frozen init-pose Hessian (the Fisher-information output; it
    differs from v1's final-pose H only through the visibility mask).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hl, Wl = cur_img.shape
    N = p_ref.shape[0]
    dt = cur_img.dtype
    scale = 1.0 / (2.0 ** level)

    pc0 = p_ref @ R0.T + t0
    px0 = cam.camera_to_pixel(pc0, distorted=distorted) * scale
    px0 = jnp.nan_to_num(px0)
    ox = jnp.clip(jnp.floor(px0[:, 0] - _HALF) - SLACK, 0, Wl - CWIN
                  ).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(px0[:, 1] - _HALF) - SLACK, 0, Hl - CWIN
                  ).astype(jnp.int32)
    wins = gather_windows(cur_img, ox, oy, CWIN).reshape(N, FLAT)

    # Frozen normal matrix at the level-init visibility (in_bounds with
    # the kernel's margin + cheirality), factored once in XLA.
    margin = PATCH // 2 + 2
    wgt0 = (
        vis & (pc0[:, 2] > 1e-3)
        & (px0[:, 0] >= margin) & (px0[:, 0] < Wl - 1 - margin)
        & (px0[:, 1] >= margin) & (px0[:, 1] < Hl - 1 - margin)
    ).astype(dt)
    H0 = jnp.einsum("npa,n,npb->ab", J, wgt0, J)
    L = jnp.linalg.cholesky(H0 + 1e-8 * jnp.eye(6, dtype=dt))
    L = jnp.where(jnp.isfinite(L), L, jnp.eye(6, dtype=dt))
    il, jl_idx = jnp.tril_indices(6)
    Lflat = L[il, jl_idx]                       # 21, row-major lower

    meta = jnp.stack(
        [p_ref[:, 0], p_ref[:, 1], p_ref[:, 2],
         ox.astype(dt), oy.astype(dt), vis.astype(dt)], axis=1)
    meta = jnp.pad(meta, ((0, 0), (0, 2)))
    if distorted:
        kk = jnp.stack([cam.k1, cam.k2, cam.p1, cam.p2])
    else:
        kk = jnp.zeros(4, dt)
    glob = jnp.concatenate([
        R0.reshape(9), t0.reshape(3),
        jnp.stack([cam.fx * scale, cam.fy * scale,
                   cam.cx * scale, cam.cy * scale]),
        kk,
        jnp.asarray([Hl, Wl], dt),
        Lflat,
        jnp.zeros(21, dt),
    ]).reshape(1, 64).astype(dt)

    out = pl.pallas_call(
        partial(_kernel_v2, n_iter, eps),
        out_shape=jax.ShapeDtypeStruct((1, 64), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(wins, refp_lanes.astype(dt), jlanes.astype(dt), meta, glob)

    R = out[0, 0:9].reshape(3, 3)
    t = out[0, 9:12]
    chi2 = out[0, 12]
    return R, t, chi2, H0
