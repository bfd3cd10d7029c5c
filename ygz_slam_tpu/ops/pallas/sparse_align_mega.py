"""Whole sparse-direct alignment — ALL pyramid levels' Gauss-Newton —
as ONE Pallas TPU kernel.

The per-level fused kernels (sparse_align_fused) still pay, per frame:
3 kernel launches, 3 serialized window gathers (each level's gather
waits for the previous level's pose), and ~40 small XLA glue ops per
level (init-pose projection, H0 einsum + Cholesky, meta/glob packing).
Here the coarse-to-fine schedule runs inside one kernel:

- ALL levels' windows are gathered up front at the FRAME-init pose, so
  the three gathers are independent (XLA overlaps their DMA with
  preceding compute).  Window slack is SLACK px at each level's own
  scale; the coarse level absorbs most of the inter-frame motion, and
  at 30 fps envelopes (a few px/frame at level 0) the residual
  correction stays well inside the fine levels' slack.  Points whose
  support drifts out of the window are masked from that iteration's
  normal equations exactly as in the per-level kernels — a fast-motion
  frame loses points (and the caller's visibility/inlier gates see
  it), it does not read garbage.
- Each level assembles its frozen Hessian IN-KERNEL (21 lane-reduces,
  once per level, at the level-init pose and visibility — the same
  freeze as _kernel_v2) and factors it with the unrolled Cholesky;
  iterations do substitution only.
- Each level's GN loop is the early-exiting lax.while_loop of
  _kernel_v2 with [1, 1] f32 carries.

Reference: SparseImgAlign::run's level loop
(src/Algorithm/SparseImageAlign.cpp:21-50) with NLLSSolver GN
semantics (NLSSolver_impl.hpp:16-89).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .align2d_kernel import gather_windows
from .sparse_align_fused import (
    CWIN, FLAT, PATCH, SUP, _SMAX_BITS, SLACK, _HALF,
)

# Window/patch/Jacobian math in bfloat16 (would halve the
# per-iteration roll and gradient-product traffic); pose state, normal
# equations and the solve stay f32.  BLOCKED ON-CHIP: Mosaic rejects
# rolls on non-32-bit data ("Rotate with non-32-bit data"); interpret
# accuracy was fine.  Keep OFF until Mosaic supports it.
BF16_WINDOWS = False


def _mega_kernel(n_levels: int, n_iter: int, eps: float,
                 wins_ref, refp_ref, jlanes_ref, meta_ref, glob_ref,
                 out_ref):
    from jax.experimental.pallas import tpu as pltpu

    wins_all = wins_ref[...]                # [N, n_levels*FLAT]
    refp_all = refp_ref[...]                # [N, n_levels*FLAT]
    jl_all = jlanes_ref[...]                # [N, n_levels*6*FLAT]
    meta = meta_ref[...]                    # [N, 16]
    glob = glob_ref[...]                    # [1, 32]
    dt = glob.dtype                         # pose/solve dtype (f32)
    wdt = wins_all.dtype                    # window/patch math dtype

    def g(k):
        return glob[:, k:k + 1]

    prx = meta[:, 0:1]
    pry = meta[:, 1:2]
    prz = meta[:, 2:3]
    vis = meta[:, 3:4]

    fx0, fy0, cx0, cy0 = g(12), g(13), g(14), g(15)
    k1, k2, p1, p2 = g(16), g(17), g(18), g(19)
    margin = float(PATCH // 2 + 2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
    lr = lane // CWIN
    lc = lane % CWIN
    valid = ((lr < PATCH) & (lc < PATCH)).astype(wdt)

    def s2(x):
        return jnp.sum(jnp.sum(x, axis=0, keepdims=True), axis=1,
                       keepdims=True)

    def chol6(Hab):
        """Factor the 21-entry upper-tri Hessian; returns L (2-D list)
        with the damping of solvers.nlls._solve_spd."""
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

    def subst(L, bv):
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
        """T <- T * exp(dx) (sqrt-free Taylor Rodrigues, see
        sparse_align_fused._kernel)."""
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
    chi2 = g(0) * 0.0

    # Coarse-to-fine: level index li runs n_levels-1 .. 0.
    for li in range(n_levels - 1, -1, -1):
        scale = 1.0 / float(2 ** li)
        fxs, fys = fx0 * scale, fy0 * scale
        cxs, cys = cx0 * scale, cy0 * scale
        Hl = g(20 + 2 * li)                 # exact per-level dims
        Wl = g(21 + 2 * li)
        wins = wins_all[:, li * FLAT:(li + 1) * FLAT]
        refp = refp_all[:, li * FLAT:(li + 1) * FLAT]
        J = [
            jl_all[:, (li * 6 + a) * FLAT:(li * 6 + a + 1) * FLAT]
            for a in range(6)
        ]
        ox = meta[:, 4 + 2 * li:5 + 2 * li]
        oy = meta[:, 5 + 2 * li:6 + 2 * li]
        lvis = meta[:, 10 + li:11 + li]     # per-level usable flag

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
                (vis > 0.5) & (lvis > 0.5) & (z > 1e-3)
                & (u >= margin) & (u < Wl - 1.0 - margin)
                & (v >= margin) & (v < Hl - 1.0 - margin)
            )
            return u, v, okc

        def wgt_at(R, t):
            u, v, okc = project(R, t)
            fxw = u - _HALF - ox
            fyw = v - _HALF - oy
            inwin = (
                (fxw >= 0.0) & (fxw <= CWIN - SUP)
                & (fyw >= 0.0) & (fyw <= CWIN - SUP)
            )
            return (okc & inwin).astype(wdt)

        def residual_pass(R, t):
            """(bv 6, chi2) at pose — sampling identical to
            sparse_align_fused._kernel_v2.residual_pass."""
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
            ax = (fxw - x0).astype(wdt)
            ay = (fyw - y0).astype(wdt)
            s = y0.astype(jnp.int32) * CWIN + x0.astype(jnp.int32)
            w = wins
            for bb in range(_SMAX_BITS):
                bit = ((s >> bb) & 1).astype(wdt)
                w = bit * pltpu.roll(w, FLAT - (1 << bb), 1) + (1.0 - bit) * w
            cur = (
                (1 - ax) * (1 - ay) * w
                + ax * (1 - ay) * pltpu.roll(w, FLAT - 1, 1)
                + (1 - ax) * ay * pltpu.roll(w, FLAT - CWIN, 1)
                + ax * ay * pltpu.roll(w, FLAT - (CWIN + 1), 1)
            )
            r = (cur - refp) * valid
            wgt = (okc & inwin).astype(wdt)
            rw = r * wgt
            bv = [-s2(J[a] * rw).astype(dt) for a in range(6)]
            denom = jnp.maximum(s2(wgt * valid).astype(dt), 1.0)
            chi2 = s2(rw * r).astype(dt) / denom
            return bv, chi2

        # Frozen Hessian at the level-init pose/visibility, factored
        # in-kernel (once per level).
        w0 = wgt_at(R, t)
        Jw = [Ja * w0 for Ja in J]
        Hab = []
        for a in range(6):
            for b in range(a, 6):
                Hab.append(s2(Jw[a] * J[b] * valid).astype(dt))
        L = chol6(Hab)

        bv, chi2 = residual_pass(R, t)
        it0 = chi2 * 0.0

        def cond(carry):
            it, stop = carry[0], carry[1]
            return (stop[0, 0] < 0.5) & (it[0, 0] < float(n_iter))

        def body(carry, L=L, residual_pass=residual_pass):
            it, stop = carry[0], carry[1]
            R = list(carry[2:11])
            t = list(carry[11:14])
            bv = list(carry[14:20])
            chi2 = carry[20]
            one = chi2 * 0.0 + 1.0
            dx = subst(L, bv)
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

    vals = R + t + [chi2]
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    acc = jnp.zeros((1, 64), dt)
    for k, v in enumerate(vals):
        acc = acc + v * (olane == k).astype(dt)
    out_ref[...] = acc


def mega_init_projection(p_ref, R0, t0, cam, distorted):
    """Level-0 pixel projections of the reference points at the
    frame-init pose — the anchor every level's window origin derives
    from."""
    pc0 = p_ref @ R0.T + t0
    px0_l0 = cam.camera_to_pixel(pc0, distorted=distorted)
    return pc0, jnp.nan_to_num(px0_l0)


def mega_window_requests(cur_pyr, px0_l0, n_levels):
    """Per-level (img, ox, oy, CWIN) gather requests + origins, shared
    by the internal gather and callers that pre-gather all of a frame's
    windows in one fused pallas_call (gather_windows_grouped)."""
    reqs, oxs, oys = [], [], []
    for li in range(n_levels):
        img = cur_pyr[li]
        Hl, Wl = img.shape
        px0 = px0_l0 / (2.0 ** li)
        ox = jnp.clip(jnp.floor(px0[:, 0] - _HALF) - SLACK, 0, Wl - CWIN
                      ).astype(jnp.int32)
        oy = jnp.clip(jnp.floor(px0[:, 1] - _HALF) - SLACK, 0, Hl - CWIN
                      ).astype(jnp.int32)
        reqs.append((img, ox, oy, CWIN))
        oxs.append(ox)
        oys.append(oy)
    return reqs, oxs, oys


def sparse_align_mega(
    cur_pyr,
    level_refs,           # list indexed [level] of LevelRef (lanes packed)
    p_ref: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cam,
    distorted: bool,
    max_level: int,
    min_level: int = 0,
    n_iter: int = 12,
    eps: float = 1e-4,
    mega_refp: jnp.ndarray | None = None,
    mega_jl: jnp.ndarray | None = None,
    pregathered=None,     # list of [N, CWIN, CWIN] windows per level
):
    """All pyramid levels of sparse-direct alignment in one kernel.

    Windows for every level are gathered at the frame-init pose
    projections (independent DMAs); level li's window origin is stored
    in meta lanes 4+2*li.  Returns (R, t, chi2, H) with H the finest
    level's frozen Hessian (computed here in XLA only for the caller's
    Fisher-information output — the kernel assembles its own).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = cur_pyr[0].dtype
    N = p_ref.shape[0]
    n_levels = max_level - min_level + 1
    assert min_level == 0, "mega kernel assumes levels max_level..0"

    pc0, px0_l0 = mega_init_projection(p_ref, R0, t0, cam, distorted)

    reqs, oxs_i, oys_i = mega_window_requests(cur_pyr, px0_l0, n_levels)
    wins, oxs, oys, lvis = [], [], [], []
    for li in range(n_levels):
        img, ox, oy, _ = reqs[li]
        if pregathered is not None:
            wins.append(pregathered[li].reshape(N, FLAT))
        else:
            wins.append(gather_windows(img, ox, oy, CWIN).reshape(N, FLAT))
        oxs.append(ox.astype(dt))
        oys.append(oy.astype(dt))
        lvis.append(level_refs[li].vis.astype(dt))
    wdt = jnp.bfloat16 if BF16_WINDOWS else dt
    wins_all = jnp.concatenate(wins, axis=1).astype(wdt)
    # Keyframe-constant lane packs: prefer the prepare_reference-hoisted
    # arrays (no multi-MB concats in the per-frame path).
    if mega_refp is not None:
        refp_all = mega_refp.astype(wdt)
        jl_all = mega_jl.astype(wdt)
    else:
        refp_all = jnp.concatenate(
            [level_refs[li].refp_lanes.astype(wdt) for li in range(n_levels)],
            axis=1)
        jl_all = jnp.concatenate(
            [level_refs[li].jlanes.astype(wdt) for li in range(n_levels)],
            axis=1)

    meta_cols = [p_ref[:, 0], p_ref[:, 1], p_ref[:, 2],
                 jnp.ones(N, dt)]
    for li in range(n_levels):
        meta_cols += [oxs[li], oys[li]]
    while len(meta_cols) < 10:
        meta_cols.append(jnp.zeros(N, dt))
    meta_cols += lvis
    meta = jnp.stack(meta_cols, axis=1)
    meta = jnp.pad(meta, ((0, 0), (0, 16 - meta.shape[1])))

    if distorted:
        kk = jnp.stack([cam.k1, cam.k2, cam.p1, cam.p2])
    else:
        kk = jnp.zeros(4, dt)
    Hl0, Wl0 = cur_pyr[0].shape
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

    out = pl.pallas_call(
        partial(_mega_kernel, n_levels, n_iter, eps),
        out_shape=jax.ShapeDtypeStruct((1, 64), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(wins_all, refp_all, jl_all, meta, glob)

    R = out[0, 0:9].reshape(3, 3)
    t = out[0, 9:12]
    chi2 = out[0, 12]
    # Fisher-information output for AlignStats.H: finest level's
    # frozen normal matrix (assembled in XLA; tiny MXU einsum).
    lr0 = level_refs[0]
    margin = PATCH // 2 + 2
    w0 = (
        (lvis[0] > 0.5) & (pc0[:, 2] > 1e-3)
        & (px0_l0[:, 0] >= margin) & (px0_l0[:, 0] < Wl0 - 1 - margin)
        & (px0_l0[:, 1] >= margin) & (px0_l0[:, 1] < Hl0 - 1 - margin)
    ).astype(dt)
    H = jnp.einsum("npa,n,npb->ab", lr0.J, w0, lr0.J)
    return R, t, chi2, H
