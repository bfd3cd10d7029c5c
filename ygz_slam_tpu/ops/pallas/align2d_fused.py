"""Fully-fused batched Align2D Gauss-Newton as ONE Pallas TPU kernel.

The XLA formulation of the cached-window aligner (align2d_kernel.
align2d_pallas) runs each GN iteration as a chain of ~10 device
kernels inside a `lax.while_loop`; at 200 points the launch/dependency
latency of that chain — not the math — dominates the tracking step
(bench-level ablation: the iteration cap moves the frame time by
~25 us/iteration).  Here the whole optimization — per-iteration
bilinear sampling, residuals, the per-point 3x3 solve, convergence
freezing, and the final acceptance residual — runs inside a single
kernel over VMEM-resident state, so an iteration costs vector ops
instead of kernel launches.

Geometry matches align2d_pallas exactly (reference semantics:
cvutils::Align2D, src/Algorithm/CVUtils.cpp:186-318 — 8x8 patch,
(du, dv, mean_diff) inverse-compositional GN, 10 iterations, 0.03 px
convergence, budget-exhausted positions judged by the caller's gates):

- Each point owns a CACHE_WIN x CACHE_WIN VMEM window fetched once
  (gather_windows); all iterations sample inside it, positions clamped
  to the window and rejected by the caller beyond CACHE_SLACK drift.
- Windows are flattened to [N, CACHE_WIN^2] lanes.  Sampling at
  integer offset (y0, x0) is a lane-roll by s = y0*CACHE_WIN + x0,
  realized as 10 static power-of-two rolls masked by the bits of s
  (Mosaic rejects per-point dynamic slices/rolls: offsets are not
  tile-aligned, and pltpu.roll miscompiles dynamic shifts).  The
  9x9 support needed for bilinear mixing lives at lanes
  32*r + c, r,c in [0,8], so one roll serves the whole patch.
- The reference patch, its gradients and the inverted 3x3 normal
  matrix are pose-independent: prepared once (align2d_prepare) in the
  same padded lane layout, so keyframe-constant work never re-enters
  the per-frame path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .align2d_kernel import (
    CACHE_SLACK, CACHE_WIN, PATCH, gather_windows, on_tpu, usable,
)

FLAT = CACHE_WIN * CACHE_WIN          # 1024 flattened window lanes
_ROW_BLOCK = 256   # grid block for large (multi-sequence) batches
_SMAX_BITS = 10                       # max roll 759 = 23*32 + 23 < 2^10
# Bench-level A/B toggle: in-kernel while_loop that ends the GN loop
# once every point is frozen (converged or clamped out of its cache).
# Default OFF: measured 1415.7 -> 1386.4 fps (-2%) on the tracking
# bench — the all-points barrier rarely fires before the 10-iteration
# cap and the while carries cost more than they save (_bench_ab2.py).
EARLY_EXIT = False
# Window/patch math in bfloat16 (would halve the per-iteration roll
# traffic, the kernel's dominant cost); positions/solve stay f32.
# BLOCKED ON-CHIP: Mosaic rejects rolls on non-32-bit data
# ("tpu.dynamic_rotate ... not implemented: Rotate with non-32-bit
# data").  Interpret-mode accuracy was fine (0.038 px max divergence);
# keep OFF until Mosaic supports sub-32-bit rotate.
BF16_WINDOWS = False
# Delta-roll sampling: iterations 2..n keep the window rolled to the
# previous iteration's lattice origin and re-align with 5 rolls (2-bit
# x-delta + 2-bit y-delta + 1 fixed compensation) instead of the full
# 10-bit chain — GN steps are clamped to <=1 px/iteration so origin
# deltas stay in [-1, 1].  Rolls are instruction-bound (~0.4 us each,
# align2d does 143/frame), so this cuts the kernel's dominant cost by
# ~1/3.  The step clamp is semantically safe at this call site: inits
# are pose-corrected projections (sub-2-px error) and 10 iterations
# allow 10 px of travel, near the 11 px cache slack that gates
# acceptance anyway.  Measured +5.3% end-to-end (same-script A/B at
# 480-frame chunks: 3757.5 -> 3956.7 fps).
DELTA_ROLLS = True


class A2DWindows(NamedTuple):
    """Pre-fetched cached windows for align2d_fused — produced by
    ops.sparse_align.gather_frame_windows so the fetch shares one
    pallas_call with the sparse-align level gathers and never waits on
    the sparse-align kernel."""
    wins: jnp.ndarray    # [N, CACHE_WIN, CACHE_WIN]
    ox: jnp.ndarray      # [N] int32 window origins
    oy: jnp.ndarray      # [N] int32
    center: jnp.ndarray  # [N, 2] gather centers (callers gate drift
                         #        against these as well as xy_init)


def a2d_window_origins(center_xy: jnp.ndarray, H: int, W: int):
    """Cache-window origins for centers [N, 2] — the one formula both
    the in-function gather and pre-gathering callers use."""
    half = (PATCH - 1) / 2.0
    ox = jnp.clip(
        jnp.floor(center_xy[:, 0] - half) - CACHE_SLACK, 0, W - CACHE_WIN
    ).astype(jnp.int32)
    oy = jnp.clip(
        jnp.floor(center_xy[:, 1] - half) - CACHE_SLACK, 0, H - CACHE_WIN
    ).astype(jnp.int32)
    return ox, oy


class Align2DPrep(NamedTuple):
    """Pose-independent side of align2d, padded to kernel layout.
    Compute once per keyframe (align2d_prepare); constant across every
    frame aligned against those reference patches."""
    ref: jnp.ndarray     # [N, FLAT] patch values at lanes 32r+c (r,c<8)
    jx: jnp.ndarray      # [N, FLAT] x-gradient, same layout
    jy: jnp.ndarray      # [N, FLAT] y-gradient, same layout
    hinv: jnp.ndarray    # [N, 16] row-major inverse 3x3 normal matrix
                         #         (lanes 9..15 zero)


def _pad_patch(vals: jnp.ndarray) -> jnp.ndarray:
    """[N, 8, 8] -> [N, FLAT] with entry (r, c) at lane CACHE_WIN*r+c."""
    N = vals.shape[0]
    z = jnp.zeros((N, PATCH, CACHE_WIN - PATCH), vals.dtype)
    rows = jnp.concatenate([vals, z], axis=2)            # [N, 8, 32]
    tail = jnp.zeros((N, FLAT - PATCH * CACHE_WIN), vals.dtype)
    return jnp.concatenate([rows.reshape(N, -1), tail], axis=1)


def align2d_prepare(ref_patch_border: jnp.ndarray) -> Align2DPrep:
    """Precompute patch/gradient/normal-matrix state from [N, 10, 10]
    reference patches (with border) — cvutils::Align2D's reference-side
    setup, hoisted out of the per-frame path."""
    N = ref_patch_border.shape[0]
    ref = ref_patch_border[:, 1:-1, 1:-1]
    dx = 0.5 * (ref_patch_border[:, 1:-1, 2:] - ref_patch_border[:, 1:-1, :-2])
    dy = 0.5 * (ref_patch_border[:, 2:, 1:-1] - ref_patch_border[:, :-2, 1:-1])
    J = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1).reshape(N, -1, 3)
    H3 = jnp.einsum("npa,npb->nab", J, J)
    hinv = jnp.linalg.inv(H3 + 1e-6 * jnp.eye(3)).reshape(N, 9)
    hinv = jnp.pad(hinv, ((0, 0), (0, 7)))
    return Align2DPrep(
        ref=_pad_patch(ref), jx=_pad_patch(dx), jy=_pad_patch(dy), hinv=hinv,
    )


def _fused_kernel(n_iter: int, conv_eps: float, early_exit: bool,
                  delta_rolls: bool,
                  wins_ref, ref_ref, jx_ref, jy_ref, hinv_ref, meta_ref,
                  out_ref):
    from jax.experimental.pallas import tpu as pltpu

    wins = wins_ref[...]                   # [N, FLAT] (f32 or bf16)
    refp = ref_ref[...]
    jx = jx_ref[...]
    jy = jy_ref[...]
    hinv = hinv_ref[...]                   # [N, 16]  (always f32)
    meta = meta_ref[...]                   # [N, 8]: ox, oy, x_init, y_init
    N = wins.shape[0]
    wdt = wins.dtype                       # window/patch math dtype
    dt = meta.dtype                        # position/solve dtype (f32)
    half = (PATCH - 1) / 2.0
    lim = float(CACHE_WIN - PATCH - 1)     # clamp bound inside the cache

    ox = meta[:, 0:1]                      # [N, 1]
    oy = meta[:, 1:2]
    # valid-lane mask for the 8x8 residual support.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
    lr = lane // CACHE_WIN
    lc = lane % CACHE_WIN
    valid = ((lr < PATCH) & (lc < PATCH)).astype(wdt)      # [1, FLAT]
    npix = float(PATCH * PATCH)

    def lattice(x, y):
        """Cache-relative sampling lattice at per-point float (x, y):
        (fx, fy, x0, y0, clamped-at-boundary flag)."""
        fxu = x - half - ox
        fyu = y - half - oy
        clamped = jnp.where(
            (fxu < 0.0) | (fxu > lim) | (fyu < 0.0) | (fyu > lim),
            jnp.ones_like(fxu), jnp.zeros_like(fxu),
        )
        fx = jnp.clip(fxu, 0.0, lim)
        fy = jnp.clip(fyu, 0.0, lim)
        return fx, fy, jnp.floor(fx), jnp.floor(fy), clamped

    def mix(w, ax, ay):
        """Bilinear blend of a window rolled so the patch starts at
        lane 0 (3 unit rolls for the +1 taps)."""
        return (
            (1 - ax) * (1 - ay) * w
            + ax * (1 - ay) * pltpu.roll(w, FLAT - 1, 1)
            + (1 - ax) * ay * pltpu.roll(w, FLAT - CACHE_WIN, 1)
            + ax * ay * pltpu.roll(w, FLAT - (CACHE_WIN + 1), 1)
        )

    def roll_full(x0, y0):
        """Roll the base windows to lattice origin (x0, y0): the full
        _SMAX_BITS bit-masked chain (pltpu.roll wants non-negative
        shifts: left-roll by k is a right-roll by FLAT - k)."""
        s = y0.astype(jnp.int32) * CACHE_WIN + x0.astype(jnp.int32)
        w = wins
        for b in range(_SMAX_BITS):
            bit = ((s >> b) & 1).astype(wdt)               # [N, 1]
            w = bit * pltpu.roll(w, FLAT - (1 << b), 1) + (1.0 - bit) * w
        return w

    def roll_delta(w, x0c, y0c, x0, y0):
        """Re-align a window from lattice origin (x0c, y0c) to
        (x0, y0) when both deltas are in [-1, 1] (guaranteed by the
        <=1 px/iteration step clamp): 2+2 bit-masked unit rolls of the
        biased deltas + one fixed compensation roll — 5 rolls instead
        of the 10-bit chain."""
        exi = (x0 - x0c).astype(jnp.int32) + 1             # {0, 1, 2}
        eyi = (y0 - y0c).astype(jnp.int32) + 1
        for b in range(2):
            bit = ((exi >> b) & 1).astype(wdt)
            w = bit * pltpu.roll(w, FLAT - (1 << b), 1) + (1.0 - bit) * w
        for b in range(2):
            bit = ((eyi >> b) & 1).astype(wdt)
            w = (bit * pltpu.roll(w, FLAT - (CACHE_WIN << b), 1)
                 + (1.0 - bit) * w)
        # Undo the +1/+1 bias: net left-roll applied so far is
        # (ex + CACHE_WIN*ey); right-roll by CACHE_WIN+1 corrects it.
        return pltpu.roll(w, CACHE_WIN + 1, 1)

    def sample(x, y):
        """Bilinear [N, FLAT] patch stack at per-point [N, 1] float
        (x, y), patch at lanes 32r+c; also returns a 0/1 [N, 1] flag
        for positions clamped at the cache boundary."""
        fx, fy, x0, y0, clamped = lattice(x, y)
        ax = (fx - x0).astype(wdt)                         # [N, 1]
        ay = (fy - y0).astype(wdt)
        return mix(roll_full(x0, y0), ax, ay), clamped

    def gn_solve(cur, clamped, mean, frozen):
        """Residual + per-point 3x3 solve; returns the (possibly
        step-clamped) updates and the new frozen flags."""
        r = (cur - refp + mean.astype(wdt)) * valid        # [N, FLAT]
        gx = jnp.sum(r * jx, axis=1, keepdims=True).astype(dt)  # [N, 1]
        gy = jnp.sum(r * jy, axis=1, keepdims=True).astype(dt)
        gm = jnp.sum(r, axis=1, keepdims=True).astype(dt)
        du = hinv[:, 0:1] * gx + hinv[:, 1:2] * gy + hinv[:, 2:3] * gm
        dv = hinv[:, 3:4] * gx + hinv[:, 4:5] * gy + hinv[:, 5:6] * gm
        dm = hinv[:, 6:7] * gx + hinv[:, 7:8] * gy + hinv[:, 8:9] * gm
        small = jnp.where(
            du * du + dv * dv < conv_eps * conv_eps, 1.0, 0.0
        ).astype(dt)
        if delta_rolls:
            # <=1 px/iteration so the lattice origin moves by at most
            # one cell between samples (roll_delta's contract).
            du = jnp.clip(du, -1.0, 1.0)
            dv = jnp.clip(dv, -1.0, 1.0)
        # A point clamped at the cache boundary has drifted beyond the
        # slack the caller accepts (it will be rejected by the drift
        # gate) — freeze it so one runaway can't pin the whole batch
        # at the iteration cap.
        done = jnp.maximum(small, clamped if early_exit else small * 0.0)
        act = (1.0 - done) * (1.0 - frozen)
        frozen = jnp.maximum(frozen, done)
        return act * du, act * dv, act * dm, frozen

    def gn_step(x, y, mean, frozen):
        cur, clamped = sample(x, y)
        du, dv, dm, frozen = gn_solve(cur, clamped, mean, frozen)
        return x - du, y - dv, mean - dm, frozen

    # GN iterations: a lax.while_loop with f32 carries when early_exit
    # (all-points-frozen ends the loop; Mosaic legalizes f32 — not i1 —
    # vector carries), else statically unrolled with freeze flags.
    x = meta[:, 2:3]
    y = meta[:, 3:4]
    mean = jnp.zeros((N, 1), dt)
    frozen = jnp.zeros((N, 1), dt)
    if delta_rolls and not early_exit:
        # One full roll chain positions the windows once; every later
        # iteration re-aligns with 5 delta rolls (see DELTA_ROLLS).
        fx, fy, x0, y0, clamped = lattice(x, y)
        w = roll_full(x0, y0)
        for _ in range(n_iter):
            ax = (fx - x0).astype(wdt)
            ay = (fy - y0).astype(wdt)
            cur = mix(w, ax, ay)
            du, dv, dm, frozen = gn_solve(cur, clamped, mean, frozen)
            x = x - du
            y = y - dv
            mean = mean - dm
            x0c, y0c = x0, y0
            fx, fy, x0, y0, clamped = lattice(x, y)
            w = roll_delta(w, x0c, y0c, x0, y0)
        cur = mix(w, (fx - x0).astype(wdt), (fy - y0).astype(wdt))
        err = jnp.sum(
            jnp.abs((cur - refp + mean.astype(wdt)) * valid), axis=1,
            keepdims=True,
        ).astype(dt) / npix
        out = jnp.concatenate([x, y, mean, err], axis=1)   # [N, 4]
        out_ref[...] = jnp.pad(out, ((0, 0), (0, 4)))
        return
    if early_exit:
        it0 = jnp.zeros((1, 1), dt)

        def cond(carry):
            it, allfro = carry[0], carry[1]
            return (allfro[0, 0] < 0.5) & (it[0, 0] < float(n_iter))

        def body(carry):
            it, _, x, y, mean, frozen = carry
            x, y, mean, frozen = gn_step(x, y, mean, frozen)
            allfro = jnp.min(frozen, axis=0, keepdims=True)  # [1, 1]
            return (it + 1.0, allfro, x, y, mean, frozen)

        _, _, x, y, mean, frozen = jax.lax.while_loop(
            cond, body, (it0, it0 * 0.0, x, y, mean, frozen))
    else:
        for _ in range(n_iter):
            x, y, mean, frozen = gn_step(x, y, mean, frozen)
    cur, _ = sample(x, y)
    err = jnp.sum(
        jnp.abs((cur - refp + mean.astype(wdt)) * valid), axis=1,
        keepdims=True,
    ).astype(dt) / npix
    out = jnp.concatenate([x, y, mean, err], axis=1)       # [N, 4]
    out_ref[...] = jnp.pad(out, ((0, 0), (0, 4)))


def align2d_fused(
    cur_img: jnp.ndarray,
    prep: Align2DPrep,
    xy_init: jnp.ndarray,
    n_iter: int = 10,
    conv_eps: float = 0.03,
    early_exit: bool | None = None,
    origin_xy: jnp.ndarray | None = None,
    pregathered: A2DWindows | None = None,
):
    """Cached-window align2d with the GN loop fused into one kernel.

    Same contract as align2d_kernel.align2d_pallas: returns
    (xy [N,2], mean [N], err [N]); the caller rejects drift beyond
    CACHE_SLACK and err above its threshold.

    `origin_xy` optionally centers each point's cached window somewhere
    other than `xy_init` — e.g. the frame-INIT pose projection, making
    the window gather independent of the preceding sparse-align kernel
    (the DMA overlaps it instead of waiting on it).  The effective
    drift slack shrinks by |origin_xy - xy_init|; callers must gate
    results against origin_xy as well as xy_init."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if early_exit is None:
        early_exit = EARLY_EXIT
    delta_rolls = DELTA_ROLLS and not early_exit
    H, W = cur_img.shape
    N = xy_init.shape[0]
    if pregathered is not None:
        wins, ox, oy = pregathered.wins, pregathered.ox, pregathered.oy
    else:
        center = xy_init if origin_xy is None else origin_xy
        ox, oy = a2d_window_origins(center, H, W)
        wins = gather_windows(cur_img, ox, oy, CACHE_WIN)  # [N, 32, 32]
    pdt = jnp.float32
    wdt = jnp.bfloat16 if BF16_WINDOWS else pdt
    meta = jnp.stack(
        [ox.astype(pdt), oy.astype(pdt),
         xy_init[:, 0].astype(pdt), xy_init[:, 1].astype(pdt)],
        axis=1,
    )
    meta = jnp.pad(meta, ((0, 0), (0, 4)))
    args = (
        wins.reshape(N, FLAT).astype(wdt),
        prep.ref.astype(wdt),
        prep.jx.astype(wdt),
        prep.jy.astype(wdt),
        prep.hinv.astype(pdt),
        meta,
    )
    kern = partial(_fused_kernel, n_iter, conv_eps, early_exit,
                   delta_rolls)
    if N <= _ROW_BLOCK:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 8), pdt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    else:
        # Large batches (the multi-sequence path feeds S*N rows): grid
        # over row blocks.  The kernel is purely per-point, and Mosaic
        # compile time scales with PROGRAM tile count — one ~1600-row
        # program took >1 h through the compile relay, while the
        # per-block program is the well-trodden single-sequence size
        # (and blocks pipeline their VMEM loads).
        Np = -(-N // _ROW_BLOCK) * _ROW_BLOCK
        pad = Np - N
        args = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in args)
        out = pl.pallas_call(
            kern,
            grid=(Np // _ROW_BLOCK,),
            out_shape=jax.ShapeDtypeStruct((Np, 8), pdt),
            in_specs=[
                pl.BlockSpec((_ROW_BLOCK, a.shape[1]),
                             lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for a in args
            ],
            out_specs=pl.BlockSpec((_ROW_BLOCK, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(*args)[:N]
    return (out[:, :2].astype(cur_img.dtype),
            out[:, 2].astype(cur_img.dtype),
            out[:, 3].astype(cur_img.dtype))
