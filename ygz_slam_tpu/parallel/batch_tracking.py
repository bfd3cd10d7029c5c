"""Multi-sequence batch tracking: S sequences tracked simultaneously.

BASELINE.json config 5 ("multi-sequence batch SfM — 16 TUM sequences
concurrently, one pod slice"): per-frame tracking is sequential within
a sequence but embarrassingly parallel ACROSS sequences.  This module
provides the batched per-frame step:

- on one chip: the S sequences' frames are stacked [S, H, W] and all
  S*N feature patches stream through one multi-image VMEM window
  kernel (ops.pallas.align2d_kernel.gather_windows_multi); per-
  sequence 6x6 GN systems are reduced with segment sums and solved
  batched — one jit call advances every sequence one frame.
- across chips: sequences shard over the mesh with shard_map (pure
  data parallelism, no collectives needed — in_specs/out_specs P(ax)).

Off-TPU the same API falls back to vmap over the single-sequence
sparse aligner.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry import jacobians as jac
from ..ops.interp import in_bounds
from ..ops.pallas import align2d_kernel as ak
from .mesh import LANDMARK_AXIS


# Batch-path kernel strategy (bench_batch A/B):
#   True  — per-sequence FUSED mega kernels for sparse align (each
#           sequence keeps its own early-exiting in-kernel GN) + ONE
#           fused align2d kernel over all S*N flattened points; glue,
#           gathers and the pose BA amortize across the batch.
#   False — the pre-fusion formulation: per-GN-iteration multi-image
#           window gathers in an XLA while_loop (measured 832 aggregate
#           fps at S=8 vs 3577 single-sequence — kept for comparison).
USE_FUSED_BATCH = True


def batched_sparse_align(
    ref_pyrs: tuple[jnp.ndarray, ...],   # per level: [S, h, w]
    cur_pyrs: tuple[jnp.ndarray, ...],
    cam,
    px_ref: jnp.ndarray,                 # [S, N, 2]
    depth_ref: jnp.ndarray,              # [S, N]
    mask: jnp.ndarray,                   # [S, N]
    T_init: SE3,                         # batched [S]
    n_iter: int = 15,
    ref_preps: list | None = None,       # per-seq ReferencePrep (hoist!)
) -> SE3:
    """One batched coarse-to-fine sparse-direct alignment step for S
    sequences at once.  Returns SE3 batched [S]."""
    S, N = mask.shape
    if USE_FUSED_BATCH and ak.on_tpu() and ak.usable(
            ref_pyrs[0].shape[1:], 6):
        # Per-sequence fused mega kernels: sequence s's whole
        # coarse-to-fine GN runs in one kernel (data-dependent early
        # exit stays per-sequence); window gathers are one fused
        # pallas_call per sequence (gather_frame_windows).
        from ..ops import sparse_align as sa

        T7_in = T_init.params7()
        T7s = []
        for s in range(S):
            rp = tuple(r[s] for r in ref_pyrs)
            cp = tuple(c[s] for c in cur_pyrs)
            prep = None if ref_preps is None else ref_preps[s]
            if prep is None:
                prep = sa.prepare_reference(
                    rp, cam, px_ref[s], depth_ref[s], mask[s],
                    distorted=True,
                )
            T0 = SE3.from_params7(T7_in[s])
            fw = sa.gather_frame_windows(
                cp, cam, prep, T0, distorted=True,
                max_level=len(cp) - 1,
            )
            st = sa.sparse_image_align(
                rp, cp, cam, px_ref[s], depth_ref[s], mask[s], T0,
                n_iter=n_iter, distorted=True, ref_prep=prep,
                frame_windows=fw,
            )
            T7s.append(st.T_cur_ref.params7())
        return SE3.from_params7(jnp.stack(T7s))
    if not (ak.on_tpu() and ak.usable(ref_pyrs[0].shape[1:], 6)):
        from ..ops.sparse_align import sparse_image_align

        def one(rp, cp, px, d, m, T7):
            st = sparse_image_align(
                tuple(r for r in rp), tuple(c for c in cp), cam, px, d, m,
                SE3.from_params7(T7), n_iter=n_iter, distorted=True,
            )
            return st.T_cur_ref.params7()

        T7 = jax.vmap(one)(
            ref_pyrs, cur_pyrs, px_ref, depth_ref, mask, T_init.params7()
        )
        return SE3.from_params7(T7)

    # --- TPU path: flatten sequences into one point soup -------------
    seq_idx = jnp.repeat(jnp.arange(S, dtype=jnp.int32), N)
    pxf = px_ref.reshape(S * N, 2)
    df = depth_ref.reshape(S * N)
    mf = mask.reshape(S * N) & (df > 1e-3)
    p_ref = cam.pixel_to_camera(pxf, df, distorted=True)     # [SN, 3]
    T = T_init

    for level in range(len(ref_pyrs) - 1, -1, -1):
        scale = 1.0 / (2.0 ** level)
        refs = ref_pyrs[level]
        curs = cur_pyrs[level]
        hh, ww = refs.shape[1:]
        u_ref = pxf * scale
        vis = mf & in_bounds(u_ref, hh, ww, margin=4.0)
        p6 = ak.bilinear_patches_multi(refs, seq_idx, u_ref, 6)
        ref_patch = p6[:, 1:5, 1:5].reshape(-1, 16)
        gdx = (0.5 * (p6[:, 1:5, 2:6] - p6[:, 1:5, 0:4])).reshape(-1, 16)
        gdy = (0.5 * (p6[:, 2:6, 1:5] - p6[:, 0:4, 1:5])).reshape(-1, 16)
        J_proj = jac.duv_dxi(p_ref, cam.fx * scale, cam.fy * scale)
        J = (
            gdx[..., None] * J_proj[:, None, 0, :]
            + gdy[..., None] * J_proj[:, None, 1, :]
        )                                                     # [SN,16,6]

        def gn_iter(T7):
            Tb = SE3.from_params7(T7)
            Tp = jax.tree.map(lambda a: a[seq_idx], Tb)
            p_cur = Tp.apply(p_ref)
            px_cur = cam.camera_to_pixel(p_cur, distorted=True) * scale
            okc = vis & (p_cur[:, 2] > 1e-3) & in_bounds(
                px_cur, hh, ww, margin=4.0
            )
            cur = ak.bilinear_patches_multi(
                curs, seq_idx, px_cur, 4
            ).reshape(-1, 16)
            r = cur - ref_patch
            w = okc[:, None].astype(r.dtype)
            Hb = jax.ops.segment_sum(
                jnp.einsum("npa,np,npb->nab", J, w, J), seq_idx,
                num_segments=S,
            )
            bb = jax.ops.segment_sum(
                -jnp.einsum("npa,np->na", J, w * r), seq_idx,
                num_segments=S,
            )
            Hb = Hb + 1e-6 * jnp.eye(6)
            dx = jnp.linalg.solve(Hb, bb[..., None])[..., 0]
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            Tb_new = jax.vmap(
                lambda Tb_i, d: Tb_i.compose(se3m.exp(d))
            )(SE3.from_params7(T7), dx)
            return Tb_new.params7(), jnp.max(jnp.linalg.norm(dx, axis=-1))

        # Early exit when EVERY sequence's GN step is tiny (the same
        # eps=1e-4 the single-sequence gauss_newton engine uses):
        # typical batches settle in 3-5 iterations and the per-
        # iteration multi-image window gather is the cost center.
        def cond(state):
            _, it, max_step = state
            return (it < n_iter) & (max_step > 1e-4)

        def body(state):
            T7, it, _ = state
            T7n, max_step = gn_iter(T7)
            return T7n, it + 1, max_step

        T7, _, _ = jax.lax.while_loop(
            cond, body,
            (T.params7(), jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, refs.dtype)),
        )
        T = SE3.from_params7(T7)
    return T


def batched_align2d(
    cur_imgs: jnp.ndarray,           # [S, H, W]
    ref_patches: jnp.ndarray,        # [S, N, 10, 10] (1-px border)
    xy_init: jnp.ndarray,            # [S, N, 2]
    n_iter: int = 10,
    max_error: float = 30.0,
    a2d_prep=None,                   # flattened Align2DPrep (hoist!)
):
    """Batched patch alignment across S sequences: the TPU path flattens
    all S*N patches into ONE fused-GN align2d kernel (windows fetched by
    the multi-image gatherer); off-TPU it vmaps the single-image
    aligner.  Returns (xy [S,N,2], converged [S,N], err [S,N])."""
    from ..ops.align import align2d

    S, N = ref_patches.shape[:2]
    H, W = cur_imgs.shape[1:]
    patch = ref_patches.shape[2] - 2
    if not (ak.on_tpu() and ak.usable((H, W), patch + 3) and patch == 8):
        res = jax.vmap(
            lambda img, rp, xy: align2d(
                img, rp, xy, n_iter=n_iter, max_error=max_error
            )
        )(cur_imgs, ref_patches, xy_init)
        return res.xy, res.converged, res.error

    seq_idx = jnp.repeat(jnp.arange(S, dtype=jnp.int32), N)
    xy0 = xy_init.reshape(S * N, 2)
    inb0 = in_bounds(xy0, H, W, margin=patch / 2 + 2)
    xy0s = jnp.where(inb0[:, None], xy0, jnp.full_like(xy0, patch + 2.0))
    if USE_FUSED_BATCH:
        # One fused-GN kernel over all S*N points — the kernel is
        # purely per-point, so sequences only differ in which image
        # their cached window was fetched from.
        from ..ops.pallas import align2d_fused as _af

        if a2d_prep is None:
            a2d_prep = _af.align2d_prepare(
                ref_patches.reshape(S * N, *ref_patches.shape[2:]))
        ox, oy = _af.a2d_window_origins(xy0s, H, W)
        wins = ak.gather_windows_multi(
            cur_imgs, seq_idx, ox, oy, _af.CACHE_WIN)
        xy, mean, err = _af.align2d_fused(
            cur_imgs[0], a2d_prep, xy0s, n_iter=n_iter,
            pregathered=_af.A2DWindows(wins=wins, ox=ox, oy=oy,
                                       center=xy0s),
        )
    else:
        xy, mean, err = ak.align2d_pallas_multi(
            cur_imgs, seq_idx,
            ref_patches.reshape(S * N, *ref_patches.shape[2:]),
            xy0s, n_iter=n_iter,
        )
    inb = in_bounds(xy, H, W, margin=patch / 2 + 1)
    drift = jnp.linalg.norm(xy - xy0, axis=-1)
    max_drift = min(patch * 2.0, float(ak.CACHE_SLACK))
    conv = inb0 & inb & (err < max_error) & (drift < max_drift)
    return (
        xy.reshape(S, N, 2), conv.reshape(S, N), err.reshape(S, N)
    )


def batched_track_step(
    ref_pyrs,                        # per level [S, h, w]
    cur_pyrs,
    cam,
    px_ref: jnp.ndarray,             # [S, N, 2]
    depth_ref: jnp.ndarray,          # [S, N]
    mask: jnp.ndarray,               # [S, N]
    pts_w: jnp.ndarray,              # [S, N, 3] landmark positions
    ref_patches: jnp.ndarray,        # [S, N, 10, 10]
    T_init: SE3,                     # batched [S]
    n_align_iter: int = 15,
    ref_preps: list | None = None,   # per-seq sparse ReferencePrep
    a2d_prep=None,                   # flattened [S*N] Align2DPrep
) -> tuple[SE3, jnp.ndarray]:
    """The FULL per-frame tracking computation for S sequences at once
    (multi-sequence batch SfM): batched sparse-direct alignment ->
    batched map patch alignment -> batched pose-only BA.  One jit call
    advances every sequence one frame; returns (poses [S], inliers [S]).

    `ref_preps`/`a2d_prep` are keyframe-constant and should be computed
    once per keyframe set (prepare_reference per sequence /
    align2d_prepare of the flattened patches) and passed to every
    frame step."""
    from ..solvers.ba import pose_only_ba

    S, N = mask.shape
    T = batched_sparse_align(
        ref_pyrs, cur_pyrs, cam, px_ref, depth_ref, mask, T_init,
        n_iter=n_align_iter, ref_preps=ref_preps,
    )
    proj = jax.vmap(
        lambda Ti, p: cam.world_to_pixel(p, Ti, distorted=True)
    )(T, pts_w)
    xy, conv, _err = batched_align2d(cur_pyrs[0], ref_patches, proj,
                                     a2d_prep=a2d_prep)
    if USE_FUSED_BATCH and ak.on_tpu():
        # All S pose solves in ONE kernel (sequences on the sublane
        # axis) — the vmapped XLA formulation's ~40-iteration serial
        # chain of small ops is latency-bound regardless of batching.
        from ..ops.pallas.pose_ba_fused_batch import (
            pose_only_ba_fused_batch)

        xyu = jax.vmap(cam.undistort_px)(xy)   # solver boundary
        T_out, inlier, _chi2 = pose_only_ba_fused_batch(
            T, pts_w, xyu, conv & mask, cam)
    else:
        T_out, inlier, _chi2 = jax.vmap(
            # use_fused=False: vmapped XLA formulation (fallback).
            lambda Ti, p, o, m: pose_only_ba(
                Ti, p, o, m, cam, use_fused=False)
        )(T, pts_w, xy, conv & mask)
    return T_out, jnp.sum(inlier, axis=-1)


def sharded_batch_align(
    mesh: Mesh, ref_pyrs, cur_pyrs, cam, px, depth, mask, T_init: SE3,
    n_iter: int = 15,
) -> SE3:
    """Shard the sequence axis over the mesh: pure data parallelism,
    zero collectives — the multi-chip face of config 5."""
    ax = LANDMARK_AXIS

    def fn(ref_pyrs, cur_pyrs, px, d, m, T7):
        out = batched_sparse_align(
            ref_pyrs, cur_pyrs, cam, px, d, m,
            SE3.from_params7(T7), n_iter=n_iter,
        )
        return out.params7()

    n_lvl = len(ref_pyrs)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            tuple(P(ax) for _ in range(n_lvl)),
            tuple(P(ax) for _ in range(n_lvl)),
            P(ax), P(ax), P(ax), P(ax),
        ),
        out_specs=P(ax),
    )
    return SE3.from_params7(
        sharded(ref_pyrs, cur_pyrs, px, depth, mask, T_init.params7())
    )
