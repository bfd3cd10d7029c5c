"""Distributed bundle adjustment: landmark blocks sharded over a
device mesh, camera system reduced with psum.

This is the scale-out counterpart of solvers.ba.local_ba and the
heart of the BASELINE.json north star: "local-mapping BA solved via
psum/all-gather of camera-block Hessians after landmark
marginalization".  The reference has no distributed anything (single
process, SURVEY.md §2.4) — this is net-new TPU-native design.

Structure (per GN/LM iteration, all inside one shard_map):
  1. each device holds a shard of landmarks + the observations of
     those landmarks (host partitions obs by landmark; poses are
     replicated — the camera window is small, K<=O(10)).
  2. device-local: residuals, Jacobians, per-landmark 3x3 Hessians,
     camera blocks Hcc, coupling W, gradients.
  3. `psum` over the mesh: global reduced camera system
     S = Hcc - W Hll^-1 W^T and b_red (a [6K, 6K] matrix — tiny, so
     the collective moves O(K^2) data, not O(L)).
  4. replicated dense solve for camera updates dc.
  5. device-local landmark back-substitution dl (no communication).

Communication volume per iteration is O(K^2 * 36) bytes — independent
of the landmark count, which is what makes BA scaling efficient.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3
from ..geometry import jacobians as jac
from ..solvers import robust
from .mesh import LANDMARK_AXIS, landmark_axes


class ShardedObs(NamedTuple):
    """Observations pre-partitioned by landmark shard.

    All arrays have leading dim O_total = n_shards * O_per_shard; row i
    belongs to shard i // O_per_shard.  pt_idx is *local* to the shard
    (0..L_shard-1).
    """

    kf_idx: jnp.ndarray   # [O] int32 (global keyframe index)
    pt_idx: jnp.ndarray   # [O] int32 (shard-local landmark index)
    px: jnp.ndarray       # [O, 2]
    mask: jnp.ndarray     # [O]


def partition_observations(
    kf_idx, pt_idx, px, mask, L: int, n_shards: int
):
    """Host-side prep: group observations by landmark shard and pad
    each shard to the max per-shard count.  Returns (ShardedObs,
    points_perm [L_pad], inverse landmark permutation [L_pad]) where
    landmarks are re-ordered so shard s owns rows [s*Ls, (s+1)*Ls).

    The identity permutation is used (landmark row -> shard by
    row // Ls), so callers can shard `points` directly; observations
    are routed to the owning shard here.
    """
    import numpy as np

    from .. import native

    L_pad = ((L + n_shards - 1) // n_shards) * n_shards
    Ls = L_pad // n_shards
    kf_idx = np.asarray(kf_idx)
    pt_idx = np.asarray(pt_idx)
    px = np.asarray(px)
    mask = np.asarray(mask)
    out = native.partition_obs(kf_idx, pt_idx, px, mask, L, n_shards)
    if out is not None:
        out_kf, out_pt, out_px, out_mask, _ = out
    else:  # NumPy fallback when no compiler is available
        shard_of = np.where(mask, pt_idx // Ls, -1)
        counts = [(shard_of == s).sum() for s in range(n_shards)]
        O_shard = int(max(max(counts), 1))
        out_kf = np.zeros((n_shards, O_shard), np.int32)
        out_pt = np.zeros((n_shards, O_shard), np.int32)
        out_px = np.zeros((n_shards, O_shard, 2), np.float32)
        out_mask = np.zeros((n_shards, O_shard), bool)
        for s in range(n_shards):
            rows = np.where(shard_of == s)[0]
            n = len(rows)
            out_kf[s, :n] = kf_idx[rows]
            out_pt[s, :n] = pt_idx[rows] - s * Ls
            out_px[s, :n] = px[rows]
            out_mask[s, :n] = mask[rows]
        out_kf, out_pt, out_px, out_mask = (
            out_kf.reshape(-1), out_pt.reshape(-1),
            out_px.reshape(-1, 2), out_mask.reshape(-1),
        )
    return (
        ShardedObs(
            kf_idx=jnp.asarray(out_kf.reshape(-1)),
            pt_idx=jnp.asarray(out_pt.reshape(-1)),
            px=jnp.asarray(out_px.reshape(-1, 2)),
            mask=jnp.asarray(out_mask.reshape(-1)),
        ),
        L_pad,
    )


def sharded_local_ba(
    mesh: Mesh,
    poses: SE3,                 # replicated, K keyframes
    points: jnp.ndarray,        # [L_pad, 3] sharded along axis 0
    obs: ShardedObs,            # sharded along axis 0
    cam,
    fixed_pose: jnp.ndarray,    # [K] bool, replicated
    n_iter: int = 10,
    huber_delta: float = 2.447,
):
    """Distributed Schur-complement BA over `mesh` (1-D, LANDMARK_AXIS).

    Returns (poses, points, chi2) with the same sharding as inputs.
    """
    # Solver boundary: raw pixel observations -> ideal-pinhole pixels
    # (identity for zero-distortion cameras); the residual below then
    # projects with distorted=False exactly (solvers/ba.reproject's
    # convention; reference BA.cpp:33,47,106 via Pixel2Camera2D).
    obs = obs._replace(px=cam.undistort_px(obs.px))
    # TPU MXU f32 contractions round through bf16 at the 1-pass
    # default, which visibly degrades the Hessian blocks / Schur
    # reduction (bench_scaling's pose gate failed on the real chip at
    # default precision).  Trace at solvers.ba.MATMUL_PRECISION
    # (>= 3-pass; see the A/B record there).
    from ..solvers import ba as _ba
    with jax.default_matmul_precision(_ba.MATMUL_PRECISION):
        return _sharded_local_ba(
            mesh, poses, points, obs, cam, fixed_pose, n_iter,
            huber_delta,
        )


def _sharded_local_ba(
    mesh, poses, points, obs, cam, fixed_pose, n_iter, huber_delta,
):
    K = fixed_pose.shape[0]
    # 1-D mesh: the landmark axis name; 2-D (host, chip) mesh: the
    # tuple of both names — PartitionSpec flattens the landmark dim
    # over them and psum reduces hierarchically (ICI then DCN).
    ax = landmark_axes(mesh)

    def residuals(pose7, pts_l, kf_i, pt_i, px_i, m_i):
        poses_l = SE3.from_params7(pose7)
        T = jax.tree.map(lambda a: a[kf_i], poses_l)
        pw = pts_l[pt_i]
        pc = T.apply(pw)
        valid = m_i & (pc[..., 2] > 1e-2)
        pc = pc.at[..., 2].set(jnp.maximum(pc[..., 2], 1e-2))
        proj = cam.camera_to_pixel(pc, distorted=False)
        return proj - px_i, pc, T, valid

    def frozen_weights(pose7, pts_l, kf_i, pt_i, px_i, m_i):
        """IRLS weights at the iteration's start state — frozen so the
        accept/reject chi2 comparison stays under one objective."""
        r, _, _, valid = residuals(pose7, pts_l, kf_i, pt_i, px_i, m_i)
        rn = jnp.linalg.norm(r, axis=-1)
        return jnp.where(valid, robust.huber_weight(rn, huber_delta), 0.0)

    def chi2_at(pose7, pts_l, kf_i, pt_i, px_i, m_i, w):
        r, _, _, valid = residuals(pose7, pts_l, kf_i, pt_i, px_i, m_i)
        w = jnp.where(valid, w, 0.0)
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    def local_blocks(pose7, pts_l, kf_i, pt_i, px_i, m_i, w):
        """Device-local Hessian blocks for one landmark shard."""
        r, pc, T, valid = residuals(pose7, pts_l, kf_i, pt_i, px_i, m_i)
        Jp = jac.duv_dxi(pc, cam.fx, cam.fy)
        Jl = jac.duv_dpoint(pc, T.R, cam.fx, cam.fy)
        w = jnp.where(valid, w, 0.0)
        free = (~fixed_pose)[kf_i].astype(Jp.dtype)
        Jp = Jp * free[:, None, None]
        Ls = pts_l.shape[0]
        Hcc = jax.ops.segment_sum(
            jnp.einsum("oia,o,oib->oab", Jp, w, Jp), kf_i, num_segments=K
        )
        Hll = jax.ops.segment_sum(
            jnp.einsum("oia,o,oib->oab", Jl, w, Jl), pt_i, num_segments=Ls
        )
        bc = jax.ops.segment_sum(
            -jnp.einsum("oia,o,oi->oa", Jp, w, r), kf_i, num_segments=K
        )
        bl = jax.ops.segment_sum(
            -jnp.einsum("oia,o,oi->oa", Jl, w, r), pt_i, num_segments=Ls
        )
        W = jnp.zeros((K, Ls, 6, 3), Jp.dtype)
        W = W.at[kf_i, pt_i].add(jnp.einsum("oia,o,oib->oab", Jp, w, Jl))
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return Hcc, Hll, W, bc, bl, chi2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(ax), P(ax), P(ax), P(ax), P(ax), P()),
        out_specs=(P(), P(ax), P()),
    )
    def ba_shard(pose7, pts_l, kf_i, pt_i, px_i, m_i, lam0):
        def one_iter(carry, _):
            pose7_c, pts_c, lam, chi2_old = carry
            w_frozen = frozen_weights(pose7_c, pts_c, kf_i, pt_i, px_i, m_i)
            Hcc, Hll, W, bc, bl, chi2_loc = local_blocks(
                pose7_c, pts_c, kf_i, pt_i, px_i, m_i, w_frozen
            )
            dtype = pts_c.dtype
            # Local Schur pieces, then one psum for the global system.
            Hll_d = Hll + (lam + 1e-6) * jnp.eye(3, dtype=dtype)
            from ..solvers.ba import inv3x3
            Hll_inv = inv3x3(Hll_d)
            A = jnp.einsum("klab,lbc->klac", W, Hll_inv)
            S_loc = -jnp.einsum("klac,mlbc->kmab", A, W)
            b_loc = -jnp.einsum("klac,lc->ka", A, bl)
            # Collectives: camera system is tiny (O(K^2)), landmarks
            # never cross devices.
            S = jax.lax.psum(S_loc, ax)
            b_red = jax.lax.psum(bc + b_loc, ax)
            Hcc_g = jax.lax.psum(Hcc, ax)
            chi2 = jax.lax.psum(chi2_loc, ax)
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                Hcc_g + lam * jnp.eye(6, dtype=dtype)
            )
            # Gauge fixing.
            freem = (~fixed_pose).astype(dtype)
            S = S * freem[:, None, None, None] * freem[None, :, None, None]
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                jnp.eye(6, dtype=dtype)[None]
                * fixed_pose.astype(dtype)[:, None, None]
            )
            b_red = b_red * freem[:, None]
            S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
            dc = jnp.linalg.solve(
                S_mat + 1e-8 * jnp.eye(K * 6, dtype=dtype),
                b_red.reshape(K * 6),
            ).reshape(K, 6)
            dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
            # Local landmark back-substitution.
            dl = jnp.einsum(
                "lab,lb->la",
                Hll_inv,
                bl - jnp.einsum("klab,ka->lb", W, dc),
            )
            dl = jnp.where(jnp.isfinite(dl), dl, 0.0)
            poses_new = jax.vmap(se3m.boxplus)(
                SE3.from_params7(pose7_c), dc
            )
            pose7_new = poses_new.params7()
            pts_new = pts_c + dl
            chi2_new_loc = chi2_at(
                pose7_new, pts_new, kf_i, pt_i, px_i, m_i, w_frozen
            )
            chi2_new = jax.lax.psum(chi2_new_loc, ax)
            accept = chi2_new < chi2
            pose7_next = jnp.where(accept, pose7_new, pose7_c)
            pts_next = jnp.where(accept, pts_new, pts_c)
            lam_next = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4
            )
            return (pose7_next, pts_next, lam_next,
                    jnp.where(accept, chi2_new, chi2)), chi2

        (pose7_f, pts_f, _, chi2_f), _ = jax.lax.scan(
            one_iter, (pose7, pts_l, lam0, jnp.asarray(jnp.inf, pts_l.dtype)),
            None, length=n_iter,
        )
        return pose7_f, pts_f, chi2_f

    pose7_out, pts_out, chi2 = ba_shard(
        poses.params7(), points, obs.kf_idx, obs.pt_idx, obs.px, obs.mask,
        jnp.asarray(1e-4, points.dtype),
    )
    return SE3.from_params7(pose7_out), pts_out, chi2
