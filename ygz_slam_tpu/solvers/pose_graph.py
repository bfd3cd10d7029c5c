"""Pose-graph optimization over relative SE(3) constraints.

Closes the reference's loop-closing placeholder (the empty class in
include/ygz/loop_closing.h:5-7 and the "three main threads like
ORB-SLAM" intent, system.h:80-83): after a verified loop, keyframe
poses are corrected by minimizing

    sum_e || log( T_meas_e * T_j * T_i^-1 ... ) ||^2_Lambda

over all covisibility/odometry/loop edges.  Batched GN: all edge
residuals + 6x6 Jacobian blocks in one pass, dense [6K, 6K] normal
equations (keyframe windows are small), gauge fixed on chosen poses.

Jacobians use the first-order BCH approximation (J ~ +-I for the
right/left pose), standard for pose-graph solvers at SLAM noise
levels.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry import sim3 as sim3m
from ..geometry.se3 import SE3


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray        # [E] int32 source keyframe index
    j: jnp.ndarray        # [E] int32 target keyframe index
    T_ji7: jnp.ndarray    # [E, 7] measured T_j * T_i^-1 (params7)
    weight: jnp.ndarray   # [E] information scale
    mask: jnp.ndarray     # [E] bool


def edge_residuals(poses: SE3, edges: PoseGraphEdges) -> jnp.ndarray:
    """[E, 6] residual log( T_meas * T_i * T_j^-1 ) per edge."""
    Ti = jax.tree.map(lambda a: a[edges.i], poses)
    Tj = jax.tree.map(lambda a: a[edges.j], poses)
    T_meas = SE3.from_params7(edges.T_ji7)
    err = T_meas.compose(Ti).compose(Tj.inverse())
    return se3m.log(err)


def optimize(
    poses: SE3,
    edges: PoseGraphEdges,
    fixed: jnp.ndarray,
    n_iter: int = 20,
) -> tuple[SE3, jnp.ndarray]:
    """GN pose-graph solve; returns (poses, final chi2).

    With residual r = log(T_meas Ti Tj^-1) and left-multiplicative
    perturbations Ti <- exp(di) Ti, Tj <- exp(dj) Tj, the first-order
    Jacobians are  dr/di ~ Ad(T_meas),  dr/dj ~ -Ad(T_meas Ti Tj^-1)
    ~ -I near convergence; we use the common approximation
    dr/di = +I, dr/dj = -Ad(Tji_est) refined by iteration.
    """
    K = poses.t.shape[0]
    E = edges.i.shape[0]

    def compute(pose7):
        p = SE3.from_params7(pose7)
        r = edge_residuals(p, edges)                    # [E, 6]
        Ti = jax.tree.map(lambda a: a[edges.i], p)
        Tj = jax.tree.map(lambda a: a[edges.j], p)
        T_meas = SE3.from_params7(edges.T_ji7)
        # J_i = Ad(T_meas), J_j = -Ad(T_meas Ti Tj^-1) ~ -Ad(exp(r)).
        Ji = se3m.adjoint(T_meas)                       # [E, 6, 6]
        Jj = -se3m.adjoint(T_meas.compose(Ti).compose(Tj.inverse()))
        w = jnp.where(edges.mask, edges.weight, 0.0)
        free = (~fixed).astype(r.dtype)
        Ji = Ji * free[edges.i][:, None, None]
        Jj = Jj * free[edges.j][:, None, None]
        # Dense assembly via scatter into [K, K, 6, 6].
        H = jnp.zeros((K, K, 6, 6), r.dtype)
        Hii = jnp.einsum("eab,e,eac->ebc", Ji, w, Ji)
        Hjj = jnp.einsum("eab,e,eac->ebc", Jj, w, Jj)
        Hij = jnp.einsum("eab,e,eac->ebc", Ji, w, Jj)
        H = H.at[edges.i, edges.i].add(Hii)
        H = H.at[edges.j, edges.j].add(Hjj)
        H = H.at[edges.i, edges.j].add(Hij)
        H = H.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 6), r.dtype)
        b = b.at[edges.i].add(-jnp.einsum("eab,e,ea->eb", Ji, w, r))
        b = b.at[edges.j].add(-jnp.einsum("eab,e,ea->eb", Jj, w, r))
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        # Gauge: identity blocks for fixed poses.
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(6, dtype=r.dtype)[None]
            * (fixed.astype(r.dtype)[:, None, None] * 1e6 + 1e-6)
        )
        return H, b, chi2

    def body(carry, _):
        pose7, chi2_old = carry
        H, b, chi2 = compute(pose7)
        Hm = H.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        dx = jnp.linalg.solve(
            Hm + 1e-6 * jnp.eye(K * 6, dtype=Hm.dtype), b.reshape(-1)
        ).reshape(K, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * (~fixed)[:, None]
        p_new = jax.vmap(se3m.boxplus)(SE3.from_params7(pose7), dx)
        pose7_new = p_new.params7()
        _, _, chi2_new = compute(pose7_new)
        accept = chi2_new < chi2
        return (
            jnp.where(accept, pose7_new, pose7),
            jnp.where(accept, chi2_new, chi2),
        ), chi2

    (pose7, chi2), _ = jax.lax.scan(
        body, (poses.params7(), jnp.asarray(jnp.inf, poses.t.dtype)),
        None, length=n_iter,
    )
    return SE3.from_params7(pose7), chi2


class Sim3Edges(NamedTuple):
    """Edges of a 7-DoF similarity pose graph (monocular loop closure:
    scale drift is a free variable per keyframe, so the loop correction
    can absorb it — ORB-SLAM's essential-graph formulation.  The
    reference never got here; its loop_closing.h:5-7 is empty)."""

    i: jnp.ndarray        # [E] int32 source keyframe index
    j: jnp.ndarray        # [E] int32 target keyframe index
    S_ji8: jnp.ndarray    # [E, 8] measured S_j * S_i^-1 (params8)
    weight: jnp.ndarray   # [E] information scale
    mask: jnp.ndarray     # [E] bool


def edge_residuals_sim3(poses: "sim3m.Sim3", edges: Sim3Edges):
    """[E, 7] residual log( S_meas * S_i * S_j^-1 ) per edge."""
    Si = jax.tree.map(lambda a: a[edges.i], poses)
    Sj = jax.tree.map(lambda a: a[edges.j], poses)
    S_meas = sim3m.Sim3.from_params8(edges.S_ji8)
    return sim3m.log(S_meas.compose(Si).compose(Sj.inverse()))


def optimize_sim3(
    poses: "sim3m.Sim3",
    edges: Sim3Edges,
    fixed: jnp.ndarray,
    n_iter: int = 20,
) -> tuple["sim3m.Sim3", jnp.ndarray]:
    """GN Sim(3) pose-graph solve; returns (poses, final chi2).

    Identical structure to the SE(3) `optimize` with 7-dim tangent
    blocks: J_i = Ad(S_meas), J_j = -Ad(S_meas Si Sj^-1), dense
    [7K, 7K] normal equations, gauge fixed via `fixed` (at least one
    pose must be fixed to pin both the rigid gauge AND global scale).
    """
    K = poses.t.shape[0]

    def compute(pose8):
        p = sim3m.Sim3.from_params8(pose8)
        r = edge_residuals_sim3(p, edges)               # [E, 7]
        Si = jax.tree.map(lambda a: a[edges.i], p)
        Sj = jax.tree.map(lambda a: a[edges.j], p)
        S_meas = sim3m.Sim3.from_params8(edges.S_ji8)
        Ji = sim3m.adjoint(S_meas)                      # [E, 7, 7]
        Jj = -sim3m.adjoint(S_meas.compose(Si).compose(Sj.inverse()))
        w = jnp.where(edges.mask, edges.weight, 0.0)
        free = (~fixed).astype(r.dtype)
        Ji = Ji * free[edges.i][:, None, None]
        Jj = Jj * free[edges.j][:, None, None]
        H = jnp.zeros((K, K, 7, 7), r.dtype)
        Hii = jnp.einsum("eab,e,eac->ebc", Ji, w, Ji)
        Hjj = jnp.einsum("eab,e,eac->ebc", Jj, w, Jj)
        Hij = jnp.einsum("eab,e,eac->ebc", Ji, w, Jj)
        H = H.at[edges.i, edges.i].add(Hii)
        H = H.at[edges.j, edges.j].add(Hjj)
        H = H.at[edges.i, edges.j].add(Hij)
        H = H.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7), r.dtype)
        b = b.at[edges.i].add(-jnp.einsum("eab,e,ea->eb", Ji, w, r))
        b = b.at[edges.j].add(-jnp.einsum("eab,e,ea->eb", Jj, w, r))
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.eye(7, dtype=r.dtype)[None]
            * (fixed.astype(r.dtype)[:, None, None] * 1e6 + 1e-6)
        )
        return H, b, chi2

    def body(carry, _):
        pose8, chi2_old = carry
        H, b, chi2 = compute(pose8)
        Hm = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        dx = jnp.linalg.solve(
            Hm + 1e-6 * jnp.eye(K * 7, dtype=Hm.dtype), b.reshape(-1)
        ).reshape(K, 7)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * (~fixed)[:, None]
        p_new = jax.vmap(sim3m.boxplus)(
            sim3m.Sim3.from_params8(pose8), dx
        )
        pose8_new = p_new.params8()
        _, _, chi2_new = compute(pose8_new)
        accept = chi2_new < chi2
        return (
            jnp.where(accept, pose8_new, pose8),
            jnp.where(accept, chi2_new, chi2),
        ), chi2

    (pose8, chi2), _ = jax.lax.scan(
        body, (poses.params8(), jnp.asarray(jnp.inf, poses.t.dtype)),
        None, length=n_iter,
    )
    return sim3m.Sim3.from_params8(pose8), chi2


def sim3_edges_from_covisibility(
    kf_pose7: jnp.ndarray,
    cov_weight: jnp.ndarray,
    kf_valid: jnp.ndarray,
    min_weight: int = 10,
) -> Sim3Edges:
    """Lift the SE(3) covisibility/odometry edges into Sim(3) with
    unit relative scale (odometry measures no scale change; only loop
    edges carry one)."""
    e = edges_from_covisibility(kf_pose7, cov_weight, kf_valid, min_weight)
    T = SE3.from_params7(e.T_ji7)
    return Sim3Edges(
        i=e.i, j=e.j,
        S_ji8=sim3m.Sim3.from_se3(T).params8(),
        weight=e.weight, mask=e.mask,
    )


def correct_landmarks_sim3(
    pt_pos: jnp.ndarray,       # [L, 3]
    anchor_kf: jnp.ndarray,    # [L] keyframe index each landmark rides
    old_pose7: jnp.ndarray,    # [K, 7] pre-correction T_cw
    new_sim38: jnp.ndarray,    # [K, 8] corrected S_cw
) -> jnp.ndarray:
    """Re-anchor landmarks after a Sim(3) correction:
    p' = S_cw_new^-1 ( T_cw_old (p) ) — each landmark moves (and
    RESCALES) with its anchor keyframe, exactly ORB-SLAM's
    CorrectLoop map-point update."""
    a = jnp.clip(anchor_kf, 0, old_pose7.shape[0] - 1)
    T_old = SE3.from_params7(old_pose7[a])
    S_new = sim3m.Sim3.from_params8(new_sim38[a])
    return S_new.inverse().apply(T_old.apply(pt_pos))


def edges_from_covisibility(
    kf_pose7: jnp.ndarray,
    cov_weight: jnp.ndarray,
    kf_valid: jnp.ndarray,
    min_weight: int = 10,
) -> PoseGraphEdges:
    """Build odometry/covisibility edges from the current map: one edge
    per keyframe pair with covisibility above `min_weight`, measured at
    the current relative pose (the pre-loop configuration)."""
    K = kf_valid.shape[0]
    ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
    upper = ii < jj
    mask = (
        upper
        & kf_valid[ii] & kf_valid[jj]
        & (cov_weight >= min_weight)
    )
    poses = SE3.from_params7(kf_pose7)
    Ti = jax.tree.map(lambda a: a[ii.reshape(-1)], poses)
    Tj = jax.tree.map(lambda a: a[jj.reshape(-1)], poses)
    T_ji = Tj.compose(Ti.inverse())
    w = jnp.sqrt(jnp.maximum(cov_weight.astype(jnp.float32), 1.0))
    return PoseGraphEdges(
        i=ii.reshape(-1).astype(jnp.int32),
        j=jj.reshape(-1).astype(jnp.int32),
        T_ji7=T_ji.params7(),
        weight=w.reshape(-1),
        mask=mask.reshape(-1),
    )
