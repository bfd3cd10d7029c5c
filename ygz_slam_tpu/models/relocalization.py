"""Relocalization and loop closing over the BoW vocabulary.

Closes two reference TODOs:
- relocalization on tracking loss: the empty branch in
  VisualOdometry::AddFrame (src/Module/VisualOdometry.cpp:101-104
  "TODO 尝试重定位");
- loop closing: the placeholder class include/ygz/loop_closing.h:5-7.

Both follow the ORB-SLAM recipe the reference intended: BoW similarity
against keyframes -> node-gated descriptor matching -> geometric
verification (robust pose solve against the candidate's landmarks) ->
for loops, a pose-graph solve over covisibility+loop edges with
landmark re-anchoring.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..map import vocabulary as voc
from ..solvers import pose_graph as pg
from ..solvers.ba import pose_only_ba


class RelocResult(NamedTuple):
    success: jnp.ndarray    # bool
    T_cw: SE3
    n_inliers: jnp.ndarray
    kf_slot: jnp.ndarray    # matched keyframe


def relocalize(
    vocab: voc.Vocabulary,
    cam,
    # query frame
    q_desc, q_px, q_valid,
    # map side
    kf_bow,            # [K, W] BoW vectors per keyframe
    kf_valid,          # [K]
    kf_pose7,          # [K, 7]
    feat_desc_flat,    # [K*F, 8]
    feat_nodes_flat,   # [K*F] vocabulary mid-nodes
    feat_point_flat,   # [K*F] landmark links
    feat_valid_flat,   # [K*F]
    pt_pos,            # [L, 3]
    pt_valid,          # [L]
    min_inliers: int = 20,
) -> RelocResult:
    """One-shot relocalization attempt (jittable).

    1. BoW-score the query against every keyframe, take the best.
    2. Node-gated Hamming matching of query descriptors against that
       keyframe's landmark-bearing features.
    3. Robust pose-only BA from the keyframe's pose; accept on inlier
       count (the reference's TrackLocalMap gate logic).
    """
    K = kf_valid.shape[0]
    F = feat_valid_flat.shape[0] // K
    words, nodes = voc.transform(vocab, q_desc, q_valid)
    q_bow = voc.bow_vector(vocab, words, q_valid)
    scores = voc.score_l1(q_bow[None, :], kf_bow)          # [K]
    scores = jnp.where(kf_valid, scores, -1.0)
    # Evaluate the TOP_C BoW candidates (BoW similarity alone is not
    # discriminative enough in self-similar scenes; ORB-SLAM's
    # relocalization also geometrically checks several candidates).
    TOP_C = 3
    _, cand_kfs = jax.lax.top_k(scores, TOP_C)

    def try_candidate(kf):
        rows = kf * F + jnp.arange(F)
        c_desc = feat_desc_flat[rows]
        c_nodes = feat_nodes_flat[rows]
        c_point = feat_point_flat[rows]
        c_valid = feat_valid_flat[rows] & (c_point >= 0)
        pt_safe = jnp.clip(c_point, 0, pt_pos.shape[0] - 1)
        c_valid = c_valid & pt_valid[pt_safe]
        # Permissive matching (no ratio test): in self-similar scenes
        # the ratio test starves the matcher; the robust pose solve
        # (Tukey+MAD round + chi2 reclassification) does the rejection.
        idx, ok = voc.match_by_nodes(
            q_desc, nodes, q_valid, c_desc, c_nodes, c_valid,
            max_dist=64, ratio=1.0,
        )
        idx_safe = jnp.clip(idx, 0, F - 1)
        match_pts = pt_pos[pt_safe[idx_safe]]
        T_init = SE3.from_params7(kf_pose7[kf])
        T_opt, inlier, _ = pose_only_ba(T_init, match_pts, q_px, ok, cam)
        return T_opt.params7(), jnp.sum(inlier)

    cand_T7, cand_inl = jax.vmap(try_candidate)(cand_kfs)
    best_c = jnp.argmax(cand_inl)
    n_inl = cand_inl[best_c]
    success = n_inl >= min_inliers
    return RelocResult(
        success=success,
        T_cw=SE3.from_params7(cand_T7[best_c]),
        n_inliers=n_inl,
        kf_slot=cand_kfs[best_c],
    )


class LoopResult(NamedTuple):
    found: jnp.ndarray      # bool
    loop_kf: jnp.ndarray    # candidate keyframe slot
    T_loop7: jnp.ndarray    # verified relative pose T_new * T_loop^-1


def detect_loop(
    vocab: voc.Vocabulary,
    cam,
    new_slot,
    kf_bow, kf_valid, kf_pose7, cov_weight,
    feat_desc_flat, feat_nodes_flat, feat_px_flat,
    feat_point_flat, feat_valid_flat,
    pt_pos, pt_valid,
    min_inliers: int = 25,
    min_score_ratio: float = 0.75,
) -> LoopResult:
    """Loop candidate detection + geometric verification for a newly
    inserted keyframe (jittable).

    Candidates are keyframes NOT covisible with the new one whose BoW
    score beats `min_score_ratio` x the best covisible score (the
    ORB-SLAM normalization).  Verification: node-gated matching of the
    new KF's features against the candidate's landmarks + robust pose
    solve; the verified relative pose becomes the loop edge.
    """
    K = kf_valid.shape[0]
    F = feat_valid_flat.shape[0] // K
    v_new = kf_bow[new_slot]
    scores = voc.score_l1(v_new[None, :], kf_bow)
    covis = cov_weight[new_slot] > 0
    is_self = jnp.arange(K) == new_slot
    # Normalizing score: best among covisible neighbours.
    s_cov = jnp.where(covis & kf_valid & (~is_self), scores, -1.0)
    s_ref = jnp.maximum(jnp.max(s_cov), 0.05)
    cand_mask = kf_valid & (~covis) & (~is_self)
    cand_scores = jnp.where(cand_mask, scores, -1.0)
    best = jnp.argmax(cand_scores)
    plausible = cand_scores[best] > min_score_ratio * s_ref
    # Geometric verification against the candidate's landmarks.
    q_rows = new_slot * F + jnp.arange(F)
    q_desc = feat_desc_flat[q_rows]
    q_nodes = feat_nodes_flat[q_rows]
    q_px = feat_px_flat[q_rows]
    q_valid = feat_valid_flat[q_rows]
    c_rows = best * F + jnp.arange(F)
    c_desc = feat_desc_flat[c_rows]
    c_nodes = feat_nodes_flat[c_rows]
    c_point = feat_point_flat[c_rows]
    c_valid = feat_valid_flat[c_rows] & (c_point >= 0)
    pt_safe = jnp.clip(c_point, 0, pt_pos.shape[0] - 1)
    c_valid = c_valid & pt_valid[pt_safe]
    idx, ok = voc.match_by_nodes(
        q_desc, q_nodes, q_valid, c_desc, c_nodes, c_valid,
        max_dist=50, ratio=0.85,
    )
    idx_safe = jnp.clip(idx, 0, F - 1)
    match_pts = pt_pos[pt_safe[idx_safe]]
    T_init = SE3.from_params7(kf_pose7[new_slot])
    T_opt, inlier, _ = pose_only_ba(T_init, match_pts, q_px, ok, cam)
    n_inl = jnp.sum(inlier)
    found = plausible & (n_inl >= min_inliers)
    T_loop = T_opt.compose(SE3.from_params7(kf_pose7[best]).inverse())
    return LoopResult(
        found=found, loop_kf=best, T_loop7=T_loop.params7()
    )


def close_loop(
    kf_pose7, kf_valid, cov_weight,
    pt_pos, pt_valid, pt_first_kf,
    new_slot, loop: LoopResult,
    n_iter: int = 20,
):
    """Apply a verified loop: pose-graph optimization over covisibility
    edges + the loop edge, then re-anchor landmarks by their creating
    keyframe's correction (the standard map update after PGO).

    Returns (kf_pose7, pt_pos) corrected (jittable).
    """
    K = kf_valid.shape[0]
    edges = pg.edges_from_covisibility(kf_pose7, cov_weight, kf_valid)
    # Append the loop edge: i = loop_kf, j = new_slot, measured T_ji.
    loop_edge = pg.PoseGraphEdges(
        i=loop.loop_kf[None].astype(jnp.int32),
        j=jnp.full((1,), new_slot, jnp.int32),
        T_ji7=loop.T_loop7[None],
        weight=jnp.asarray([10.0], jnp.float32),
        mask=loop.found[None],
    )
    edges = pg.PoseGraphEdges(
        i=jnp.concatenate([edges.i, loop_edge.i]),
        j=jnp.concatenate([edges.j, loop_edge.j]),
        T_ji7=jnp.concatenate([edges.T_ji7, loop_edge.T_ji7]),
        weight=jnp.concatenate([edges.weight, loop_edge.weight]),
        mask=jnp.concatenate([edges.mask, loop_edge.mask]),
    )
    poses_old = SE3.from_params7(kf_pose7)
    fixed = jnp.zeros(K, bool).at[loop.loop_kf].set(True)
    poses_new, chi2 = pg.optimize(poses_old, edges, fixed, n_iter=n_iter)
    # Landmark re-anchoring: p' = T_new_anchor^-1 * T_old_anchor * p.
    anchor = jnp.clip(pt_first_kf, 0, K - 1)
    T_old_a = jax.tree.map(lambda a: a[anchor], poses_old)
    T_new_a = jax.tree.map(lambda a: a[anchor], poses_new)
    p_cam = T_old_a.apply(pt_pos)
    pt_new = T_new_a.inverse().apply(p_cam)
    pt_new = jnp.where(pt_valid[:, None], pt_new, pt_pos)
    pose7_out = jnp.where(
        loop.found, poses_new.params7(), kf_pose7
    )
    pt_out = jnp.where(loop.found, pt_new, pt_pos)
    return pose7_out, pt_out, chi2
