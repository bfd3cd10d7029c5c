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

from functools import partial
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
    feat_angle_flat=None,  # [K*F] ORB angles (rotation gate when given)
    q_angle=None,
    top_c: int = 3,
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
    # Evaluate the top_c BoW candidates (BoW similarity alone is not
    # discriminative enough in self-similar scenes; ORB-SLAM's
    # relocalization also geometrically checks several candidates).
    _, cand_kfs = jax.lax.top_k(scores, top_c)

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
        if q_angle is not None and feat_angle_flat is not None:
            from ..ops import hamming as _h
            ok = _h.rotation_consistency(
                q_angle, feat_angle_flat[rows][idx_safe], ok
            )
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


def relocalize_archive(
    vocab: voc.Vocabulary,
    cam,
    q_desc, q_px, q_valid,
    arc,                    # map.archive.ArchiveView
    min_inliers: int = 20,
    q_angle=None,
    top_c: int = 3,
) -> RelocResult:
    """Relocalization against the ARCHIVED (evicted) keyframes — the
    global-map tier the reference gets for free from its keep-everything
    Memory singleton (include/ygz/Basic/Memory.h:16-56).  Jittable;
    retraced only when the archive capacity doubles.

    Same recipe as `relocalize`, but candidate landmarks come from the
    per-feature world positions snapshotted at eviction time
    (ArchiveView.pt_pos/pt_ok), so no live landmark slots are needed.
    Returned kf_slot is the ARCHIVE row index.
    """
    F = arc.nodes.shape[1]
    words, nodes = voc.transform(vocab, q_desc, q_valid)
    q_bow = voc.bow_vector(vocab, words, q_valid)
    scores = voc.score_l1(q_bow[None, :], arc.bow)
    scores = jnp.where(arc.valid, scores, -1.0)
    _, cand = jax.lax.top_k(scores, top_c)

    def try_candidate(a):
        c_valid = arc.feat_valid[a] & arc.pt_ok[a]
        idx, ok = voc.match_by_nodes(
            q_desc, nodes, q_valid, arc.desc[a], arc.nodes[a], c_valid,
            max_dist=64, ratio=1.0,
        )
        idx_safe = jnp.clip(idx, 0, F - 1)
        if q_angle is not None and arc.angle is not None:
            from ..ops import hamming as _h
            ok = _h.rotation_consistency(
                q_angle, arc.angle[a][idx_safe], ok
            )
        match_pts = arc.pt_pos[a][idx_safe]
        T_init = SE3.from_params7(arc.pose7[a])
        T_opt, inlier, _ = pose_only_ba(T_init, match_pts, q_px, ok, cam)
        return T_opt.params7(), jnp.sum(inlier)

    cand_T7, cand_inl = jax.vmap(try_candidate)(cand)
    best_c = jnp.argmax(cand_inl)
    n_inl = cand_inl[best_c]
    return RelocResult(
        success=n_inl >= min_inliers,
        T_cw=SE3.from_params7(cand_T7[best_c]),
        n_inliers=n_inl,
        kf_slot=cand[best_c],
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
    feat_angle_flat=None,
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
    if feat_angle_flat is not None:
        from ..ops import hamming as _h
        ok = _h.rotation_consistency(
            feat_angle_flat[q_rows],
            feat_angle_flat[c_rows][idx_safe], ok,
        )
    match_pts = pt_pos[pt_safe[idx_safe]]
    T_init = SE3.from_params7(kf_pose7[new_slot])
    T_opt, inlier, _ = pose_only_ba(T_init, match_pts, q_px, ok, cam)
    n_inl = jnp.sum(inlier)
    found = plausible & (n_inl >= min_inliers)
    T_loop = T_opt.compose(SE3.from_params7(kf_pose7[best]).inverse())
    return LoopResult(
        found=found, loop_kf=best, T_loop7=T_loop.params7()
    )


def detect_loop_archive(
    vocab: voc.Vocabulary,
    cam,
    new_slot,
    new_frame_id,
    kf_bow, kf_valid, cov_weight,
    feat_desc_flat, feat_nodes_flat, feat_px_flat, feat_valid_flat,
    kf_pose7,
    arc,                    # map.archive.ArchiveView
    min_frame_gap: int = 50,
    min_inliers: int = 25,
    min_score_ratio: float = 0.75,
    feat_angle_flat=None,
) -> LoopResult:
    """Loop detection for a new keyframe against the ARCHIVE — the
    long-trajectory loops (hundreds of keyframes between revisits) that
    the active [K, K] window cannot represent.  Jittable.

    Candidates must be at least `min_frame_gap` frames older than the
    new keyframe (archived entries are never covisible with the active
    window by construction, but recently evicted ones can still be
    spatially adjacent — the temporal gap replaces ORB-SLAM's
    not-covisible gate).  The normalizing score is the best covisible
    score within the active window, as in `detect_loop`.  The returned
    loop_kf is the ARCHIVE row index.
    """
    K = kf_valid.shape[0]
    F = arc.nodes.shape[1]
    v_new = kf_bow[new_slot]
    # Normalizer from the active window's covisible neighbours.
    s_act = voc.score_l1(v_new[None, :], kf_bow)
    covis = cov_weight[new_slot] > 0
    is_self = jnp.arange(K) == new_slot
    s_cov = jnp.where(covis & kf_valid & (~is_self), s_act, -1.0)
    s_ref = jnp.maximum(jnp.max(s_cov), 0.05)
    # Archive candidates.
    scores = voc.score_l1(v_new[None, :], arc.bow)
    gap_ok = arc.frame_id < (new_frame_id - min_frame_gap)
    cand_scores = jnp.where(arc.valid & gap_ok, scores, -1.0)
    best = jnp.argmax(cand_scores)
    plausible = cand_scores[best] > min_score_ratio * s_ref
    # Geometric verification against the candidate's archived points.
    Fq = feat_valid_flat.shape[0] // K
    q_rows = new_slot * Fq + jnp.arange(Fq)
    q_desc = feat_desc_flat[q_rows]
    q_nodes = feat_nodes_flat[q_rows]
    q_px = feat_px_flat[q_rows]
    q_valid = feat_valid_flat[q_rows]
    c_valid = arc.feat_valid[best] & arc.pt_ok[best]
    idx, ok = voc.match_by_nodes(
        q_desc, q_nodes, q_valid, arc.desc[best], arc.nodes[best],
        c_valid, max_dist=50, ratio=0.85,
    )
    idx_safe = jnp.clip(idx, 0, F - 1)
    if feat_angle_flat is not None:
        from ..ops import hamming as _h
        ok = _h.rotation_consistency(
            feat_angle_flat[q_rows], arc.angle[best][idx_safe], ok
        )
    match_pts = arc.pt_pos[best][idx_safe]
    T_init = SE3.from_params7(kf_pose7[new_slot])
    T_opt, inlier, _ = pose_only_ba(T_init, match_pts, q_px, ok, cam)
    n_inl = jnp.sum(inlier)
    found = plausible & (n_inl >= min_inliers)
    T_loop = T_opt.compose(SE3.from_params7(arc.pose7[best]).inverse())
    return LoopResult(
        found=found, loop_kf=best, T_loop7=T_loop.params7()
    )


def apply_global_correction(mstate, new_pose7):
    """Write globally corrected active keyframe poses into MapState and
    re-anchor landmarks by their creating keyframe's pose change
    (p' = T_new^-1 T_old p); jittable."""
    m = mstate
    K = m.kf_pose7.shape[0]
    anchor = jnp.clip(m.pt_first_kf, 0, K - 1)
    T_old = SE3.from_params7(m.kf_pose7[anchor])
    T_new = SE3.from_params7(new_pose7[anchor])
    p_cam = T_old.apply(m.pt_pos)
    p = T_new.inverse().apply(p_cam)
    p = jnp.where(m.pt_valid[:, None], p, m.pt_pos)
    return m._replace(kf_pose7=new_pose7, pt_pos=p)


@partial(jax.jit, static_argnames=("n_iter",))
def _pg_solve_padded(pose7, e_i, e_j, e_T7, e_w, e_mask, fixed,
                     n_iter: int):
    edges = pg.PoseGraphEdges(e_i, e_j, e_T7, e_w, e_mask)
    p, chi2 = pg.optimize(
        SE3.from_params7(pose7), edges, fixed, n_iter=n_iter
    )
    return p.params7(), chi2


def _next_pow2(n: int, lo: int = 16) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def close_loop_global(
    arc_pose7,            # [A, 7] np — archived poses (insertion order)
    arc_frame_id,         # [A] np
    act_pose7,            # [Ka, 7] np — active poses (kf_used order)
    act_frame_id,         # [Ka] np
    act_cov,              # [Ka, Ka] np covisibility among those actives
    loop_arc_idx: int,    # archive row of the verified loop keyframe
    new_act_idx: int,     # index into act_* of the new keyframe
    T_loop7,              # [7] measured T_new * T_arc^-1
    n_iter: int = 25,
):
    """Global pose-graph over the WHOLE trajectory (archive + active):
    sequential odometry edges between temporally consecutive keyframes
    + active covisibility edges + the loop edge, anchored on the
    archived loop keyframe.  Host-side graph assembly (numpy, keyframe
    rate), one jitted padded GN solve (shape-cached per power-of-2
    node/edge capacity).

    Returns (arc_pose7_new [A, 7], act_pose7_new [Ka, 7], chi2).
    """
    import numpy as np

    A = arc_pose7.shape[0]
    Ka = act_pose7.shape[0]
    N = A + Ka
    ids = np.concatenate([arc_frame_id, act_frame_id])
    pose7 = np.concatenate([arc_pose7, act_pose7]).astype(np.float32)
    order = np.argsort(ids, kind="stable")     # temporal order
    # Sequential odometry edges at the current relative poses.
    si = order[:-1].astype(np.int32)
    sj = order[1:].astype(np.int32)
    from ..utils import np_se3
    T_ji_seq = np_se3.relative7(pose7[sj], pose7[si]).astype(np.float32)
    w_seq = np.full(len(si), 1.0, np.float32)
    # Active covisibility edges (indices offset by A).
    ai, aj = np.nonzero(np.triu(act_cov, 1) >= 10)
    ci = (A + ai).astype(np.int32)
    cj = (A + aj).astype(np.int32)
    T_ji_cov = np_se3.relative7(pose7[cj], pose7[ci]).astype(np.float32)
    w_cov = np.sqrt(np.maximum(act_cov[ai, aj], 1.0)).astype(np.float32)
    # Loop edge.
    li = np.asarray([loop_arc_idx], np.int32)
    lj = np.asarray([A + new_act_idx], np.int32)
    T_ji_loop = np.asarray(T_loop7, np.float32)[None]
    w_loop = np.asarray([10.0], np.float32)
    e_i = np.concatenate([si, ci, li])
    e_j = np.concatenate([sj, cj, lj])
    e_T7 = np.concatenate([T_ji_seq, T_ji_cov, T_ji_loop])
    e_w = np.concatenate([w_seq, w_cov, w_loop])
    E = len(e_i)
    # Pad nodes and edges to power-of-2 capacities (shape-cached jit).
    P = _next_pow2(N)
    EP = _next_pow2(E)
    pose7_p = np.tile(
        np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (P, 1)
    )
    pose7_p[:N] = pose7
    fixed = np.ones(P, bool)
    fixed[:N] = False
    fixed[loop_arc_idx] = True
    pad = lambda a, fill: np.concatenate(
        [a, np.full((EP - E,) + a.shape[1:], fill, a.dtype)]
    )
    e_mask = np.zeros(EP, bool)
    e_mask[:E] = True
    ident7 = np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32)
    e_T7_p = np.concatenate([e_T7, np.tile(ident7, (EP - E, 1))])
    out7, chi2 = _pg_solve_padded(
        jnp.asarray(pose7_p), jnp.asarray(pad(e_i, 0)),
        jnp.asarray(pad(e_j, 0)), jnp.asarray(e_T7_p),
        jnp.asarray(pad(e_w, 0.0)), jnp.asarray(e_mask),
        jnp.asarray(fixed), n_iter=n_iter,
    )
    out7 = np.asarray(out7)[:N]
    return out7[:A], out7[A:], float(chi2)


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
