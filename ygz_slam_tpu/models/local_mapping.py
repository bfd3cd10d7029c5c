"""Local mapping: keyframe processing, new-landmark triangulation,
windowed local BA, and map-point culling — the backend pass.

TPU-native replacement for the reference's LocalMapping module
(src/Module/LocalMapping.cpp): ProcessNewKeyFrame/covisibility
(:338-346), MapPointCulling (:348-373), CreateNewMapPoints (:375-571:
epipolar BoW match -> parallax check -> two-view triangulation ->
reprojection gate -> create), LocalBA (:149-208 -> ba::LocalBAG2O).

All steps are pure functions over MapState with fixed shapes; the
host-side MapServer (map/memory.py) only decides slot indices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.triangulation import depth_from_triangulation
from ..map import state as ms
from ..ops import hamming
from ..solvers import ba as bam


def match_new_features_for_triangulation(
    cam,
    desc_new, px_new, valid_new, T_new: SE3,
    desc_ref, px_ref, valid_ref, T_ref: SE3,
    max_dist: int = 50,
    epipolar_sigma: float = 1.5,
    min_parallax_cos: float = 0.9998,
    angle_new=None, angle_ref=None,
):
    """Descriptor-match unlinked features of a new keyframe against a
    neighbor keyframe, gate by the known epipolar geometry, and
    triangulate (Matcher::SearchForTriangulation + the triangulation
    core of CreateNewMapPoints; the BoW gating is replaced by the
    batched Hamming matrix, the known relative pose by construction).

    Returns (pos_world [N,3], good [N], ref_idx [N]) for the new KF's
    feature rows.
    """
    idx, ok = hamming.match_nn(
        desc_new, desc_ref, valid_new, valid_ref, max_dist=max_dist,
        ratio=0.9,
    )
    idx_safe = jnp.clip(idx, 0, px_ref.shape[0] - 1)
    if angle_new is not None and angle_ref is not None:
        # Rotation-histogram consistency (the gate the reference
        # applies inside SearchForTriangulation, Matcher.cpp:294-336):
        # matches whose ORB-angle delta is off the dominant modes are
        # mismatches even when descriptors agree.
        ok = hamming.rotation_consistency(
            angle_new, angle_ref[idx_safe], ok
        )
    p_ref = px_ref[idx_safe]
    # Epipolar check from known poses: distance of ref match to the
    # epipolar line of the new feature (CheckDistEpipolarLine,
    # Matcher.cpp:338-354, with geometric rather than BoW gating).
    T_rn = T_ref.compose(T_new.inverse())
    f_new = cam.pixel_to_bearing(px_new)
    f_ref = cam.pixel_to_bearing(p_ref)
    # Essential matrix E = [t]x R for T_ref<-new.
    from ..geometry import so3 as so3m
    E = so3m.hat(T_rn.t) @ T_rn.R
    l_ref = jnp.einsum("ij,nj->ni", E, f_new)        # epipolar plane normal
    # Angular distance of ref bearing from the epipolar plane.
    dist = jnp.abs(jnp.sum(f_ref * l_ref, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(l_ref[:, :2], axis=-1), 1e-9
    )
    fx = cam.fx
    ep_ok = dist * fx < 3.0 * epipolar_sigma
    # Parallax + triangulation.
    T_nr = T_new.compose(T_ref.inverse())
    f_ref_n = cam.pixel_to_bearing(p_ref)
    depth_ref, tri_ok = depth_from_triangulation(T_nr, f_ref_n, f_new)
    cosp = jnp.sum(
        f_new * jnp.einsum("ij,nj->ni", T_nr.R, f_ref_n), axis=-1
    )
    pos_ref_cam = f_ref_n * depth_ref[:, None]
    pos_world = T_ref.inverse().apply(pos_ref_cam)
    # Reprojection gate in both views.
    pn = cam.world_to_pixel(pos_world, T_new)
    pr = cam.world_to_pixel(pos_world, T_ref)
    e_n = jnp.sum((pn - px_new) ** 2, axis=-1)
    e_r = jnp.sum((pr - p_ref) ** 2, axis=-1)
    z_new = T_new.apply(pos_world)[:, 2]
    good = (
        ok & ep_ok & tri_ok
        & (depth_ref > 0.05) & (z_new > 0.05)
        & (cosp < min_parallax_cos)
        & (e_n < bam.CHI2_2D) & (e_r < bam.CHI2_2D)
    )
    return pos_world, good, idx_safe


def search_in_neighbors(
    m: ms.MapState,
    cam,
    slot,
    max_dist: int = 50,
    radius: float = 6.0,
):
    """Fuse the new keyframe's unlinked features with existing
    landmarks: project every valid landmark into the keyframe, match
    descriptors within a pixel radius, and link (the reference's
    SearchInNeighbors stub, LocalMapping.cpp:573-576, given a real
    implementation).  Returns the updated MapState (jittable).

    Invariants enforced (the reference's Fuse semantics): a landmark
    the keyframe already observes is never re-linked, at most ONE
    feature links to any landmark (reverse-argmin uniqueness, which
    doubles as a cross-check), and ambiguous matches are dropped by a
    Lowe ratio test like every other matcher here."""
    T = m.kf_pose(slot)
    proj = cam.world_to_pixel(m.pt_pos, T)                  # [L, 2]
    z = T.apply(m.pt_pos)[:, 2]
    # Exclude landmarks this keyframe already observes.
    fp = m.feat_point[slot]
    fp_safe = jnp.clip(fp, 0, m.L - 1)
    # .max (logical OR) scatter: duplicate indices (all unlinked rows
    # clip to 0) must not overwrite a True with a False.
    observed_here = (
        jnp.zeros(m.L, jnp.int32)
        .at[fp_safe]
        .max((m.feat_valid[slot] & (fp >= 0)).astype(jnp.int32))
        > 0
    )
    cand = m.pt_valid & (z > 0.05) & (~observed_here)
    f_px = m.feat_px[slot]                                  # [F, 2]
    f_free = m.feat_valid[slot] & (fp < 0)
    # Pairwise pixel distance gate [F, L] + descriptor distance.
    d2 = jnp.sum((f_px[:, None, :] - proj[None, :, :]) ** 2, axis=-1)
    near = d2 < radius * radius
    dd = hamming.distance_matrix(m.feat_desc[slot], m.pt_desc)
    BIG = jnp.int32(1 << 14)
    dd = jnp.where(near & cand[None, :] & f_free[:, None], dd, BIG)
    best = jnp.argmin(dd, axis=1)
    best_d = jnp.min(dd, axis=1)
    # Lowe ratio against the second-best candidate.
    dd2 = dd.at[jnp.arange(dd.shape[0]), best].set(BIG)
    second_d = jnp.min(dd2, axis=1)
    # One feature per landmark: the reverse argmin must point back.
    rev_best = jnp.argmin(dd, axis=0)                       # [L]
    mutual = rev_best[best] == jnp.arange(dd.shape[0])
    link = (
        f_free
        & (best_d <= max_dist)
        & (best_d.astype(jnp.float32) < 0.9 * second_d.astype(jnp.float32))
        & mutual
    )
    new_fp = jnp.where(link, best.astype(jnp.int32), fp)
    new_fd = jnp.where(link, z[best], m.feat_depth[slot])
    return m._replace(
        feat_point=m.feat_point.at[slot].set(new_fp),
        feat_depth=m.feat_depth.at[slot].set(new_fd),
    )


class MappingResult(NamedTuple):
    map: ms.MapState
    n_culled: jnp.ndarray
    ba_chi2: jnp.ndarray


def map_point_culling(
    m: ms.MapState,
    min_found_ratio: float = 0.25,
    min_obs: int = 2,
    grace_kf: int = 2,
    current_kf_slot: int | jnp.ndarray = 0,
) -> ms.MapState:
    """Invalidate unreliable landmarks (MapPointCulling,
    LocalMapping.cpp:348-373): found-ratio below 0.25, or too few
    observing keyframes after a grace period."""
    ratio_bad = m.found_ratio() < min_found_ratio
    seen_enough = m.pt_visible >= 4  # only judge ratio with evidence
    obs_bad = (m.pt_obs < min_obs) & (m.pt_visible >= 2 + grace_kf)
    cull = m.pt_valid & ((ratio_bad & seen_enough) | obs_bad)
    pt_valid = m.pt_valid & (~cull)
    # Unlink culled landmarks from features.
    pt_safe = jnp.clip(m.feat_point, 0, m.L - 1)
    linked_ok = pt_valid[pt_safe] & (m.feat_point >= 0)
    feat_point = jnp.where(linked_ok, m.feat_point, -1)
    return m._replace(pt_valid=pt_valid, feat_point=feat_point)


def local_ba_on_map(
    m: ms.MapState,
    cam,
    fixed_slots: jnp.ndarray,   # [K] bool — gauge-fixed keyframes
    n_iter: int = 10,
) -> tuple[ms.MapState, jnp.ndarray]:
    """Windowed BA over every valid keyframe + landmark in the map
    (LocalMapping::LocalBA -> ba::LocalBAG2O, BA.cpp:386-543), writing
    the optimized poses/points back into MapState.

    Returns (updated map, chi2)."""
    kf_idx, pt_idx, px, mask = ms.observations_from_features(m)
    obs = bam.Observations(kf_idx=kf_idx, pt_idx=pt_idx, px=px, mask=mask)
    poses = m.kf_pose()
    fixed = fixed_slots | (~m.kf_valid)
    res = bam.local_ba(poses, m.pt_pos, obs, cam, fixed, n_iter=n_iter)
    new_pose7 = res.poses.params7()
    # Only valid keyframes/points move.
    pose7 = jnp.where(m.kf_valid[:, None], new_pose7, m.kf_pose7)
    pts = jnp.where(m.pt_valid[:, None], res.points, m.pt_pos)
    return m._replace(kf_pose7=pose7, pt_pos=pts), res.chi2


def keyframe_culling_scores(m: ms.MapState) -> jnp.ndarray:
    """Redundancy score per keyframe: fraction of its landmarks seen by
    >= 3 other keyframes (KeyFrameCulling's 90% rule,
    LocalMapping.cpp:579-618).  The host evicts slots scoring > 0.9."""
    pt_safe = jnp.clip(m.feat_point, 0, m.L - 1)
    linked = m.feat_valid & (m.feat_point >= 0) & m.pt_valid[pt_safe]
    obs_counts = m.pt_obs[pt_safe]
    redundant = linked & (obs_counts >= 4)  # self + 3 others
    n_linked = jnp.maximum(jnp.sum(linked, axis=1), 1)
    return jnp.sum(redundant, axis=1) / n_linked
