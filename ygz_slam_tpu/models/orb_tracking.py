"""Feature-based (SPARSE_ORB) frame tracking.

The reference's legacy System facade declares three VO types
(include/ygz/system.h:26-30): SPARSE_DIRECT (the implemented path),
SPARSE_ORB ("sparse feature method, like ORB") and SEMI_DENSE_DIRECT
("semi-dense method, like LSD").  Only the first was ever wired up;
this module provides the second as a first-class TPU-native tracker.

Method (ORB-SLAM-style TrackWithMotionModel, the design SPARSE_ORB
names): detect ORB features on the current frame, project map
landmarks at the motion-model pose, match each landmark's
representative descriptor (MapPoint::_distinctive_desc — computed but
commented out in the reference, src/Basic/MapPoint.cpp:10-47; kept
live here as MapState.pt_desc) against detected features inside a
search window, then pose-only BA; a second, tighter match/BA pass at
the refined pose.  Everything is one fused fixed-shape computation:
the [L, F] Hamming matrix replaces per-landmark grid buckets, and the
search window is a mask on that matrix rather than a candidate list.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..ops.hamming import distance_matrix, rotation_consistency
from ..ops.interp import in_bounds
from ..solvers.ba import pose_only_ba
from .frontend import Features, TrackMapResult

_BIG = jnp.int32(1 << 14)


def match_by_projection(
    cam,
    T_cw: SE3,
    pt_pos,              # [L, 3]
    pt_valid,            # [L]
    pt_desc,             # [L, 8] uint32
    feats: Features,     # F detected features on the current frame
    radius: float = 15.0,
    max_dist: int = 50,
    ratio: float = 0.9,
    pt_angle=None,       # [L] reference-observation ORB angle; when
                         # given, the rotation-histogram gate rejects
                         # matches off the dominant rotation modes
                         # (ComputeThreeMaxima, Matcher.cpp:294-336)
):
    """SearchByProjection: landmark -> best detected feature in a
    pixel window around its projection.

    Mirrors the acceptance rules of the reference's descriptor
    matching (best <= TH_LOW=50, best < ratio * second-best,
    Matcher.cpp:250-283) with a projection window instead of BoW
    nodes, plus a feature-side cross-check (each feature is claimed by
    at most one landmark — the duplicate-erase loop of ORB-style
    SearchByProjection).

    Returns (matched [L] bool, obs_px [L, 2], in_view [L] bool).
    """
    pc = T_cw.apply(pt_pos)
    px_proj = cam.camera_to_pixel(pc)
    in_view = pt_valid & (pc[:, 2] > 0.05)

    d = distance_matrix(pt_desc, feats.desc)             # [L, F]
    # Window gate: feature must lie within `radius` px of the
    # projection (scaled by the feature's pyramid level, as the
    # reference windows scale with octave).
    r = radius * (2.0 ** feats.level.astype(jnp.float32))  # [F]
    d2px = jnp.sum(
        (px_proj[:, None, :] - feats.px[None, :, :]) ** 2, axis=-1
    )
    ok_pair = (
        in_view[:, None]
        & feats.valid[None, :]
        & (d2px <= (r * r)[None, :])
    )
    d = jnp.where(ok_pair, d, _BIG)

    best_idx = jnp.argmin(d, axis=1)                     # [L]
    best = jnp.min(d, axis=1)
    d_no_best = d.at[jnp.arange(d.shape[0]), best_idx].set(_BIG)
    second = jnp.min(d_no_best, axis=1)
    matched = (
        (best <= max_dist)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    )
    if pt_angle is not None:
        matched = rotation_consistency(
            pt_angle, feats.angle[best_idx], matched
        )
    # Cross-check: a feature keeps only the landmark that matches it
    # best (ties broken by landmark index via argmin).
    db = jnp.where(matched[:, None], d, _BIG)
    best_rev = jnp.argmin(db, axis=0)                    # [F]
    matched = matched & (best_rev[best_idx] == jnp.arange(d.shape[0]))
    obs_px = feats.px[best_idx]
    return matched, obs_px, in_view


def track_map_orb(
    cur_shape: tuple[int, int],
    cam,
    T_pred: SE3,
    pt_pos,
    pt_valid,
    pt_desc,
    feats: Features,
    radius_coarse: float = 15.0,
    radius_fine: float = 6.0,
    max_dist: int = 50,
    pt_angle=None,
    max_step_motion: float = 0.2,
) -> TrackMapResult:
    """Two-pass projection matching + pose-only BA (the SPARSE_ORB
    frame tracker).  Output contract matches frontend.track_local_map
    so the VO state machine is tracker-agnostic."""
    Hh, Ww = cur_shape
    pc = T_pred.apply(pt_pos)
    px0 = cam.camera_to_pixel(pc)
    vis = pt_valid & (pc[:, 2] > 0.05) & in_bounds(px0, Hh, Ww, margin=8.0)

    m1, obs1, _ = match_by_projection(
        cam, T_pred, pt_pos, pt_valid, pt_desc, feats,
        radius=radius_coarse, max_dist=max_dist, pt_angle=pt_angle,
    )
    m1 = m1 & vis
    T1, inl1, _ = pose_only_ba(T_pred, pt_pos, obs1, m1, cam)
    # Second pass at the refined pose with a tighter window.
    m2, obs2, _ = match_by_projection(
        cam, T1, pt_pos, pt_valid, pt_desc, feats,
        radius=radius_fine, max_dist=max_dist, pt_angle=pt_angle,
    )
    pc2 = T1.apply(pt_pos)
    vis2 = (
        pt_valid & (pc2[:, 2] > 0.05)
        & in_bounds(cam.camera_to_pixel(pc2), Hh, Ww, margin=8.0)
    )
    m2 = m2 & vis2
    # Fall back to pass-1 matches if the tighter pass lost a landmark.
    use2 = m2
    obs = jnp.where(use2[:, None], obs2, obs1)
    matched = use2 | m1
    T2, inlier, _chi2 = pose_only_ba(T1, pt_pos, obs, matched, cam)
    # Whole-step motion sanity gate (see frontend.track_local_map):
    # an aliased solve far from the prediction reports failure.
    from ..geometry import se3 as se3m
    step = jnp.linalg.norm(se3m.log(T2.compose(T_pred.inverse())))
    sane = step <= max_step_motion
    inlier = inlier & sane
    T_out = jax.tree.map(
        lambda a, b: jnp.where(sane, a, b), T2, T_pred
    )
    return TrackMapResult(
        T_cw=T_out,
        n_inliers=jnp.sum(inlier),
        candidate=vis | vis2,
        found=inlier,
        obs_px=obs,
    )
