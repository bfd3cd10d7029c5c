"""MapState: the fixed-capacity tensor map replacing the reference's
pointer web.

The reference stores the map as heap objects linked by pointers —
Frame*/Feature*/MapPoint* owned by a `Memory` singleton
(include/ygz/Basic/{Frame,Feature,MapPoint,Memory}.h).  XLA needs
static shapes, so the map here is a pytree of fixed-capacity arrays
with validity masks:

- keyframes   : capacity K  (pose, id, valid)
- features    : capacity K x F (pixel, level, angle, descriptor,
                depth, landmark index)
- landmarks   : capacity L  (position, statistics, descriptor)
- covisibility: dense [K, K] weight matrix (Frame.h:148-153's
                _connected_keyframe_weights / _cov_keyframes)

Slot allocation (which keyframe/landmark row to write) is host-side
integer bookkeeping in MapServer (map/memory.py); everything that
touches array *contents* is pure and jittable.  The local-map window
(LocalMapping.h:17's 10-keyframe cap) maps onto capacity K directly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry import so3


class MapState(NamedTuple):
    # --- keyframes [K] ---
    kf_pose7: jnp.ndarray    # [K, 7] T_cw as quat(wxyz)+t
    kf_valid: jnp.ndarray    # [K] bool
    kf_id: jnp.ndarray       # [K] int32 global frame id (-1 empty)
    # --- features [K, F] ---
    feat_px: jnp.ndarray     # [K, F, 2] level-0 pixel
    feat_level: jnp.ndarray  # [K, F] int32 detection pyramid level
    feat_angle: jnp.ndarray  # [K, F] ORB angle (radians)
    feat_desc: jnp.ndarray   # [K, F, 8] uint32 packed ORB
    feat_depth: jnp.ndarray  # [K, F] depth in the keyframe (-1 unknown)
    feat_point: jnp.ndarray  # [K, F] int32 landmark index (-1 none)
    feat_valid: jnp.ndarray  # [K, F] bool
    # --- landmarks [L] ---
    pt_pos: jnp.ndarray      # [L, 3] world position
    pt_valid: jnp.ndarray    # [L] bool
    pt_desc: jnp.ndarray     # [L, 8] uint32 representative descriptor
    pt_visible: jnp.ndarray  # [L] int32 times expected visible
    pt_found: jnp.ndarray    # [L] int32 times actually matched
    pt_first_kf: jnp.ndarray # [L] int32 creating keyframe slot
    pt_ref_feat: jnp.ndarray # [L] int32 flat (kf*F + feat) of the
                             # reference observation (patch source for
                             # direct projection)
    pt_obs: jnp.ndarray      # [L] int32 number of observing keyframes
    # --- covisibility [K, K] ---
    cov_weight: jnp.ndarray  # [K, K] int32 shared-landmark counts

    @property
    def K(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def F(self) -> int:
        return self.feat_valid.shape[1]

    @property
    def L(self) -> int:
        return self.pt_valid.shape[0]

    def kf_pose(self, k=None) -> SE3:
        """SE3 view of keyframe poses (all, or one slot)."""
        p = self.kf_pose7 if k is None else self.kf_pose7[k]
        return SE3.from_params7(p)

    def found_ratio(self) -> jnp.ndarray:
        """[L] GetFoundRatio (MapPoint.h:23-25)."""
        return self.pt_found.astype(jnp.float32) / jnp.maximum(
            self.pt_visible.astype(jnp.float32), 1.0
        )


def empty_map(K: int, F: int, L: int, dtype=jnp.float32) -> MapState:
    ident = jnp.tile(
        jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype), (K, 1)
    )
    return MapState(
        kf_pose7=ident,
        kf_valid=jnp.zeros(K, bool),
        kf_id=jnp.full(K, -1, jnp.int32),
        feat_px=jnp.zeros((K, F, 2), dtype),
        feat_level=jnp.zeros((K, F), jnp.int32),
        feat_angle=jnp.zeros((K, F), dtype),
        feat_desc=jnp.zeros((K, F, 8), jnp.uint32),
        feat_depth=jnp.full((K, F), -1.0, dtype),
        feat_point=jnp.full((K, F), -1, jnp.int32),
        feat_valid=jnp.zeros((K, F), bool),
        pt_pos=jnp.zeros((L, 3), dtype),
        pt_valid=jnp.zeros(L, bool),
        pt_desc=jnp.zeros((L, 8), jnp.uint32),
        pt_visible=jnp.zeros(L, jnp.int32),
        pt_found=jnp.zeros(L, jnp.int32),
        pt_first_kf=jnp.full(L, -1, jnp.int32),
        pt_ref_feat=jnp.full(L, -1, jnp.int32),
        pt_obs=jnp.zeros(L, jnp.int32),
        cov_weight=jnp.zeros((K, K), jnp.int32),
    )


def insert_keyframe(
    m: MapState,
    slot: int,
    frame_id,
    T_cw: SE3,
    feat_px,
    feat_level,
    feat_angle,
    feat_desc,
    feat_depth,
    feat_point,
    feat_valid,
) -> MapState:
    """Write a keyframe into `slot` (pure; slot chosen by MapServer).

    Replaces Memory::RegisterKeyFrame + the feature recording in
    VisualOdometry::SetKeyframe (:187-203)."""
    return m._replace(
        kf_pose7=m.kf_pose7.at[slot].set(T_cw.params7()),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_id=m.kf_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        feat_px=m.feat_px.at[slot].set(feat_px),
        feat_level=m.feat_level.at[slot].set(feat_level),
        feat_angle=m.feat_angle.at[slot].set(feat_angle),
        feat_desc=m.feat_desc.at[slot].set(feat_desc),
        feat_depth=m.feat_depth.at[slot].set(feat_depth),
        feat_point=m.feat_point.at[slot].set(feat_point),
        feat_valid=m.feat_valid.at[slot].set(feat_valid),
    )


def add_landmarks(
    m: MapState,
    slots: jnp.ndarray,      # [N] int32 target landmark rows
    write_mask: jnp.ndarray, # [N] bool
    pos: jnp.ndarray,        # [N, 3]
    desc: jnp.ndarray,       # [N, 8] uint32
    first_kf,                # scalar slot
    ref_feat: jnp.ndarray | None = None,  # [N] flat (kf*F + feat)
) -> MapState:
    """Scatter new landmarks into rows `slots` where write_mask.

    Replaces Memory::CreateMapPoint (Memory.cpp:45-52); id allocation
    is the caller's job (MapServer hands out free rows)."""
    # Masked rows write into a sentinel row L that is sliced off after.
    safe = jnp.where(write_mask, slots, m.L)
    pt_pos = jnp.concatenate([m.pt_pos, jnp.zeros((1, 3), m.pt_pos.dtype)])
    pt_pos = pt_pos.at[safe].set(pos)[:-1]
    pt_valid = jnp.concatenate([m.pt_valid, jnp.zeros(1, bool)])
    pt_valid = pt_valid.at[safe].set(True)[:-1]
    pt_desc = jnp.concatenate([m.pt_desc, jnp.zeros((1, 8), jnp.uint32)])
    pt_desc = pt_desc.at[safe].set(desc)[:-1]
    z_i32 = jnp.zeros(1, jnp.int32)
    pt_visible = jnp.concatenate([m.pt_visible, z_i32]).at[safe].set(1)[:-1]
    pt_found = jnp.concatenate([m.pt_found, z_i32]).at[safe].set(1)[:-1]
    pt_first = jnp.concatenate([m.pt_first_kf, z_i32]).at[safe].set(
        jnp.asarray(first_kf, jnp.int32)
    )[:-1]
    if ref_feat is None:
        ref_feat = jnp.full(slots.shape[0], -1, jnp.int32)
    pt_rf = jnp.concatenate([m.pt_ref_feat, z_i32]).at[safe].set(
        ref_feat.astype(jnp.int32)
    )[:-1]
    pt_obs = jnp.concatenate([m.pt_obs, z_i32]).at[safe].set(1)[:-1]
    return m._replace(
        pt_pos=pt_pos, pt_valid=pt_valid, pt_desc=pt_desc,
        pt_visible=pt_visible, pt_found=pt_found, pt_first_kf=pt_first,
        pt_ref_feat=pt_rf, pt_obs=pt_obs,
    )


def observations_from_features(m: MapState):
    """Flatten feature->landmark links into BA observation tensors
    (kf_idx [K*F], pt_idx [K*F], px [K*F, 2], mask [K*F]).

    This is the bridge from MapState to solvers.ba.Observations: the
    reference's per-MapPoint _obs maps (MapPoint.h:31) are implicit in
    feat_point."""
    K, F = m.feat_valid.shape
    kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    pt_idx = m.feat_point.reshape(-1)
    px = m.feat_px.reshape(-1, 2)
    mask = (
        m.feat_valid.reshape(-1)
        & (pt_idx >= 0)
        & m.kf_valid[kf_idx]
    )
    pt_safe = jnp.clip(pt_idx, 0, m.L - 1)
    mask = mask & m.pt_valid[pt_safe]
    return kf_idx, pt_safe, px, mask


def update_covisibility(m: MapState) -> MapState:
    """Recompute the full covisibility matrix from feature-landmark
    links (Frame::UpdateConnections, Frame.cpp:86-152, but for ALL
    keyframes in one einsum instead of per-frame map walks).

    cov[a, b] = #landmarks observed by both a and b (a != b).
    """
    K, F = m.feat_valid.shape
    L = m.L
    # Incidence [K, L]: keyframe k observes landmark l.
    pt = jnp.clip(m.feat_point, 0, L - 1)
    valid = (
        m.feat_valid
        & (m.feat_point >= 0)
        & m.kf_valid[:, None]
        & m.pt_valid[pt]
    )
    inc = jnp.zeros((K, L), jnp.int32)
    kf_rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    inc = inc.at[kf_rows, pt].max(valid.astype(jnp.int32))
    cov = inc @ inc.T
    cov = cov * (1 - jnp.eye(K, dtype=jnp.int32))
    # Also refresh per-landmark observation counts.
    pt_obs = jnp.sum(inc, axis=0)
    return m._replace(cov_weight=cov, pt_obs=pt_obs)


def best_covisible(m: MapState, slot, n: int):
    """Indices of the up-to-n keyframes best covisible with `slot`
    (GetBestCovisibilityKeyframes, Frame.cpp:73-78).  Returns
    (idx [n], valid [n])."""
    w = m.cov_weight[slot] * m.kf_valid.astype(jnp.int32)
    vals, idx = jax.lax.top_k(w, n)
    return idx, vals > 0
