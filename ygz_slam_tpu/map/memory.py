"""MapServer: host-side slot allocation over the device MapState.

Replaces the reference's `Memory` singleton (src/Basic/Memory.cpp):
the only component allowed to hand out keyframe slots and landmark
rows.  All array *contents* live on device in MapState (map/state.py);
the server only does integer bookkeeping, pulling small masks to host
at keyframe rate (never per frame).

Eviction: when keyframe capacity is full, the slot least covisible
with the newest keyframe is evicted (the fixed-capacity analogue of
the local-map window, LocalMapping.cpp:247-264) — its features are
invalidated and orphaned landmarks culled by the next covisibility
refresh.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import state as ms
from .. import native


class MapServer:
    def __init__(self, K: int, F: int, L: int):
        self.Kcap, self.Fcap, self.Lcap = K, F, L
        self.state = ms.empty_map(K, F, L)
        self.kf_used: list[int] = []   # slots in insertion order
        self.next_frame_id = 0
        # Called with the slot just before its contents are
        # invalidated; the VO uses it to archive evicted keyframes
        # into the global tier (map/archive.py) — the reference's
        # keep-everything Memory semantics (Basic/Memory.h:16-56).
        self.on_evict = None

    # -- slot allocation ------------------------------------------------
    def alloc_kf_slot(self, current_slot: int | None = None) -> int:
        """Free slot, or evict the least-covisible-with-current slot
        (native ms_alloc_kf_slot with a NumPy fallback)."""
        used = np.zeros(self.Kcap, np.uint8)
        used[list(self.kf_used)] = 1
        ref = current_slot if current_slot is not None else (
            self.kf_used[-1] if self.kf_used else 0
        )
        newest = self.kf_used[-1] if self.kf_used else 0
        cov = np.asarray(self.state.cov_weight)
        slot, evicted = native.alloc_kf_slot(used, cov, ref, newest)
        if evicted:
            self.evict_kf(slot)
        return slot

    def evict_kf(self, slot: int):
        if self.on_evict is not None:
            self.on_evict(slot)
        m = self.state
        self.state = m._replace(
            kf_valid=m.kf_valid.at[slot].set(False),
            feat_valid=m.feat_valid.at[slot].set(
                jnp.zeros(self.Fcap, bool)
            ),
            feat_point=m.feat_point.at[slot].set(
                jnp.full(self.Fcap, -1, jnp.int32)
            ),
        )
        self.kf_used.remove(slot)

    def alloc_landmark_rows(self, n: int) -> np.ndarray:
        """Up to n free landmark rows (native scan of the validity
        bitmap pulled from device)."""
        valid = np.asarray(self.state.pt_valid)
        return native.free_rows(valid, n)

    def register_keyframe(self, *args, **kwargs) -> int:
        """insert_keyframe into an allocated slot; returns the slot."""
        slot = self.alloc_kf_slot()
        self.state = ms.insert_keyframe(self.state, slot, *args, **kwargs)
        self.kf_used.append(slot)
        return slot

    def refresh_covisibility(self):
        self.state = _refresh_covis_jit(self.state)


@jax.jit
def _refresh_covis_jit(state):
    """Covisibility update + orphan cull as ONE dispatch (this runs
    2-3x per keyframe; the eager version paid ~8 host round trips)."""
    state = ms.update_covisibility(state)
    orphaned = state.pt_valid & (state.pt_obs == 0)
    return state._replace(pt_valid=state.pt_valid & (~orphaned))
