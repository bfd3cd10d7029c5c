"""KeyframeArchive: the global-map tier above the active window.

The reference's `Memory` singleton retains EVERY keyframe and map
point forever (include/ygz/Basic/Memory.h:16-56,
src/Basic/Memory.cpp:21-52); its local-mapping window merely selects
from that registry.  The TPU build's active window is a fixed-capacity
MapState (XLA static shapes), so by itself the total map would equal
the window — relocalization and loop closing could only reach the last
~10 keyframes.

This module restores the global tier: when MapServer evicts a
keyframe, its pose, BoW vector, vocabulary nodes, descriptors, feature
pixels and per-feature landmark world positions are appended to
growable HOST-side arrays (appends happen at keyframe rate, never per
frame).  Device consumers (archive relocalization, archive loop
detection, the global pose graph) read a padded fixed-shape device
view whose capacity grows by doubling, so jit retraces happen only
log2(#keyframes) times over a run.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class ArchiveView(NamedTuple):
    """Padded device view of the archive (capacity A >= count)."""

    frame_id: jnp.ndarray  # [A] int32 (-1 padding)
    pose7: jnp.ndarray     # [A, 7] T_cw at archive/last-correction time
    bow: jnp.ndarray       # [A, W] BoW vectors
    nodes: jnp.ndarray     # [A, F] vocabulary gating nodes
    desc: jnp.ndarray      # [A, F, 8] uint32 ORB descriptors
    px: jnp.ndarray        # [A, F, 2] level-0 pixels
    angle: jnp.ndarray     # [A, F] ORB angles (rotation-gate input)
    feat_valid: jnp.ndarray  # [A, F] bool
    pt_pos: jnp.ndarray    # [A, F, 3] world position of the landmark
                           # each feature observed at archive time
    pt_ok: jnp.ndarray     # [A, F] bool (feature had a live landmark)
    valid: jnp.ndarray     # [A] bool


class KeyframeArchive:
    """Growable host-side store of evicted keyframes (insertion order
    == eviction order; `frame_id` gives temporal order)."""

    def __init__(self, F: int, n_words: int):
        self.F = F
        self.W = n_words
        self._rows: list[dict] = []
        self._view: ArchiveView | None = None  # cache; None = dirty

    @property
    def count(self) -> int:
        return len(self._rows)

    def append(self, frame_id: int, pose7, bow, nodes, desc, px,
               feat_valid, pt_pos, pt_ok, angle=None, level=None,
               image=None, epoch: int = 0):
        if angle is None:
            angle = np.zeros(np.asarray(px).shape[0], np.float32)
        if level is None:
            level = np.zeros(np.asarray(px).shape[0], np.int32)
        if image is None:
            image = np.zeros((1, 1), np.uint8)
        self._rows.append(dict(
            frame_id=int(frame_id),
            pose7=np.asarray(pose7, np.float32).copy(),
            bow=np.asarray(bow, np.float32).copy(),
            nodes=np.asarray(nodes, np.int32).copy(),
            desc=np.asarray(desc, np.uint32).copy(),
            px=np.asarray(px, np.float32).copy(),
            angle=np.asarray(angle, np.float32).copy(),
            feat_valid=np.asarray(feat_valid, bool).copy(),
            pt_pos=np.asarray(pt_pos, np.float32).copy(),
            pt_ok=np.asarray(pt_ok, bool).copy(),
            level=np.asarray(level, np.int32).copy(),
            # Level-0 keyframe image, uint8 (host-only; the patch
            # source for keyframe REACTIVATION after an archive
            # relocalization — never shipped to device in the view).
            image=np.asarray(image, np.uint8).copy(),
            # Map epoch: which world frame/scale this row's pose and
            # landmark snapshot live in.  A hard reset starts a new
            # epoch; rows from older epochs remain for CROSS-EPOCH
            # loop detection, whose verified hit triggers a map MERGE
            # (the current map is rebased into the old epoch's frame
            # by a measured Sim(3)).
            epoch=np.asarray(epoch, np.int32),
        ))
        r = self._rows[-1]
        n = self.count - 1
        if self._view is not None and self.count <= self._view.valid.shape[0]:
            # Incremental device update: ship ONE row instead of
            # rebuilding the padded view.  The full rebuild re-uploads
            # the whole archive — dominated by the [A, W] BoW block
            # (~5 MB at W=10^4, A=128) — and appends happen at
            # keyframe rate, so the rebuild path cost a measured
            # ~7 MB x #keyframes of tunnel traffic on the public-API
            # bench.
            v = self._view
            self._view = v._replace(
                frame_id=v.frame_id.at[n].set(r["frame_id"]),
                pose7=v.pose7.at[n].set(jnp.asarray(r["pose7"])),
                bow=v.bow.at[n].set(jnp.asarray(r["bow"])),
                nodes=v.nodes.at[n].set(jnp.asarray(r["nodes"])),
                desc=v.desc.at[n].set(jnp.asarray(r["desc"])),
                px=v.px.at[n].set(jnp.asarray(r["px"])),
                angle=v.angle.at[n].set(jnp.asarray(r["angle"])),
                feat_valid=v.feat_valid.at[n].set(
                    jnp.asarray(r["feat_valid"])),
                pt_pos=v.pt_pos.at[n].set(jnp.asarray(r["pt_pos"])),
                pt_ok=v.pt_ok.at[n].set(jnp.asarray(r["pt_ok"])),
                valid=v.valid.at[n].set(True),
            )
        else:
            self._view = None

    # -- device view ----------------------------------------------------
    def _capacity(self) -> int:
        c = 16
        while c < self.count:
            c *= 2
        return c

    def device_view(self) -> ArchiveView:
        """Padded device arrays (cached until the next append)."""
        if self._view is not None:
            return self._view
        A, F, W = self._capacity(), self.F, self.W
        n = self.count

        def stack(key, shape, dtype, fill=0):
            out = np.full((A,) + shape, fill, dtype)
            if n:
                out[:n] = np.stack([r[key] for r in self._rows])
            return jnp.asarray(out)

        valid = np.zeros(A, bool)
        valid[:n] = True
        self._view = ArchiveView(
            frame_id=stack("frame_id", (), np.int32, -1),
            pose7=stack("pose7", (7,), np.float32),
            bow=stack("bow", (W,), np.float32),
            nodes=stack("nodes", (F,), np.int32, -1),
            desc=stack("desc", (F, 8), np.uint32),
            px=stack("px", (F, 2), np.float32),
            angle=stack("angle", (F,), np.float32),
            feat_valid=stack("feat_valid", (F,), bool),
            pt_pos=stack("pt_pos", (F, 3), np.float32),
            pt_ok=stack("pt_ok", (F,), bool),
            valid=jnp.asarray(valid),
        )
        return self._view

    # -- corrections ----------------------------------------------------
    def poses7(self) -> np.ndarray:
        """[count, 7] archived poses (host)."""
        if not self.count:
            return np.zeros((0, 7), np.float32)
        return np.stack([r["pose7"] for r in self._rows])

    def frame_ids(self) -> np.ndarray:
        return np.asarray([r["frame_id"] for r in self._rows], np.int32)

    def set_poses7(self, pose7: np.ndarray, reanchor: bool = True,
                   scale=None):
        """Overwrite archived poses after a global correction.

        With `reanchor`, each row's snapshotted landmark positions are
        moved with their keyframe (p' = T_new^-1 T_old p), keeping
        archived relocalization/loop candidates consistent with the
        corrected world frame.  `scale` ([count] per-keyframe Sim(3)
        correction scales) makes the anchor a similarity: points also
        rescale, p' = S_new^-1(T_old p) with S_new = (R_new,
        s*t_new, s), i.e. p' = R_new^T (p_cam/s - t_new)."""
        from ..utils import np_se3

        assert pose7.shape[0] == self.count
        new = np.asarray(pose7, np.float32)
        sc = (np.ones(self.count, np.float32) if scale is None
              else np.asarray(scale, np.float32))
        for r, p, s_k in zip(self._rows, new, sc):
            if reanchor and r["pt_ok"].any():
                R_old, t_old = np_se3.params7_to_Rt(r["pose7"])
                R_new, t_new = np_se3.params7_to_Rt(p)
                p_cam = r["pt_pos"] @ R_old.T + t_old
                r["pt_pos"] = (
                    (p_cam / s_k - t_new) @ R_new
                ).astype(np.float32)
            r["pose7"] = p.copy()
        if self._view is not None:
            # In-place device refresh of the two corrected fields
            # (~0.4 MB) instead of a full view rebuild (~7 MB of which
            # the untouched BoW block is the bulk).
            v = self._view
            A = v.pose7.shape[0]
            pose_p = np.zeros((A, 7), np.float32)
            pose_p[:self.count] = np.stack(
                [r["pose7"] for r in self._rows])
            pt_p = np.zeros((A,) + v.pt_pos.shape[1:], np.float32)
            pt_p[:self.count] = np.stack(
                [r["pt_pos"] for r in self._rows])
            self._view = v._replace(
                pose7=jnp.asarray(pose_p), pt_pos=jnp.asarray(pt_p)
            )

    def recompute_bow(self, fn, n_words: int):
        """Recompute every archived row's BoW vector + node table under
        a NEW vocabulary (after VisualOdometry.refresh_vocabulary).
        fn: (desc [F,8], valid [F]) -> (bow [W'], nodes [F])."""
        self.W = n_words
        for r in self._rows:
            bow, nodes = fn(r["desc"], r["feat_valid"])
            r["bow"] = np.asarray(bow, np.float32)
            r["nodes"] = np.asarray(nodes, np.int32)
        self._view = None

    def epoch_of(self, idx: int) -> int:
        return int(self._rows[idx].get("epoch", 0))

    def epochs(self) -> np.ndarray:
        return np.asarray(
            [int(r.get("epoch", 0)) for r in self._rows], np.int32)

    def rebase_epoch(self, epoch: int, fn_pose7, fn_points):
        """Apply a world-frame change to every row OF ONE EPOCH:
        fn_pose7(pose7 [7]) -> [7], fn_points(p [F,3]) -> [F,3]; used
        when that epoch merges into another world frame."""
        for r in self._rows:
            if int(r.get("epoch", 0)) != epoch:
                continue
            r["pose7"] = np.asarray(fn_pose7(r["pose7"]), np.float32)
            if r["pt_ok"].any():
                r["pt_pos"] = np.asarray(
                    fn_points(r["pt_pos"]), np.float32)
        self._view = None

    def set_epoch(self, old: int, new: int):
        for r in self._rows:
            if int(r.get("epoch", 0)) == old:
                r["epoch"] = np.asarray(new, np.int32)
        self._view = None

    def pop(self, idx: int) -> dict:
        """Remove and return a row (keyframe REACTIVATION: the entry
        moves back into the active window, so keeping the archive copy
        would duplicate its pose-graph node and invite self-loops)."""
        row = self._rows.pop(idx)
        self._view = None
        return row

    # -- persistence (System.save_map/load_map) -------------------------
    def state_dict(self) -> dict:
        if not self.count:
            return {}
        keys = self._rows[0].keys()
        # 'image' rows can have heterogeneous shapes (full (H,W)
        # keyframe images vs (1,1) placeholders restored from
        # pre-image-format maps), so np.stack would raise; store them
        # under per-row keys instead.
        out = {
            f"__arc_{k}": np.stack(
                [np.asarray(r[k]) for r in self._rows]
            ) for k in keys if k != "image"
        }
        for i, r in enumerate(self._rows):
            out[f"__arc_image_{i}"] = np.asarray(r["image"])
        return out

    def load_state_dict(self, data):
        self._rows = []
        self._view = None
        if "__arc_frame_id" not in data:
            return
        n = data["__arc_frame_id"].shape[0]
        keys = ["frame_id", "pose7", "bow", "nodes", "desc", "px",
                "feat_valid", "pt_pos", "pt_ok", "angle", "level",
                "image", "epoch"]
        for i in range(n):
            row = {}
            for k in keys:
                if k == "image":
                    if f"__arc_image_{i}" in data:       # per-row key
                        row[k] = np.asarray(data[f"__arc_image_{i}"])
                    elif "__arc_image" in data:          # legacy stacked
                        row[k] = np.asarray(data["__arc_image"][i])
                    else:
                        row[k] = np.zeros((1, 1), np.uint8)
                elif f"__arc_{k}" in data:
                    row[k] = np.asarray(data[f"__arc_{k}"][i])
                elif k == "angle":   # maps saved before the field
                    row[k] = np.zeros(self.F, np.float32)
                elif k == "level":
                    row[k] = np.zeros(self.F, np.int32)
                elif k == "epoch":
                    row[k] = np.asarray(0, np.int32)
            self._rows.append(row)
