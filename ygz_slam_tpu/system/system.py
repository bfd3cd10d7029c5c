"""System facade: the user-facing entry point.

Implements the surface the reference *declared* but left empty
(include/ygz/system.h:14-86, src/system.cpp:90-111 and the stub
include/ygz/System/System.h:6-8): config-driven construction with
sensor type switching, TrackMonocular/TrackRGBD, Reset, Shutdown,
SaveTrajectory and actual SaveMap/LoadMap (npz over the tensor
MapState — the reference never implemented these).

Sensor support: MONOCULAR (full), RGBD (depth-initialized landmarks,
no monocular bootstrap), STEREO (rectified left/right with batched
ZMSSD+align1d matching — the reference declared this mode but never
implemented it).
"""
from __future__ import annotations

import dataclasses
import enum

import numpy as np
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..map import state as ms
from ..map import vocabulary as voc
from ..models.visual_odometry import (
    VisualOdometry, VOOptions, Status, VOType, MapType,
)
from .config import Config, camera_from_config, apply_to, VO_CONFIG_KEYS
from . import trajectory as traj


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class System:
    """Facade wiring config -> camera -> VO (legacy system.h:45-67)."""

    def __init__(self, config_file: str | None = None, camera=None,
                 sensor: Sensor = Sensor.MONOCULAR,
                 options: VOOptions | None = None):
        if config_file:
            Config.set_parameter_file(config_file)
            sensor_key = Config.get("system.sensor")
            if sensor_key is not None:
                sensor = Sensor[str(sensor_key).upper()]
        self.sensor = sensor
        cam = camera_from_config(default=camera)
        if cam is None:
            raise ValueError("no camera: pass `camera` or camera.* config")
        opts = options or VOOptions()
        if config_file:
            opts = apply_to(opts, VO_CONFIG_KEYS)
            # VO method / map type switching (config/default.yaml:10-12,
            # legacy system.h:19-38): system.vo in {sparse_direct,
            # sparse_orb, semi_dense_direct}, system.map in {sparse,
            # semi_dense, dense}.
            vo_key = Config.get("system.vo")
            if vo_key is not None:
                opts = dataclasses.replace(
                    opts, vo_type=VOType[str(vo_key).upper()]
                )
            map_key = Config.get("system.map")
            if map_key is not None:
                opts = dataclasses.replace(
                    opts, map_type=MapType[str(map_key).upper()]
                )
        self.vo = VisualOdometry(cam, opts)
        self._shutdown = False

    def warmup(self, archive_capacity: int = 128):
        """Pre-compile the archive-capacity jit buckets so no tracking
        step ever pays an XLA compile when the keyframe archive grows
        (serving deployments: call once at startup; growth beyond
        `archive_capacity` is covered by automatic background
        compile-ahead)."""
        self.vo.warmup_archive(archive_capacity)

    # -- tracking entry points (system.h:45-57) -------------------------
    def track_monocular(self, img, timestamp: float):
        assert self.sensor == Sensor.MONOCULAR
        return self.vo.add_frame(img, timestamp)

    def track_monocular_chunk(self, imgs, timestamps=None,
                              chunk: int | None = None):
        """Throughput entry point: track a batch of consecutive frames
        with whole-chunk on-device scans (VisualOdometry.add_frames).
        Same per-frame results as repeated track_monocular, but the
        fixed per-dispatch cost is paid per chunk instead of per frame
        — the difference between ~video-rate and bench-level
        throughput when frames arrive faster than real time (offline
        processing, serving, multi-camera ingestion).  Returns a
        TrackResult per frame."""
        assert self.sensor == Sensor.MONOCULAR
        return self.vo.add_frames(imgs, timestamps, chunk=chunk)

    def track_monocular_stream(self, frames_iter, chunk: int | None = None):
        """DEFAULT high-throughput ingestion for monocular sequences:
        consume an iterator of (img, timestamp) pairs, batching frames
        into on-device chunked scans (VisualOdometry.add_frames) so the
        fixed per-dispatch cost is paid per chunk, not per frame —
        without materializing the whole sequence in host memory.

        Returns a TrackResult per frame, in order.  Results for a
        buffered chunk become available when the chunk flushes; use
        track_monocular for strict frame-by-frame latency."""
        assert self.sensor == Sensor.MONOCULAR
        chunk = chunk or self.vo.o.chunk_frames
        buf, ts_buf, out = [], [], []
        for img, ts in frames_iter:
            buf.append(img)
            ts_buf.append(ts)
            if len(buf) >= 2 * chunk:
                out.extend(self.vo.add_frames(buf, ts_buf, chunk=chunk))
                buf, ts_buf = [], []
        if buf:
            out.extend(self.vo.add_frames(buf, ts_buf, chunk=chunk))
        return out

    def track_rgbd(self, img, depth, timestamp: float):
        assert self.sensor == Sensor.RGBD
        return self.vo.add_frame(img, timestamp, depth=depth)

    def track_stereo(self, left, right, timestamp: float):
        """Rectified stereo tracking (system.h:49-52 — declared there,
        implemented here via ops.stereo matching)."""
        assert self.sensor == Sensor.STEREO
        return self.vo.add_frame(left, timestamp, right=right)

    def reset(self):
        self.vo.reset()

    def shutdown(self):
        self._shutdown = True

    @property
    def status(self) -> Status:
        return self.vo.status

    # -- persistence (system.h:63-67 — unimplemented there) -------------
    def save_trajectory(self, path: str, corrected: bool = True):
        """TUM-format trajectory.  `corrected=True` (default) applies
        loop-closure corrections (each frame re-anchored to its
        keyframe's corrected pose — best ATE); `corrected=False` saves
        the odometric trajectory as tracked (best frame-to-frame RPE;
        retroactive corrections introduce local jitter between frames
        anchored on different keyframes)."""
        entries = self.vo.trajectory_poses(corrected=corrected)
        stamps = [t for t, _ in entries]
        poses = [p for _, p in entries]
        traj.save_tum(path, stamps, poses)

    def export_point_cloud(self) -> np.ndarray:
        """World point cloud for the configured map type (landmarks +
        semi-dense keyframe depth maps + dense RGBD back-projections,
        legacy system.h:33-37's SPARSE/SEMI_DENSE/DENSE)."""
        return self.vo.export_point_cloud()

    def save_map(self, path: str):
        """Serialize the full MapState + server bookkeeping + the
        VO-side arrays needed to RESUME from the map (keyframe BoW
        vectors/nodes and keyframe images for patch tracking)."""
        self.vo._join_mapping()
        m = self.vo.server.state
        arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
        arrays["__kf_used"] = np.asarray(self.vo.server.kf_used, np.int32)
        arrays["__next_frame_id"] = np.asarray(
            [self.vo.server.next_frame_id], np.int32
        )
        if self.vo.kf_images is not None:
            arrays["__kf_images"] = np.asarray(self.vo.kf_images)
        if self.vo.vocab is not None:
            arrays["__kf_bow"] = np.asarray(self.vo.kf_bow)
            arrays["__kf_nodes"] = np.asarray(self.vo.kf_nodes)
            # The vocabulary itself (nodes/weights/meta): a loaded map
            # must relocalize in ANY process, not just one whose
            # in-process bootstrap vocab happens to match (the role of
            # DBoW3's persisted ORBvoc.bin).
            for key, arr in voc.state_dict(self.vo.vocab).items():
                arrays[f"__vocab_{key}"] = arr
        if self.vo.semidense_cloud or self.vo.dense_cloud:
            arrays["__aux_cloud"] = np.concatenate(
                self.vo.semidense_cloud + self.vo.dense_cloud, axis=0
            )
        if self.vo.archive is not None and self.vo.archive.count:
            arrays.update(self.vo.archive.state_dict())
        np.savez_compressed(path, **arrays)

    def load_map(self, path: str):
        """Restore a saved map.  The next tracked frame relocalizes
        against it (the VO's NOT_READY state tries BoW relocalization
        when the map is non-empty)."""
        self.vo._join_mapping()
        data = np.load(path)
        m = self.vo.server.state
        fields = {f: jnp.asarray(data[f]) for f in m._fields}
        self.vo.server.state = ms.MapState(**fields)
        self.vo.server.kf_used = [int(x) for x in data["__kf_used"]]
        self.vo.server.next_frame_id = int(data["__next_frame_id"][0])
        if "__kf_images" in data:
            self.vo.kf_images = jnp.asarray(data["__kf_images"])
        if "__vocab_meta" in data and self.vo.vocab is not None:
            # Restore the SAVED vocabulary (jit closures rebuilt); the
            # saved BoW vectors/nodes below were computed under it.
            self.vo.set_vocabulary(
                voc.from_state_dict(data, prefix="__vocab_"),
                recompute=False,
            )
        if "__kf_bow" in data and self.vo.vocab is not None:
            self.vo.kf_bow = jnp.asarray(data["__kf_bow"])
            self.vo.kf_nodes = jnp.asarray(data["__kf_nodes"])
        if "__aux_cloud" in data:
            self.vo.semidense_cloud = [np.asarray(data["__aux_cloud"])]
        if self.vo.archive is not None:
            self.vo.archive.load_state_dict(data)
        # Rebuild the keyframe pose log for trajectory anchoring.
        id_np = np.asarray(self.vo.server.state.kf_id)
        pose_np = np.asarray(self.vo.server.state.kf_pose7)
        for s in self.vo.server.kf_used:
            self.vo.kf_pose_log[int(id_np[s])] = pose_np[s].copy()
        if self.vo.archive is not None and self.vo.archive.count:
            for fid, p in zip(self.vo.archive.frame_ids(),
                              self.vo.archive.poses7()):
                self.vo.kf_pose_log[int(fid)] = np.asarray(p)
