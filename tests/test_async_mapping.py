"""Decoupled (pipelined) keyframe mapping: async_mapping=True runs
loop closing + local BA + culling on a worker thread, off the
frame-return path — closing the reference's declared-but-never-built
three-thread design (include/ygz/system.h:80-83, "three main threads
like in ORB_SLAM").

The join discipline (every state consumer calls _join_mapping first)
makes the pipelined results EXACTLY the synchronous ones; this test
asserts that parity end-to-end on a rendered sequence, plus a direct
measurement that the keyframe-frame add_frame return happens before
the mapping pass completes (the latency the pipeline hides).
"""
import time

import numpy as np
import pytest

from ygz_slam_tpu.geometry import PinholeCamera
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status

from test_vo import CAM, VO_OPTS, render_sequence

pytestmark = pytest.mark.slow  # two full VO runs over a rendered sweep


def _run(async_mapping, imgs):
    vo = VisualOdometry(CAM, VOOptions(
        **VO_OPTS, async_mapping=async_mapping
    ))
    kf_latency = []
    n_kf_prev = 0
    for k, img in enumerate(imgs):
        t0 = time.perf_counter()
        vo.add_frame(img, timestamp=float(k))
        dt = time.perf_counter() - t0
        n_kf = vo.stats["keyframes"]
        if n_kf > n_kf_prev:
            kf_latency.append(dt)
        n_kf_prev = n_kf
    traj = vo.trajectory_poses()
    return vo, traj, kf_latency


def test_async_mapping_parity_and_overlap():
    n = 40
    _, _, imgs = render_sequence(n)
    vo_s, traj_s, _lat_s = _run(False, imgs)
    vo_a, traj_a, _lat_a = _run(True, imgs)

    # The mapping thread actually engaged (keyframes were inserted and
    # the deferred pass ran for each).
    assert vo_a.stats["keyframes"] >= 3
    assert vo_s.stats["keyframes"] == vo_a.stats["keyframes"]

    # Exact parity: same per-frame timestamps and identical exported
    # (loop-corrected, keyframe-anchored) trajectories.  The async
    # path runs the same jitted programs in the same order, only on a
    # worker thread with a join barrier — results must be bitwise
    # equal on the deterministic CPU backend.
    assert len(traj_s) == len(traj_a)
    for (ts_s, p_s), (ts_a, p_a) in zip(traj_s, traj_a):
        assert ts_s == ts_a
        np.testing.assert_array_equal(p_s, p_a)

    # Map state parity.
    np.testing.assert_array_equal(
        np.asarray(vo_s.server.state.kf_pose7),
        np.asarray(vo_a.server.state.kf_pose7),
    )
    np.testing.assert_array_equal(
        np.asarray(vo_s.server.state.pt_pos),
        np.asarray(vo_a.server.state.pt_pos),
    )


def test_async_mapping_returns_before_pass_completes():
    """The keyframe add_frame must hand control back while the mapping
    pass is still in flight (that is the whole point); verified
    structurally — the worker thread is alive right after the
    keyframe-inserting add_frame returns — rather than with wall-clock
    thresholds that flake on loaded CI hosts."""
    n = 30
    _, _, imgs = render_sequence(n)
    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS, async_mapping=True))
    saw_inflight = False
    n_kf_prev = 0
    for k, img in enumerate(imgs):
        vo.add_frame(img, timestamp=float(k))
        n_kf = vo.stats["keyframes"]
        th = vo._map_thread
        if n_kf > n_kf_prev and th is not None and th.is_alive():
            saw_inflight = True
        n_kf_prev = n_kf
    assert vo.stats["keyframes"] >= 2
    assert saw_inflight
