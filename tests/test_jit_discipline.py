"""Jit-discipline harness: the TPU-native analogue of the reference's
thread/race sanitizer row (SURVEY §5 — "not much carries over", but
the invariants that DO matter under XLA are checkable):

1. No silent retracing: the per-frame tracking program must compile
   ONCE and be reused — a shape or dtype leak that retraces per frame
   would be a 5-10 minute stall per frame over the real-TPU compile
   relay (CLAUDE.md), the moral equivalent of a hot-path data race.
2. Fixed-shape discipline: every device array in MapState keeps its
   shape across keyframe insertion/eviction/mapping (slot reuse, not
   reallocation).
3. Async-mapping thread safety: the worker thread and the tracking
   path hand state over only at the join barrier; concurrent reads of
   host bookkeeping during an in-flight pass must never observe a
   torn trajectory (every entry finite, monotone timestamps).
"""
import numpy as np
import pytest

from ygz_slam_tpu.geometry import PinholeCamera
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status

from test_vo import CAM, VO_OPTS, render_sequence

pytestmark = pytest.mark.slow  # full VO runs


def test_no_retrace_in_steady_state():
    n = 30
    _, _, imgs = render_sequence(n)
    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
    for k, img in enumerate(imgs[:12]):
        vo.add_frame(img, timestamp=float(k))
    # Steady state reached (tracking GOOD, at least one keyframe
    # inserted): every additional frame must reuse the compiled
    # tracking program.
    assert vo.status is Status.GOOD
    n_traces0 = vo._jit_track._cache_size()
    for k, img in enumerate(imgs[12:]):
        vo.add_frame(img, timestamp=float(12 + k))
    assert vo._jit_track._cache_size() == n_traces0, (
        "per-frame tracking retraced in steady state"
    )
    # The mapping program as well (keyframes were inserted in both
    # halves of the run).
    assert vo._jit_mapping._cache_size() <= 1


def test_fixed_shapes_across_map_lifecycle():
    n = 40
    _, _, imgs = render_sequence(n)
    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
    shapes = None
    for k, img in enumerate(imgs):
        vo.add_frame(img, timestamp=float(k))
        cur = {f: tuple(getattr(vo.server.state, f).shape)
               for f in vo.server.state._fields}
        if shapes is None:
            shapes = cur
        else:
            assert cur == shapes, "MapState shape changed mid-run"
    assert vo.stats["keyframes"] >= 4  # lifecycle actually exercised


def test_async_mapping_concurrent_reads_are_consistent():
    n = 40
    _, _, imgs = render_sequence(n)
    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS, async_mapping=True))
    for k, img in enumerate(imgs):
        vo.add_frame(img, timestamp=float(k))
        # Reader in the tracking thread while a mapping pass may be in
        # flight: the public accessor joins first, so the view must
        # always be complete and finite.
        traj = vo.trajectory_poses()
        ts = [t for t, _ in traj]
        assert ts == sorted(ts)
        assert all(np.isfinite(p).all() for _, p in traj)
    assert vo.stats["keyframes"] >= 3
