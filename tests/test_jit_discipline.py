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


def test_keyframe_cycle_sync_dispatch_budget():
    """Round-5 (VERDICT #1b): a steady-state keyframe insertion must
    add exactly ONE device program (_jit_kf_cycle) to the frame's
    synchronous path — every other keyframe-rate program runs on the
    async mapping worker.  Counts actual jit calls on the main thread
    (a per-dispatch ~26 ms tunnel round trip is the product-surface
    cost VERDICT r4 #1 targets)."""
    import threading

    from ygz_slam_tpu.models import VOOptions as _VOOptions

    vo = VisualOdometry(CAM, _VOOptions(
        **VO_OPTS, async_mapping=True, map_K=5,
        # Culling (on the async worker) would trim the window back
        # below capacity between insertions; pin the window full so
        # every later keyframe exercises the insert-time eviction.
        kf_cull_min_window=5,
    ))
    main_tid = threading.get_ident()
    rec = []
    for name in [a for a in dir(vo) if a.startswith("_jit_")]:
        fn = getattr(vo, name)
        if not callable(fn):
            continue

        def mk(fn, name):
            def wrapped(*a, **k):
                if threading.get_ident() == main_tid:
                    rec.append(name)
                return fn(*a, **k)
            return wrapped
        setattr(vo, name, mk(fn, name))
    _, _, imgs = render_sequence(45)
    normal_calls, kf_calls = [], []
    for k, img in enumerate(imgs):
        kf_before = vo.stats["keyframes"]
        window_full = len(vo.server.kf_used) >= vo.o.map_K
        good_before = vo.status is Status.GOOD
        rec.clear()
        vo.add_frame(img, float(k))
        calls = list(rec)
        if not good_before:
            continue  # init frames take their own path
        if vo.stats["keyframes"] > kf_before:
            if window_full:
                kf_calls.append(calls)
        else:
            normal_calls.append(calls)
    assert kf_calls, "no steady-state (evicting) keyframe cycles ran"
    per_frame = max(len(c) for c in normal_calls)
    for calls in kf_calls:
        extra = [c for c in calls if c == "_jit_kf_cycle"]
        assert len(extra) == 1, calls
        # The whole keyframe cycle adds exactly one sync dispatch on
        # top of the ordinary per-frame set.
        assert len(calls) <= per_frame + 1, (calls, per_frame)


def test_archive_growth_no_retrace_after_warmup():
    """Round-5 (VERDICT #1a): after System/VO warmup, archive GROWTH
    across capacity buckets (16 -> 32 -> 64 -> 128 rows) must trigger
    ZERO new traces of the archive loop/reloc programs — each first-
    hit bucket pays a full XLA compile (minutes over the real-TPU
    remote-compile relay), which must never land on a user-visible
    step."""
    import jax.numpy as jnp

    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
    assert vo.vocab is not None and vo.archive is not None
    vo.warmup_archive(128)
    n_loop = vo._jit_loop_arc._cache_size()
    n_reloc = vo._jit_reloc_arc._cache_size()
    assert n_loop >= 4 and n_reloc >= 4  # all four buckets compiled
    F = vo.o.map_F
    rng = np.random.default_rng(0)
    qd = jnp.asarray(
        rng.integers(0, 2**32, (F, 8), dtype=np.uint64).astype(np.uint32)
    )
    qpx = jnp.asarray(rng.uniform(0, 100, (F, 2)).astype(np.float32))
    qv = jnp.ones((F,), bool)
    qa = jnp.zeros((F,), jnp.float32)
    for i in range(100):
        vo.archive.append(
            i, np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32),
            np.zeros(vo.archive.W, np.float32),
            np.full(F, -1, np.int32),
            rng.integers(0, 2**32, (F, 8), dtype=np.uint64)
            .astype(np.uint32),
            rng.uniform(0, 100, (F, 2)).astype(np.float32),
            np.ones(F, bool),
            rng.normal(size=(F, 3)).astype(np.float32),
            np.ones(F, bool),
        )
        if vo.archive.count in (10, 17, 33, 65, 100):
            arc = vo.archive.device_view()
            vo._jit_loop_arc(
                jnp.asarray(0), jnp.asarray(1000), vo.kf_bow,
                vo.kf_nodes, vo.server.state, arc,
            )
            vo._jit_reloc_arc(qd, qpx, qv, qa, arc)
    assert vo._jit_loop_arc._cache_size() == n_loop, (
        "archive growth retraced the loop program after warmup"
    )
    assert vo._jit_reloc_arc._cache_size() == n_reloc, (
        "archive growth retraced the reloc program after warmup"
    )


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
