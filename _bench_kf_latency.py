"""Per-frame LATENCY at keyframes: sync vs async mapping (VERDICT r4
#3).  Drives the per-frame public API (System.track_monocular — the
latency path; the stream API is the throughput path) over a rendered
segment and records the per-frame wall-time distribution, split into
keyframe-inserting frames vs ordinary frames.

Async mapping moves the keyframe-rate mapping pass (loop detection +
local BA + culling) off the frame-return path onto a worker thread;
the NEXT frame joins it, so the win shows up as the max/keyframe
latency dropping toward the ordinary-frame cost.

Usage: python _bench_kf_latency.py [--frames 160] [--cpu]
Prints one JSON line per mode.
"""
import argparse
import json
import time

import numpy as np


def run(frames, async_mapping, cam, opts_kw):
    from ygz_slam_tpu.system.system import System, Sensor
    from ygz_slam_tpu.models import VOOptions

    opts = VOOptions(**opts_kw, async_mapping=async_mapping)
    sysm = System(camera=cam, sensor=Sensor.MONOCULAR, options=opts)
    sysm.warmup()
    lat, kf_flags = [], []
    for k in range(frames.shape[0]):
        kfb = sysm.vo.stats.get("keyframes", 0)
        t0 = time.perf_counter()
        sysm.track_monocular(frames[k], float(k))
        lat.append(time.perf_counter() - t0)
        kf_flags.append(sysm.vo.stats.get("keyframes", 0) > kfb)
    sysm.vo._join_mapping()
    lat = np.asarray(lat[10:])          # drop residual warmup frames
    kf = np.asarray(kf_flags[10:])
    ms = lambda x: round(float(x) * 1e3, 2)
    out = dict(
        metric="kf_latency",
        async_mapping=async_mapping,
        frames=int(lat.size), keyframes=int(kf.sum()),
        frame_ms_p50=ms(np.median(lat)),
        frame_ms_max=ms(lat.max()),
        kf_frame_ms_p50=ms(np.median(lat[kf])) if kf.any() else None,
        kf_frame_ms_max=ms(lat[kf].max()) if kf.any() else None,
        ordinary_ms_p50=ms(np.median(lat[~kf])),
        ordinary_ms_max=ms(lat[~kf].max()),
    )
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from bench_system import ensure_frames
    from ygz_slam_tpu.geometry import PinholeCamera

    frames = ensure_frames(args.frames)
    cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
    opts_kw = dict(init_min_disparity=15.0, kf_min_frames=5,
                   kf_max_trans=0.04, kf_max_rot=0.05,
                   min_track_inliers=20)
    # Warm both modes once (compile absorb), then measure.
    for mode in (True, False):
        run(frames[:40], mode, cam, opts_kw)
    print("--- measured ---")
    for mode in (False, True):
        run(frames, mode, cam, opts_kw)


if __name__ == "__main__":
    main()
