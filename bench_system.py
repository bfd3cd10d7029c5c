"""Product-surface throughput bench: the PUBLIC System API end to end
(VERDICT r3 weak #7 / next #6).

bench.py measures the kernel path (pyramid→sparse→align2d→pose-BA
composed directly, keyframe prep hoisted).  This bench runs the same
class of workload through `System.track_monocular_stream` — detection,
keyframe insertion, triangulation, local BA, archive maintenance and
loop detection all included, chunked scans amortizing the per-dispatch
tunnel cost — so the recorded number is what a USER of the public API
gets on one chip.

Frames are pre-rendered by a CPU-backend subprocess into a cached npz
(rendering eagerly over the TPU tunnel would dominate the wall time
and measure the wrong thing); the bench process streams them through
the System facade on the default (TPU) backend.

Usage: python bench_system.py [--frames 600] [--chunk 64] [--cpu]
Prints one JSON line {"metric": "system_fps", ...}.
"""
import argparse
import json
import os
import subprocess
import sys
import time

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_system_frames.npz")
RENDER_FRAMES = 600  # cached sequence length (prefix is used)

_RENDER_SRC = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import numpy as np
from ygz_slam_tpu.geometry import PinholeCamera
from ygz_slam_tpu.utils.synthetic import BoxScene, loop_trajectory

out, n = sys.argv[1], int(sys.argv[2])
cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
scene = BoxScene(cam, seed=0, vignette=0.25)
# Same motion profile as the accuracy benchmark (bench_accuracy.py):
# the product surface must digest keyframes + mapping at the density a
# real trajectory produces, not a keyframe-free hover.
poses = loop_trajectory(2000, radius=1.8, laps=2.2, seed=0,
                        face="out")[:n]
frames = np.empty((n, 240, 320), np.float32)
for k, T in enumerate(poses):
    gain = 1.0 + 0.08 * np.sin(2 * np.pi * k / 400.0)
    bias = 4.0 * np.sin(2 * np.pi * k / 270.0)
    frames[k] = np.asarray(scene.render(T, (240, 320), gain=gain,
                                        bias=bias))
np.savez_compressed(out, frames=frames)
print("rendered", n, file=sys.stderr)
"""


def ensure_frames(n):
    if os.path.exists(CACHE):
        import numpy as np
        with np.load(CACHE) as z:
            if z["frames"].shape[0] >= n:
                return z["frames"][:n]
    subprocess.run(
        [sys.executable, "-c", _RENDER_SRC, CACHE, str(max(n, RENDER_FRAMES))],
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    import numpy as np
    with np.load(CACHE) as z:
        return z["frames"][:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=RENDER_FRAMES)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (debug; not the recorded number)")
    ap.add_argument("--sync-mapping", action="store_true",
                    help="disable the async mapping thread (ablation)")
    ap.add_argument("--trace", action="store_true",
                    help="profile the measured pass and report a "
                         "DEVICE-time-derived fps next to the wall "
                         "(tunnel-bound) number — the deployment-"
                         "relevant figure when dispatches are local")
    args = ap.parse_args()

    frames = ensure_frames(args.frames)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from ygz_slam_tpu.geometry import PinholeCamera
    from ygz_slam_tpu.models import VOOptions, Status
    from ygz_slam_tpu.system.system import System, Sensor

    cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
    opts = VOOptions(
        init_min_disparity=15.0, kf_min_frames=5,
        kf_max_trans=0.04, kf_max_rot=0.05,
        min_track_inliers=20,
        chunk_frames=args.chunk,
        async_mapping=not args.sync_mapping,
    )

    def run_once():
        sysm = System(camera=cam, sensor=Sensor.MONOCULAR, options=opts)
        # Pre-compile the archive-capacity jit buckets (round-5): no
        # measured step pays a compile when the archive grows.
        sysm.warmup()
        it = ((frames[i], float(i)) for i in range(len(frames)))
        t0 = time.time()
        res = sysm.track_monocular_stream(it, chunk=args.chunk)
        sysm.vo._join_mapping()
        dt = time.time() - t0
        n_good = sum(r.status is Status.GOOD for r in res)
        return dt, n_good, sysm

    # Warm-up pass absorbs compiles (cached across runs in .jax_cache);
    # the recorded number is the second pass.
    _dt0, n_good0, _ = run_once()
    dt, n_good, sysm = run_once()
    device_s = n_traced = None
    if args.trace:
        # Trace a steady-state SLICE only (a full-pass trace exceeds
        # the 2 GB protobuf limit): fresh system, untraced lead-in
        # through init + early keyframes, then a 300-frame traced
        # window with keyframes, archive maintenance and loop
        # detection all active.
        import shutil
        logdir = "/tmp/jaxtrace_system"
        shutil.rmtree(logdir, ignore_errors=True)
        sys2 = System(camera=cam, sensor=Sensor.MONOCULAR, options=opts)
        sys2.warmup()
        lead = min(150, len(frames) // 2)
        n_traced = min(300, len(frames) - lead)
        sys2.track_monocular_chunk(
            [frames[i] for i in range(lead)],
            [float(i) for i in range(lead)], chunk=args.chunk)
        jax.profiler.start_trace(logdir)
        sys2.track_monocular_chunk(
            [frames[lead + i] for i in range(n_traced)],
            [float(lead + i) for i in range(n_traced)],
            chunk=args.chunk)
        sys2.vo._join_mapping()
        jax.profiler.stop_trace()
        device_s = _device_busy_seconds(logdir)
    fps = len(frames) / dt
    out = {
        "metric": "system_fps",
        "value": round(fps, 1),
        "unit": "frames/s end-to-end via System.track_monocular_stream",
        "vs_baseline": round(fps / 100.0, 2),
        "frames": len(frames),
        "frac_good": round(n_good / len(frames), 4),
        "keyframes": int(sysm.vo.stats.get("keyframes", 0)),
        "chunk": args.chunk,
        "async_mapping": not args.sync_mapping,
        "warmup_s": round(_dt0, 2),
        "wall_s": round(dt, 2),
    }
    if device_s is not None:
        # Device-busy fps: wall time is TUNNEL-bound here (a measured
        # ~26 ms fixed round trip per dispatch over the serving
        # relay); deployments with attached chips see the device
        # number (same method as the per-kernel budget in CLAUDE.md /
        # _bench_trace.py).
        out["device_busy_s"] = round(device_s, 3)
        out["device_fps"] = round(n_traced / device_s, 1)
        out["traced_frames"] = n_traced
    print(json.dumps(out))


def _device_busy_seconds(logdir):
    """Total device-busy seconds in the trace: the TPU plane's
    "XLA Modules" line (one event per module execution, durations are
    on-device execution spans).  The "Async XLA Ops" line is NOT
    usable — its spans include async dispatch waits (measured 158 s vs
    20.6 s of module time on the same trace); the "XLA Ops" line
    double-counts ops nested under overlapping views."""
    import glob
    from collections import defaultdict
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    line_tot = defaultdict(float)
    for p in sorted(glob.glob(logdir + "/**/*.xplane.pb",
                              recursive=True)):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            nm = plane.name.lower()
            if "tpu" not in nm and "axon" not in nm:
                continue
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                s = sum(ev.duration_ps for ev in line.events) / 1e12
                line_tot[plane.name] += s
    return max(line_tot.values()) if line_tot else float("nan")


if __name__ == "__main__":
    main()
