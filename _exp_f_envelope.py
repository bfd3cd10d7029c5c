"""F-envelope experiment (VERDICT r4 #6): lift the per-frame feature
budget from the working point F=256 toward the reference's design
point F~1000 (/root/reference/note.md:14 — 1000 features/frame,
100-150 new points per keyframe) and measure what actually scales.

Two halves:
1. --tpu: time the F-SCALED kernels on the real chip — full Hamming
   NN matching (the "free at F=256" justification under test),
   archive match-count retrieval, and steered-BRIEF description.
   These are the keyframe-rate costs that grow with F; the per-frame
   tracking path top-ks a fixed NS=256 subset regardless of F.
2. (default, CPU): drive the FULL VO at F in {256, 512, 1000} over a
   BoxScene segment and record tracking health + triangulation yield
   per keyframe + landmark-pool pressure.

Usage: python _exp_f_envelope.py [--tpu] [--frames 240]
"""
import argparse
import json
import time

import numpy as np


def tpu_kernel_scaling():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ygz_slam_tpu.ops import hamming

    rng = np.random.default_rng(0)
    out = {}
    for F in (256, 512, 1024):
        qd = jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint64)
                         .astype(np.uint32))
        cd = jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint64)
                         .astype(np.uint32))
        qv = jnp.ones(F, bool)

        nn = jax.jit(lambda a, b, m: hamming.match_nn(
            a, b, m, m, max_dist=64, ratio=1.0, cross_check=True))
        r = nn(qd, cd, qv); jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(nn(qd, cd, qv))
            ts.append(time.perf_counter() - t0)
        out[f"match_nn_F{F}_ms"] = round(sorted(ts)[2] * 1e3, 3)

        A = 128
        ad = jnp.asarray(rng.integers(0, 2**32, (A, F, 8),
                                      dtype=np.uint64).astype(np.uint32))
        av = jnp.ones((A, F), bool)
        sc = jax.jit(lambda q, m, d, v: hamming.archive_match_scores(
            q, m, d, v))
        r = sc(qd, qv, ad, av); jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(sc(qd, qv, ad, av))
            ts.append(time.perf_counter() - t0)
        out[f"archive_scores_A{A}_F{F}_ms"] = round(sorted(ts)[2] * 1e3, 3)
    print(json.dumps(out))


def system_yields(frames_n):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from ygz_slam_tpu.geometry import PinholeCamera
    from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
    from ygz_slam_tpu.utils.synthetic import BoxScene, loop_trajectory

    cam = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
    rows = []
    for F, budgets in ((256, (160, 64, 32)), (512, (320, 128, 64)),
                       (1000, (624, 250, 126))):
        scene = BoxScene(cam, seed=0, vignette=0.25)
        poses = loop_trajectory(2000, radius=1.8, laps=2.2, seed=0,
                                face="out")[:frames_n]
        vo = VisualOdometry(cam, VOOptions(
            init_min_disparity=15.0, kf_min_frames=5,
            kf_max_trans=0.04, kf_max_rot=0.05,
            min_track_inliers=15,
            map_F=F, feat_budgets=budgets,
            map_L=max(3072, 10 * F + F),
        ))
        t0 = time.time()
        n_good = 0
        for k, T in enumerate(poses):
            gain = 1.0 + 0.08 * np.sin(2 * np.pi * k / 400.0)
            bias = 4.0 * np.sin(2 * np.pi * k / 270.0)
            img = scene.render(T, (240, 320), gain=gain, bias=bias)
            r = vo.add_frame(img, timestamp=float(k))
            n_good += r.status is Status.GOOD
        m = vo.server.state
        n_lm = int(np.asarray(m.pt_valid).sum())
        kfs = vo.stats.get("keyframes", 0)
        rows.append(dict(
            F=F, frames=frames_n,
            frac_good=round(n_good / frames_n, 4),
            keyframes=int(kfs),
            landmarks_live=n_lm,
            landmarks_per_kf=round(n_lm / max(kfs, 1), 1),
            map_L=vo.o.map_L,
            wall_s=round(time.time() - t0, 1),
        ))
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()
    if args.tpu:
        tpu_kernel_scaling()
    else:
        system_yields(args.frames)
