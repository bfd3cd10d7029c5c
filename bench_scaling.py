"""Distributed-BA scaling benchmark (BASELINE.json metric 3:
"local-BA scaling efficiency >= 0.7 at 2 hosts").

Weak-scaling protocol: fix the per-device landmark block (LB landmarks
x OBS observations each) and grow the problem with the mesh — perfect
scaling keeps iterations/s constant, so

    efficiency(n) = iters_per_s(n devices) / iters_per_s(1 device).

Per SURVEY.md §2.4 the camera-system reduction is an O(K^2) psum over
the mesh axis; landmark solves are embarrassingly parallel, so the
collective is the only scaling cost.

On real multi-chip hardware run as-is (devices = jax.devices()).  On a
single-chip/CPU box pass --force-virtual N to emulate an N-device mesh
(XLA host devices): the sharding/collective code paths are identical,
but emulated devices share host cores, so the printed efficiency is a
lower bound, not an ICI measurement — the line is tagged
"emulated": true in that case.

Prints ONE JSON line.
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-virtual", type=int, default=0,
                    help="emulate N CPU devices (single-host testing)")
    ap.add_argument("--lb", type=int, default=256,
                    help="landmarks per device")
    ap.add_argument("--kf", type=int, default=10)
    ap.add_argument("--obs-per-pt", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.force_virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_virtual}"
        )

    import jax

    if args.force_virtual:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
    from ygz_slam_tpu.parallel import (
        make_mesh, sharded_local_ba, partition_observations,
    )

    n_dev_all = len(jax.devices())
    emulated = bool(args.force_virtual) or jax.devices()[0].platform == "cpu"

    def build_and_time(n_devices: int) -> float:
        """Iterations/s of sharded local BA on an n-device mesh with
        args.lb landmarks per device (weak scaling)."""
        K, L = args.kf, args.lb * n_devices
        cam = PinholeCamera.create(517.3, 516.5, 320.0, 240.0)
        rng = np.random.default_rng(0)
        pts = np.c_[
            rng.uniform(-2, 2, (L, 2)), rng.uniform(2, 8, L)
        ].astype(np.float32)
        poses = []
        for k in range(K):
            poses.append(SE3(
                so3.exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)),
                jnp.asarray(
                    [0.1 * k, 0, 0] + rng.normal(size=3) * 0.01,
                    jnp.float32,
                ),
            ))
        poses = jax.tree.map(lambda *x: jnp.stack(x), *poses)
        pts_j = jnp.asarray(pts)
        kf_idx = np.concatenate([
            rng.choice(K, args.obs_per_pt, replace=False)
            for _ in range(L)
        ]).astype(np.int32)
        pt_idx = np.repeat(np.arange(L, dtype=np.int32), args.obs_per_pt)
        T = jax.tree.map(lambda a: a[kf_idx], poses)
        px = np.array(
            cam.camera_to_pixel(T.apply(pts_j[pt_idx]), distorted=False)
        )
        px = px + rng.normal(0, 0.3, px.shape).astype(np.float32)
        mask = np.ones(L * args.obs_per_pt, bool)
        fixed = jnp.zeros(K, bool).at[0].set(True).at[1].set(True)
        noisy_poses = jax.vmap(se3.boxplus)(
            poses,
            jnp.asarray(
                np.r_[np.zeros((2, 6)), rng.normal(0, 0.01, (K - 2, 6))],
                jnp.float32,
            ),
        )
        noisy_pts = pts_j + jnp.asarray(
            rng.normal(0, 0.03, pts.shape), jnp.float32
        )

        from jax.sharding import NamedSharding, PartitionSpec as P
        from ygz_slam_tpu.parallel import LANDMARK_AXIS

        mesh = make_mesh(n_devices)
        sobs, L_pad = partition_observations(
            kf_idx, pt_idx, px, mask, L, n_devices
        )
        sh = NamedSharding(mesh, P(LANDMARK_AXIS))
        pts_pad = jax.device_put(
            jnp.concatenate(
                [noisy_pts, jnp.zeros((L_pad - L, 3), jnp.float32)]
            ),
            sh,
        )
        sobs = jax.tree.map(lambda a: jax.device_put(a, sh), sobs)

        run = jax.jit(lambda p, x, o: sharded_local_ba(
            mesh, p, x, o, cam, fixed, n_iter=args.iters
        ))

        out = run(noisy_poses, pts_pad, sobs)       # compile + warm-up
        jax.block_until_ready(out)
        # Accuracy gate: poses must approach truth.
        p_out, x_out, chi2 = out
        err = float(jnp.linalg.norm(p_out.t[2:] - poses.t[2:]))
        assert err < 0.05, f"sharded BA diverged: pose err {err}"
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(noisy_poses, pts_pad, sobs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        return args.iters / dt

    sizes = [1]
    n = 2
    while n <= n_dev_all:
        sizes.append(n)
        n *= 2
    rates = {s: build_and_time(s) for s in sizes}
    eff = rates[sizes[-1]] / rates[1] if rates[1] > 0 else 0.0
    print(json.dumps({
        "metric": f"ba_weak_scaling_efficiency_{sizes[-1]}dev",
        "value": round(eff, 3),
        "unit": "x (iters/s at N dev / iters/s at 1 dev, weak scaling)",
        "vs_baseline": round(eff / 0.7, 3),
        "emulated": emulated,
        "iters_per_s": {str(k): round(v, 1) for k, v in rates.items()},
    }))


if __name__ == "__main__":
    main()
