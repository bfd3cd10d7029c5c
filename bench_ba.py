"""Secondary benchmark: local-BA iterations per second on one chip.

BASELINE.json's third metric is "local-BA iterations/s".  The driver
runs bench.py (tracking fps) as the headline; this script measures the
backend: windowed Schur-complement BA at the reference's workload
envelope (10 keyframes x 500 landmarks, ~2500 observations —
config/default.yaml:65-66 and note.md:14's 100-150 new points/KF).

Prints one JSON line.  For context, the reference's only backend
timing is "g2o clearly faster than Ceres" with no number (note.md:5).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
    from ygz_slam_tpu.solvers import Observations, local_ba

    K, L, obs_per_pt = 10, 500, 5
    cam = PinholeCamera.create(517.3, 516.5, 320.0, 240.0)
    rng = np.random.default_rng(0)
    pts = np.c_[rng.uniform(-2, 2, (L, 2)), rng.uniform(2, 8, L)].astype(np.float32)
    poses = []
    for k in range(K):
        poses.append(SE3(
            so3.exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)),
            jnp.asarray([0.1 * k, 0, 0] + rng.normal(size=3) * 0.01, jnp.float32),
        ))
    poses = jax.tree.map(lambda *x: jnp.stack(x), *poses)
    pts_j = jnp.asarray(pts)
    kf_idx = np.concatenate([
        rng.choice(K, obs_per_pt, replace=False) for _ in range(L)
    ]).astype(np.int32)
    pt_idx = np.repeat(np.arange(L, dtype=np.int32), obs_per_pt)
    T = jax.tree.map(lambda a: a[kf_idx], poses)
    px = np.array(cam.camera_to_pixel(T.apply(pts_j[pt_idx]), distorted=False))
    px = px + rng.normal(0, 0.3, px.shape).astype(np.float32)
    obs = Observations(
        kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
        px=jnp.asarray(px), mask=jnp.ones(L * obs_per_pt, bool),
    )
    noisy_poses = jax.vmap(se3.boxplus)(
        poses, jnp.asarray(
            np.r_[np.zeros((2, 6)), rng.normal(0, 0.01, (K - 2, 6))],
            jnp.float32,
        )
    )
    noisy_pts = pts_j + jnp.asarray(rng.normal(0, 0.03, pts.shape), jnp.float32)
    fixed = jnp.zeros(K, bool).at[0].set(True).at[1].set(True)

    N_ITER = 10
    run = jax.jit(lambda p, x: local_ba(p, x, obs, cam, fixed, n_iter=N_ITER))
    res = run(noisy_poses, noisy_pts)
    jax.block_until_ready(res)
    assert float(res.chi2) < 1e5 and bool(jnp.isfinite(res.chi2))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run(noisy_poses, noisy_pts)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    iters_per_s = reps * N_ITER / dt
    print(json.dumps({
        "metric": "local_ba_iterations_per_s_10kf_500pts",
        "value": round(iters_per_s, 1),
        "unit": "BA iterations/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
