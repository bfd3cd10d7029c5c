"""Measure the constants of the BA scaling model ON THE REAL CHIP
(VERDICT round-2 item 7: the >=0.7 @2-hosts claim needs empirical
anchors, not just an analytic model).

Measured here (one v5e via the axon tunnel):
  1. T_compute(L): marginal per-iteration device time of the Schur BA
     at several landmark counts (n_iter ladder removes dispatch cost).
  2. The shard_map/psum plumbing overhead at n=1: the same problem
     through parallel.sharded_ba on a 1-device mesh.  A 1-device psum
     is compiled away or near-free, so the DELTA vs plain local_ba
     bounds the per-iteration collective-machinery cost from below.
  3. The reduced-camera-system payload size (what a real 2-host DCN
     all-reduce would move per iteration).

The model (docs/performance.md) then predicts 2-host efficiency as
  E(2) = T_iter(L) / (2 * (T_iter(L/2) + t_comm)),
with t_comm = RTT + payload/BW for published DCN numbers and the
measured payload.  Run:  python _exp_psum_cost.py  (REAL TPU: do not
force CPU).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def make_problem(K, L, obs_per_pt=5, seed=0):
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
    from ygz_slam_tpu.solvers import Observations

    cam = PinholeCamera.create(517.3, 516.5, 320.0, 240.0)
    rng = np.random.default_rng(seed)
    pts = np.c_[rng.uniform(-2, 2, (L, 2)),
                rng.uniform(2, 8, L)].astype(np.float32)
    poses = []
    for k in range(K):
        poses.append(SE3(
            so3.exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)),
            jnp.asarray([0.1 * k, 0, 0] + rng.normal(size=3) * 0.01,
                        jnp.float32),
        ))
    poses = jax.tree.map(lambda *x: jnp.stack(x), *poses)
    pts_j = jnp.asarray(pts)
    kf_idx = np.concatenate([
        rng.choice(K, obs_per_pt, replace=False) for _ in range(L)
    ]).astype(np.int32)
    pt_idx = np.repeat(np.arange(L, dtype=np.int32), obs_per_pt)
    T = jax.tree.map(lambda a: a[kf_idx], poses)
    px = np.array(cam.camera_to_pixel(T.apply(pts_j[pt_idx]),
                                      distorted=False))
    px = (px + rng.normal(0, 0.3, px.shape)).astype(np.float32)
    obs = Observations(
        kf_idx=jnp.asarray(kf_idx), pt_idx=jnp.asarray(pt_idx),
        px=jnp.asarray(px), mask=jnp.ones(L * obs_per_pt, bool),
    )
    noisy_poses = jax.vmap(se3.boxplus)(
        poses, jnp.asarray(
            np.r_[np.zeros((2, 6)), rng.normal(0, 0.01, (K - 2, 6))],
            jnp.float32))
    noisy_pts = pts_j + jnp.asarray(
        rng.normal(0, 0.03, pts.shape), jnp.float32)
    fixed = jnp.zeros(K, bool).at[0].set(True).at[1].set(True)
    return cam, noisy_poses, noisy_pts, obs, fixed


def time_iters(fn, reps=6):
    """Median wall time of fn() (blocking)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from ygz_slam_tpu.solvers import local_ba
    from ygz_slam_tpu.parallel import mesh as meshm
    from ygz_slam_tpu.parallel.sharded_ba import (
        sharded_local_ba, partition_observations)

    K = 10
    out = {"device": str(jax.devices()[0].platform)}
    rows = []
    for L in (500, 2000, 8000):
        cam, poses, pts, obs, fixed = make_problem(K, L)
        res = {}
        for n_iter in (4, 24):
            run = jax.jit(lambda p, x, n=n_iter: local_ba(
                p, x, obs, cam, fixed, n_iter=n))
            r = run(poses, pts)
            jax.block_until_ready(r.chi2)          # compile
            res[n_iter] = time_iters(
                lambda: jax.block_until_ready(run(poses, pts).chi2))
        t_iter = (res[24] - res[4]) / 20.0
        rows.append(dict(L=L, kind="local_ba",
                         t4=res[4], t24=res[24], t_iter_ms=t_iter * 1e3))
        # Same problem through the sharded path on a 1-device mesh.
        m = meshm.make_mesh(1)
        sobs, Lp = partition_observations(
            np.asarray(obs.kf_idx), np.asarray(obs.pt_idx),
            np.asarray(obs.px), np.asarray(obs.mask), L, 1)
        pts_pad = jnp.asarray(np.concatenate(
            [np.asarray(pts), np.zeros((Lp - L, 3), np.float32)]))
        res = {}
        for n_iter in (4, 24):
            run = jax.jit(lambda p, x, n=n_iter: sharded_local_ba(
                m, p, x, sobs, cam, fixed, n_iter=n))
            r = run(poses, pts_pad)
            jax.block_until_ready(r[2])
            res[n_iter] = time_iters(
                lambda: jax.block_until_ready(run(poses, pts_pad)[2]))
        t_iter_s = (res[24] - res[4]) / 20.0
        rows[-1].update(t_iter_sharded_ms=t_iter_s * 1e3,
                        shard_overhead_ms=(t_iter_s - t_iter) * 1e3)
        print(rows[-1])
    out["rows"] = rows
    # Payload of the per-iteration collective (reduced camera system).
    payload = K * K * 36 * 4 + K * 6 * 4 + 4
    out["collective_payload_bytes"] = payload
    print(json.dumps(out))


if __name__ == "__main__":
    main()
