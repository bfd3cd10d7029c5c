"""Benchmark: per-frame tracking throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's envelope — 640x480 grayscale frames, 3-level
pyramid, 200 tracked features — through the full per-frame tracking
computation (pyramid build + sparse-direct alignment, 3 levels x 30 GN
iterations + batched 8x8 patch alignment of 200 map points + pose-only
BA with 4 reclassification rounds).  The reference's corresponding
numbers (author's x86 desktop, note.md): ~2 ms sparse alignment alone,
~50+ ms patch matching alone.  Baseline target (BASELINE.json):
>= 100 frames/s on one v5e chip -> vs_baseline = fps / 100.

Runs on whatever backend jax selects (the real TPU under the driver).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import SE3, PinholeCamera
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import sparse_image_align
    from ygz_slam_tpu.solvers import pose_only_ba
    from ygz_slam_tpu.utils.synthetic import PlaneScene
    from ygz_slam_tpu.geometry import se3

    H, W, N = 480, 640, 200
    cam = PinholeCamera.create(517.3, 516.5, W / 2, H / 2)
    scene = PlaneScene(cam, plane_z=3.0, seed=0, tex_per_meter=220.0)
    T_ref = SE3.identity()
    T_cur = se3.exp(jnp.asarray([0.04, -0.02, 0.01, 0.004, -0.006, 0.003]))
    img_ref = scene.render(T_ref, (H, W))
    img_cur = scene.render(T_cur, (H, W))
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        np.c_[rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)],
        jnp.float32,
    )
    depth = scene.depth(px, T_ref)
    mask = jnp.ones(N, bool)
    pts_w = cam.pixel_to_world(px, T_ref, depth=depth, distorted=False)
    patches = jnp.zeros((N, 10, 10), jnp.float32)  # filled per-frame below

    from ygz_slam_tpu.ops.interp import sample_patches
    patches = sample_patches(img_ref, px, 10)

    @jax.jit
    def track_step(img, T_init7):
        cur_pyr = pyramid.build_pyramid(img, 3)
        ref_pyr = pyramid.build_pyramid(img_ref, 3)
        stats = sparse_image_align(
            ref_pyr, cur_pyr, cam, px, depth, mask,
            SE3.from_params7(T_init7), distorted=False,
        )
        proj = cam.world_to_pixel(pts_w, stats.T_cur_ref, distorted=False)
        ares = align2d(cur_pyr[0], patches, proj)
        T, inlier, chi2 = pose_only_ba(
            stats.T_cur_ref, pts_w, ares.xy, ares.converged & mask, cam
        )
        return T.params7(), jnp.sum(inlier)

    T0 = SE3.identity().params7()
    # Warm-up / compile.
    out = track_step(img_cur, T0)
    jax.block_until_ready(out)
    # Steady-state timing.
    n_frames = 30
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = track_step(img_cur, T0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    print(
        json.dumps(
            {
                "metric": "tracking_fps_640x480_200pts",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
