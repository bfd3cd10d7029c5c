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
import os
import time

import numpy as np
import jax

# Persistent compilation cache: the axon remote-compile path costs
# minutes per cold compile; cached binaries load in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import SE3, PinholeCamera
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align,
    )
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

    # The reference pyramid AND its patches/Jacobians belong to the
    # keyframe — computed once, reused every frame (as the VO does;
    # the reference's precomputeReferencePatches is pose-independent).
    ref_pyr = pyramid.build_pyramid(img_ref, 3)
    ref_prep = prepare_reference(ref_pyr, cam, px, depth, mask,
                                 distorted=False)
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    a2d_prep = align2d_prepare(patches)

    def track_step(T_init7, img):
        cur_pyr = pyramid.build_pyramid(img, 3)
        stats = sparse_image_align(
            ref_pyr, cur_pyr, cam, px, depth, mask,
            SE3.from_params7(T_init7), distorted=False, ref_prep=ref_prep,
        )
        proj = cam.world_to_pixel(pts_w, stats.T_cur_ref, distorted=False)
        ares = align2d(cur_pyr[0], patches, proj, prep=a2d_prep)
        T, inlier, chi2 = pose_only_ba(
            stats.T_cur_ref, pts_w, ares.xy, ares.converged & mask, cam
        )
        return T.params7(), jnp.sum(inlier)

    # The frame loop is sequential (each frame warm-starts from the
    # last pose) but lives ON DEVICE as a lax.scan — the host feeds a
    # chunk of frames and reads back a chunk of poses, so per-frame
    # host dispatch never gates throughput (the TPU-native frame loop).
    # Chunk depth 120: each jit execution costs ~25 ms of fixed
    # dispatch/tunnel overhead regardless of work (measured by varying
    # the chunk), so short chunks are dominated by it — 30 frames
    # 2.08 ms/frame vs 120 frames 1.45 ms/frame, identical per-frame
    # computation.  120 frames of 640x480 f32 is 147 MB of HBM.
    n_frames = 120
    frames = jnp.stack(
        [img_cur + 0.01 * i for i in range(n_frames)]
    )  # distinct frames so nothing constant-folds

    @jax.jit
    def track_chunk(T_init7, frames):
        def body(T7, img):
            T7_new, inl = track_step(T7, img)
            return T7_new, (T7_new, inl)

        return jax.lax.scan(body, T_init7, frames)

    T0 = SE3.identity().params7()
    out = track_chunk(T0, frames)           # compile + warm-up
    jax.block_until_ready(out)
    # Accuracy gate: a fast-but-wrong kernel must not report a score
    # (the frames view T_cur's scene, so every chunk step must land on
    # T_cur with a healthy inlier count).
    T7_final, (T7_all, inliers) = out
    pose_err = float(se3.distance(SE3.from_params7(T7_final), T_cur))
    min_inl = int(jnp.min(inliers))
    assert pose_err < 2e-2, f"tracking inaccurate: {pose_err}"
    assert min_inl > 0.8 * N, f"inliers collapsed: {min_inl}/{N}"
    # Median of 3 timed reps: the remote-TPU tunnel adds +-20%
    # run-to-run noise on a single measurement.
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = track_chunk(T0, frames)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    fps = n_frames / sorted(dts)[1]
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
