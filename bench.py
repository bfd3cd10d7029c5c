"""Benchmark: per-frame tracking throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's envelope — 640x480 grayscale frames, 3-level
pyramid, 200 tracked features — through the full per-frame tracking
computation (pyramid build + sparse-direct alignment + batched 8x8
patch alignment of 200 map points + pose-only BA with 4
reclassification rounds), on a REALISTIC smooth camera trajectory with
~1.5-2 px/frame of image motion and 0.5% sensor noise (_bench_common):
early-exit kernels must earn their speed against per-frame work, not a
statically-posed warm start.  The reference's corresponding numbers
(author's x86 desktop, note.md): ~2 ms sparse alignment alone, ~50+ ms
patch matching alone.  Baseline target (BASELINE.json): >= 100
frames/s on one v5e chip -> vs_baseline = fps / 100.

Accuracy gate: EVERY frame's pose must land on its ground truth with a
healthy inlier count, so fast-but-wrong kernels fail instead of
scoring.  Runs on whatever backend jax selects (the real TPU under the
driver).
"""
import json
import time

import jax

# Persistent compilation cache: the axon remote-compile path costs
# minutes per cold compile; cached binaries load in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import SE3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align,
    )
    from ygz_slam_tpu.solvers import pose_only_ba
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    import _bench_common as bc

    cam, px, depth, mask, pts_w, patches, ref_pyr, frames, T_gt7 = (
        bc.make_workload()
    )
    # The reference pyramid AND its patches/Jacobians belong to the
    # keyframe — computed once, reused every frame (as the VO does;
    # the reference's precomputeReferencePatches is pose-independent).
    ref_prep = prepare_reference(ref_pyr, cam, px, depth, mask,
                                 distorted=False)
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
    n_frames = frames.shape[0]

    @jax.jit
    def track_chunk(T_init7, frames):
        def body(T7, img):
            T7_new, inl = track_step(T7, img)
            return T7_new, (T7_new, inl)

        return jax.lax.scan(body, T_init7, frames)

    T0 = SE3.identity().params7()
    out = track_chunk(T0, frames)           # compile + warm-up
    jax.block_until_ready(out)
    T7_final, (T7_all, inliers) = out
    max_err, min_inl, ok = bc.gate(T7_all, inliers, T_gt7)
    assert ok, f"tracking inaccurate: max_err={max_err} min_inl={min_inl}"
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
