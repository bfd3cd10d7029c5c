"""Same-script A/B: per-stage window gathers vs ONE merged pallas_call
per frame (gather_frame_windows: sparse-align level windows + align2d
patch windows fetched together at the frame-init pose).

The merged variant trades CACHE_SLACK margin (align2d windows centered
at init-pose projections instead of post-sparse-align projections) for
gather/kernel overlap — safe at the bench's 1.5-2 px/frame motion and
guarded by the same accuracy gate as bench.py.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import SE3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align, gather_frame_windows,
    )
    from ygz_slam_tpu.solvers import pose_only_ba
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    import _bench_common as bc

    cam, px, depth, mask, pts_w, patches, ref_pyr, frames, T_gt7 = (
        bc.make_workload()
    )
    ref_prep = prepare_reference(ref_pyr, cam, px, depth, mask,
                                 distorted=False)
    a2d_prep = align2d_prepare(patches)

    def step_base(T_init7, img):
        cur_pyr = pyramid.build_pyramid(img, 3)
        stats = sparse_image_align(
            ref_pyr, cur_pyr, cam, px, depth, mask,
            SE3.from_params7(T_init7), distorted=False,
            ref_prep=ref_prep,
        )
        proj = cam.world_to_pixel(pts_w, stats.T_cur_ref, distorted=False)
        ares = align2d(cur_pyr[0], patches, proj, prep=a2d_prep)
        T, inlier, chi2 = pose_only_ba(
            stats.T_cur_ref, pts_w, ares.xy, ares.converged & mask, cam
        )
        return T.params7(), jnp.sum(inlier)

    def step_merged(T_init7, img):
        cur_pyr = pyramid.build_pyramid(img, 3)
        T_init = SE3.from_params7(T_init7)
        proj0 = cam.world_to_pixel(pts_w, T_init, distorted=False)
        fw = gather_frame_windows(
            cur_pyr, cam, ref_prep, T_init, distorted=False,
            a2d_centers=proj0,
        )
        stats = sparse_image_align(
            ref_pyr, cur_pyr, cam, px, depth, mask, T_init,
            distorted=False, ref_prep=ref_prep, frame_windows=fw,
        )
        proj = cam.world_to_pixel(pts_w, stats.T_cur_ref, distorted=False)
        ares = align2d(cur_pyr[0], patches, proj, prep=a2d_prep,
                       pregathered=fw.a2d)
        T, inlier, chi2 = pose_only_ba(
            stats.T_cur_ref, pts_w, ares.xy, ares.converged & mask, cam
        )
        return T.params7(), jnp.sum(inlier)

    n_frames = frames.shape[0]

    def run_variant(name, step):
        @jax.jit
        def chunk(T7, fr):
            def body(T7, img):
                T7n, inl = step(T7, img)
                return T7n, (T7n, inl)
            return jax.lax.scan(body, T7, fr)

        T0 = SE3.identity().params7()
        out = chunk(T0, frames)
        jax.block_until_ready(out)
        _, (T7_all, inliers) = out
        max_err, min_inl, ok = bc.gate(T7_all, inliers, T_gt7)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = chunk(T0, frames)
            jax.block_until_ready(out)
            dts.append(time.perf_counter() - t0)
        fps = n_frames / sorted(dts)[1]
        print(json.dumps({
            "variant": name, "fps": round(fps, 1),
            "gate_ok": bool(ok), "max_err": float(max_err),
            "min_inl": int(min_inl),
        }), flush=True)
        return fps

    a = run_variant("base", step_base)
    b = run_variant("merged_gather", step_merged)
    a2 = run_variant("base_rep", step_base)
    print(json.dumps({"speedup_vs_base": round(2 * b / (a + a2), 4)}))


if __name__ == "__main__":
    main()
