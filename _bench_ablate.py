"""Same-script A/B ablation of tracking-step variants on the real TPU.

Single-op microbenches over the axon tunnel are BIMODAL (the same probe
reads 3 us or 0.8 ms depending on a hidden measurement window), so the
only trustworthy comparison is two full bench-level variants timed in
ONE script run.  This mirrors bench.py's workload exactly and times
each variant the same way (median of 3 chunk executions).

Usage: python _bench_ablate.py  (background, generous timeout — cold
Mosaic compiles go through the remote-compile relay at ~5-10 min per
new kernel signature; subsequent runs hit .jax_cache).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def build_chunk(n_frames=120):
    from ygz_slam_tpu.geometry import SE3, PinholeCamera
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align,
    )
    from ygz_slam_tpu.solvers import pose_only_ba
    from ygz_slam_tpu.utils.synthetic import PlaneScene
    from ygz_slam_tpu.geometry import se3
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare

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
    patches = sample_patches(img_ref, px, 10)
    ref_pyr = pyramid.build_pyramid(img_ref, 3)
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

    frames = jnp.stack([img_cur + 0.01 * i for i in range(n_frames)])

    @jax.jit
    def track_chunk(T_init7, frames):
        def body(T7, img):
            T7_new, inl = track_step(T7, img)
            return T7_new, (T7_new, inl)
        return jax.lax.scan(body, T_init7, frames)

    gate = dict(T_cur=T_cur, N=N)
    return track_chunk, SE3.identity().params7(), frames, gate


def time_variant(name):
    from ygz_slam_tpu.geometry import SE3, se3

    track_chunk, T0, frames, gate = build_chunk()
    n_frames = frames.shape[0]
    out = track_chunk(T0, frames)
    jax.block_until_ready(out)
    T7_final, (T7_all, inliers) = out
    pose_err = float(se3.distance(SE3.from_params7(T7_final), gate["T_cur"]))
    min_inl = int(jnp.min(inliers))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = track_chunk(T0, frames)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    fps = n_frames / sorted(dts)[1]
    print(json.dumps({
        "variant": name, "fps": round(fps, 1),
        "pose_err": round(pose_err, 5), "min_inliers": min_inl,
    }), flush=True)
    return fps


def main():
    from ygz_slam_tpu.ops import sparse_align as sa

    sa.USE_FUSED_LEVEL = False
    fps_base = time_variant("while_loop_levels")
    sa.USE_FUSED_LEVEL = True
    fps_fused = time_variant("fused_levels")
    print(json.dumps({
        "speedup": round(fps_fused / fps_base, 3)
    }), flush=True)


if __name__ == "__main__":
    main()
