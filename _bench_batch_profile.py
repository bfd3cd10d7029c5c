"""Stage attribution for the multi-sequence batch step (REAL TPU).

bench_batch aggregate (S=8) is ~831 fps while single-sequence is
~4300: per-step the batch path costs ~5x more device time per frame
than the single path.  This script times each stage of
batched_track_step in isolation, same-script, chunked over a scan so
the ~26 ms dispatch intercept amortizes the same way bench_batch does.

Run on the real chip: python _bench_batch_profile.py [S]
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def main(S=8, n_frames=60):
    # Reuse bench_batch's exact workload construction.
    import bench_batch as bb
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, gather_frame_windows, sparse_image_align)
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    from ygz_slam_tpu.parallel import batch_tracking as bt
    from ygz_slam_tpu.utils.synthetic import PlaneScene
    import _bench_common as bc

    H, W, N = 480, 640, 200
    cam = PinholeCamera.create(517.3, 516.5, W / 2, H / 2)

    def pose(i):
        s = 2.0 * np.pi * i / 40.0
        xi = np.array([
            0.050 * np.sin(s), 0.035 * np.sin(2 * s + 0.7),
            0.030 * np.cos(s) - 0.030, 0.0040 * np.sin(s + 0.3),
            0.0050 * np.cos(2 * s), 0.0030 * np.sin(s),
        ], np.float32)
        base = np.array([0.04, -0.02, 0.01, 0.004, -0.006, 0.003],
                        np.float32)
        return se3.exp(jnp.asarray(base + xi))

    Ts = [pose(i) for i in range(n_frames)]
    rng = np.random.default_rng(0)
    refs, pxs, depths, ptsws, patches, frames_s = [], [], [], [], [], []
    for s in range(S):
        scene = PlaneScene(cam, plane_z=3.0, seed=s, tex_per_meter=220.0)
        T_ref = SE3.identity()
        img_ref = scene.render(T_ref, (H, W))
        px = jnp.asarray(
            np.c_[rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)],
            jnp.float32)
        depth = scene.depth(px, T_ref)
        pts_w = cam.pixel_to_world(px, T_ref, depth=depth, distorted=False)
        refs.append(img_ref); pxs.append(px); depths.append(depth)
        ptsws.append(pts_w)
        patches.append(sample_patches(img_ref, px, 10))
        frames_s.append(jnp.stack([
            scene.render(T, (H, W)) for T in Ts[:8]]))  # 8 test frames
    img_ref_s = jnp.stack(refs)
    px_s = jnp.stack(pxs); depth_s = jnp.stack(depths)
    ptsw_s = jnp.stack(ptsws); patch_s = jnp.stack(patches)
    mask_s = jnp.ones((S, N), bool)
    frames8 = jnp.stack(frames_s, axis=1)      # [8, S, H, W]

    build_pyr_s = lambda imgs: jax.vmap(
        lambda im: pyramid.build_pyramid(im, 3))(imgs)
    ref_pyr_s = build_pyr_s(img_ref_s)
    ref_preps = [prepare_reference(
        tuple(r[s] for r in ref_pyr_s), cam, px_s[s], depth_s[s],
        mask_s[s], distorted=False) for s in range(S)]
    a2d_prep = align2d_prepare(patch_s.reshape(S * N, 10, 10))
    T0 = SE3.identity(batch_shape=(S,)).params7()

    REPEAT = 30   # scan depth: amortize dispatch like bench_batch

    def timed(name, step_fn):
        """step_fn: (T7, imgs[S,H,W]) -> T7.  Scan REPEAT times over
        the 8 test frames cyclically."""
        @jax.jit
        def chunk(T7, frames8):
            def body(T7, i):
                T7 = step_fn(T7, frames8[i % 8])
                return T7, ()
            T7, _ = jax.lax.scan(body, T7, jnp.arange(REPEAT))
            return T7
        out = chunk(T0, frames8); jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            jax.block_until_ready(chunk(T0, frames8))
            ts.append(time.perf_counter() - t)
        ms = np.median(ts) / REPEAT * 1e3
        print(f"{name:28s}: {ms:8.3f} ms/step "
              f"({ms/S*1000:7.1f} us/frame)")
        return ms

    import os
    SKIP = os.environ.get("SKIP_STAGES", "").split(",")
    # Stage: pyramid only
    def step_pyr(T7, imgs):
        cp = build_pyr_s(imgs)
        return T7 + 0 * cp[0][0, 0, 0]
    ("pyramid" in SKIP) or timed("pyramid", step_pyr)

    # Stage: pyramid + batched sparse align
    def step_sparse(T7, imgs):
        cp = build_pyr_s(imgs)
        T = bt.batched_sparse_align(
            ref_pyr_s, cp, cam, px_s, depth_s, mask_s,
            SE3.from_params7(T7), ref_preps=ref_preps)
        return T.params7()
    t_sp = ("pyr+sparse" in SKIP) or timed("pyr+sparse", step_sparse)

    # Stage: pyramid + batched align2d (projection at T_init)
    def step_a2d(T7, imgs):
        cp = build_pyr_s(imgs)
        T = SE3.from_params7(T7)
        proj = jax.vmap(
            lambda Ti, p: cam.world_to_pixel(p, Ti, distorted=True)
        )(T, ptsw_s)
        xy, conv, _ = bt.batched_align2d(cp[0], patch_s, proj,
                                         a2d_prep=a2d_prep)
        return T7 + 0 * xy[0, 0, 0]
    timed("pyr+align2d", step_a2d)

    # Stage: pyramid + vmapped pose BA (obs = gt projections)
    from ygz_slam_tpu.solvers.ba import pose_only_ba
    def step_ba(T7, imgs):
        cp = build_pyr_s(imgs)
        T = SE3.from_params7(T7)
        proj = jax.vmap(
            lambda Ti, p: cam.world_to_pixel(p, Ti, distorted=True)
        )(T, ptsw_s)
        T_out, inl, _ = jax.vmap(
            lambda Ti, p, o, m: pose_only_ba(Ti, p, o, m, cam,
                                             use_fused=False)
        )(T, ptsw_s, proj, mask_s)
        return T_out.params7() + 0 * cp[0][0, 0, 0]
    timed("pyr+poseBA(vmap-xla)", step_ba)

    # Stage: pose BA via the FUSED kernel vmapped (probably bad: S
    # separate kernel launches) — comparison point.
    def step_ba_fused(T7, imgs):
        cp = build_pyr_s(imgs)
        T = SE3.from_params7(T7)
        proj = jax.vmap(
            lambda Ti, p: cam.world_to_pixel(p, Ti, distorted=True)
        )(T, ptsw_s)
        outs = []
        for s in range(S):
            Ti = jax.tree.map(lambda a: a[s], T)
            To, _, _ = pose_only_ba(Ti, ptsw_s[s], proj[s], mask_s[s],
                                    cam, use_fused=True)
            outs.append(To.params7())
        return jnp.stack(outs) + 0 * cp[0][0, 0, 0]
    timed("pyr+poseBA(loop-fused)", step_ba_fused)

    # Full step
    def step_full(T7, imgs):
        cp = build_pyr_s(imgs)
        T_out, inl = bt.batched_track_step(
            ref_pyr_s, cp, cam, px_s, depth_s, mask_s, ptsw_s, patch_s,
            SE3.from_params7(T7), ref_preps=ref_preps, a2d_prep=a2d_prep)
        return T_out.params7()
    timed("FULL step", step_full)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
