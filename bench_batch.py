"""Multi-sequence batch tracking benchmark: aggregate frames/s on one
chip when S sequences are tracked simultaneously.

The per-sequence frame loop is sequential, but sequences are
embarrassingly parallel — the batch dimension is how a serving
deployment fills the chip (SURVEY.md §2.4: batched per-point kernels
are the data-parallel dimension that replaces SSE2/NEON; BASELINE.json
config 5 is 16 concurrent TUM sequences).  Workload per sequence is
the same envelope as bench.py (640x480, 3 levels, 200 points, full
track step: sparse-direct alignment + map patch alignment + pose-only
BA), all S sequences advanced by one fused jit call per frame chunk.

Prints ONE JSON line; vs_baseline = aggregate fps / 100 (the
BASELINE.json single-chip tracking target).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main(S: int = 8, n_frames: int = 10):
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.parallel import batched_track_step
    from ygz_slam_tpu.utils.synthetic import PlaneScene

    H, W, N = 480, 640, 200
    cam = PinholeCamera.create(517.3, 516.5, W / 2, H / 2)
    T_cur = se3.exp(jnp.asarray([0.04, -0.02, 0.01, 0.004, -0.006, 0.003]))

    refs, curs, pxs, depths, ptsws, patches = [], [], [], [], [], []
    rng = np.random.default_rng(0)
    for s in range(S):
        scene = PlaneScene(cam, plane_z=3.0, seed=s, tex_per_meter=220.0)
        T_ref = SE3.identity()
        img_ref = scene.render(T_ref, (H, W))
        img_cur = scene.render(T_cur, (H, W))
        px = jnp.asarray(
            np.c_[rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)],
            jnp.float32,
        )
        depth = scene.depth(px, T_ref)
        pts_w = cam.pixel_to_world(px, T_ref, depth=depth, distorted=False)
        refs.append(img_ref)
        curs.append(img_cur)
        pxs.append(px)
        depths.append(depth)
        ptsws.append(pts_w)
        patches.append(sample_patches(img_ref, px, 10))

    img_ref_s = jnp.stack(refs)          # [S, H, W]
    img_cur_s = jnp.stack(curs)
    px_s = jnp.stack(pxs)
    depth_s = jnp.stack(depths)
    ptsw_s = jnp.stack(ptsws)
    patch_s = jnp.stack(patches)
    mask_s = jnp.ones((S, N), bool)

    def build_pyr_s(imgs):
        return jax.vmap(lambda im: pyramid.build_pyramid(im, 3))(imgs)

    ref_pyr_s = build_pyr_s(img_ref_s)

    def track_step(T7, imgs):
        cur_pyr_s = build_pyr_s(imgs)
        T_out, inl = batched_track_step(
            ref_pyr_s, cur_pyr_s, cam, px_s, depth_s, mask_s,
            ptsw_s, patch_s, SE3.from_params7(T7),
        )
        return T_out.params7(), inl

    frames = jnp.stack(
        [img_cur_s + 0.01 * i for i in range(n_frames)]
    )                                     # [F, S, H, W]

    @jax.jit
    def track_chunk(T7, frames):
        def body(T7, imgs):
            T7n, inl = track_step(T7, imgs)
            return T7n, inl

        return jax.lax.scan(body, T7, frames)

    T0 = jnp.tile(SE3.identity().params7()[None], (S, 1))
    out = track_chunk(T0, frames)        # compile + warm-up
    jax.block_until_ready(out)
    T7_fin, inliers = out
    # Accuracy gate: every sequence must land on T_cur with healthy
    # inliers (frames view the T_cur scene).
    from ygz_slam_tpu.geometry import se3 as se3m
    for s in range(S):
        err = float(se3m.distance(
            SE3.from_params7(T7_fin[s]),
            SE3.from_params7(T_cur.params7()),
        ))
        assert err < 2e-2, f"seq {s} inaccurate: {err}"
    min_inl = int(jnp.min(inliers))
    assert min_inl > 0.8 * N, f"inliers collapsed: {min_inl}/{N}"

    # Median of 3 timed reps (remote-TPU tunnel noise).
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = track_chunk(T0, frames)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    fps = S * n_frames / sorted(dts)[1]
    print(json.dumps({
        "metric": f"batch_tracking_aggregate_fps_{S}seq",
        "value": round(fps, 2),
        "unit": "frames/s (aggregate)",
        "vs_baseline": round(fps / 100.0, 3),
    }))


if __name__ == "__main__":
    import sys

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(S)
