"""Multi-sequence batch tracking benchmark: aggregate frames/s on one
chip when S sequences are tracked simultaneously.

The per-sequence frame loop is sequential, but sequences are
embarrassingly parallel — the batch dimension is how a serving
deployment fills the chip (SURVEY.md §2.4: batched per-point kernels
are the data-parallel dimension that replaces SSE2/NEON; BASELINE.json
config 5 is 16 concurrent TUM sequences).  Workload per sequence is
the same envelope as bench.py (640x480, 3 levels, 200 points, full
track step: sparse-direct alignment + map patch alignment + pose-only
BA) on the same REALISTIC smooth trajectory (~1.5-2 px/frame motion,
0.5% sensor noise, per-frame ground-truth gate); each sequence views
its own scene.  All S sequences advance one frame per fused step, a
chunk of steps runs as one on-device lax.scan.

Usage: python bench_batch.py [S] [--old]   (--old = the pre-fusion
per-iteration-gather formulation, for same-script A/B).

Prints ONE JSON line; vs_baseline = aggregate fps / 100 (the
BASELINE.json single-chip tracking target).
"""
import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main(S: int = 8, n_frames: int = 60, use_fused: bool = True):
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.ops.sparse_align import prepare_reference
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare
    from ygz_slam_tpu.parallel import batch_tracking as bt
    from ygz_slam_tpu.utils.synthetic import PlaneScene
    import _bench_common as bc

    bt.USE_FUSED_BATCH = use_fused
    H, W, N = 480, 640, 200

    cam = PinholeCamera.create(517.3, 516.5, W / 2, H / 2)

    # The same smooth-trajectory envelope as bench.py (bc.make_workload
    # pose schedule), shared across sequences; each sequence renders
    # its own scene.
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
    T_gt7 = jnp.stack([T.params7() for T in Ts])

    rng = np.random.default_rng(0)
    refs, pxs, depths, ptsws, patches, frames_s = [], [], [], [], [], []
    for s in range(S):
        scene = PlaneScene(cam, plane_z=3.0, seed=s, tex_per_meter=220.0)
        T_ref = SE3.identity()
        img_ref = scene.render(T_ref, (H, W))
        px = jnp.asarray(
            np.c_[rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)],
            jnp.float32,
        )
        depth = scene.depth(px, T_ref)
        pts_w = cam.pixel_to_world(px, T_ref, depth=depth, distorted=False)
        refs.append(img_ref)
        pxs.append(px)
        depths.append(depth)
        ptsws.append(pts_w)
        patches.append(sample_patches(img_ref, px, 10))
        seq_frames = []
        for i, T in enumerate(Ts):
            img = scene.render(T, (H, W)) + jnp.asarray(
                np.random.default_rng(1000 * s + i).normal(
                    0, bc.NOISE, (H, W)), jnp.float32)
            seq_frames.append(img)
        frames_s.append(jnp.stack(seq_frames))

    img_ref_s = jnp.stack(refs)          # [S, H, W]
    px_s = jnp.stack(pxs)
    depth_s = jnp.stack(depths)
    ptsw_s = jnp.stack(ptsws)
    patch_s = jnp.stack(patches)
    mask_s = jnp.ones((S, N), bool)
    frames = jnp.stack(frames_s, axis=1)  # [F, S, H, W]

    def build_pyr_s(imgs):
        return jax.vmap(lambda im: pyramid.build_pyramid(im, 3))(imgs)

    ref_pyr_s = build_pyr_s(img_ref_s)

    # Keyframe-constant hoists (per-sequence reference prep + flattened
    # align2d patch prep) — computed once, reused every frame.
    ref_preps = [
        prepare_reference(
            tuple(r[s] for r in ref_pyr_s), cam, px_s[s], depth_s[s],
            mask_s[s], distorted=False,
        )
        for s in range(S)
    ]
    a2d_prep = align2d_prepare(patch_s.reshape(S * N, 10, 10))

    def track_step(T7, imgs):
        cur_pyr_s = build_pyr_s(imgs)
        T_out, inl = bt.batched_track_step(
            ref_pyr_s, cur_pyr_s, cam, px_s, depth_s, mask_s,
            ptsw_s, patch_s, SE3.from_params7(T7),
            ref_preps=ref_preps, a2d_prep=a2d_prep,
        )
        return T_out.params7(), inl

    @jax.jit
    def track_chunk(T7, frames):
        def body(T7, imgs):
            T7n, inl = track_step(T7, imgs)
            return T7n, (T7n, inl)

        return jax.lax.scan(body, T7, frames)

    T0 = jnp.tile(SE3.identity().params7()[None], (S, 1))
    out = track_chunk(T0, frames)        # compile + warm-up
    jax.block_until_ready(out)
    T7_fin, (T7_all, inliers) = out      # [F, S, 7], [F, S, N->sum]
    # Accuracy gate: EVERY sequence's EVERY frame lands on its ground
    # truth with healthy inliers (batched, one dispatch).
    d = jax.jit(jax.vmap(jax.vmap(
        lambda a, b: se3.distance(SE3.from_params7(a), SE3.from_params7(b)),
        in_axes=(0, None)), in_axes=(0, 0)))(T7_all, T_gt7)
    max_err = float(jnp.max(d))
    min_inl = int(jnp.min(inliers))
    assert max_err < 2e-2, f"tracking inaccurate: {max_err}"
    assert min_inl > 0.75 * N, f"inliers collapsed: {min_inl}/{N}"

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
        "fused_path": use_fused,
        "max_pose_err": round(max_err, 5),
        "min_inliers": min_inl,
    }))


if __name__ == "__main__":
    S = 8
    use_fused = True
    for a in sys.argv[1:]:
        if a == "--old":
            use_fused = False
        else:
            S = int(a)
    main(S, use_fused=use_fused)
