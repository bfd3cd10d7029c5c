"""Same-script stage-marginal profile of the tracking step on real TPU.

Builds bench.py's exact workload as a family of chunk variants that
each DROP one stage suffix (full / no-poseBA / no-align2d / sparse-only
/ pyramid-only), times each at the bench level (median of 3 chunk
executions), and prints per-stage marginal ms/frame.  Single-op
microbenches over the axon tunnel are bimodal, so stage costs are only
trustworthy as differences of full-chunk timings in ONE script run
(see _bench_ablate.py).

Each skipped stage's inputs are still folded (at epsilon weight) into
the scan carry so XLA cannot dead-code-eliminate the stages that
remain.
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N_FRAMES = 120


def build(variant):
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

    def track_step(T7, img):
        eps_mix = jnp.float32(0.0)
        cur_pyr = pyramid.build_pyramid(img, 3)
        if variant == "pyramid":
            # keep the pyramid live via an epsilon fold into the carry
            eps_mix = 1e-12 * (jnp.sum(cur_pyr[2]))
            return T7 + eps_mix, jnp.int32(0)
        T = SE3.from_params7(T7)
        if variant != "align2d_only":
            stats = sparse_image_align(
                ref_pyr, cur_pyr, cam, px, depth, mask,
                T, distorted=False, ref_prep=ref_prep,
            )
            T = stats.T_cur_ref
        if variant == "sparse":
            return T.params7(), jnp.int32(0)
        proj = cam.world_to_pixel(pts_w, T, distorted=False)
        ares = align2d(cur_pyr[0], patches, proj, prep=a2d_prep)
        if variant in ("no_poseba", "align2d_only"):
            eps_mix = 1e-12 * jnp.sum(ares.xy)
            return T.params7() + eps_mix, jnp.sum(ares.converged & mask)
        Tn, inlier, chi2 = pose_only_ba(
            T, pts_w, ares.xy, ares.converged & mask, cam
        )
        return Tn.params7(), jnp.sum(inlier)

    frames = jnp.stack([img_cur + 0.01 * i for i in range(N_FRAMES)])

    @jax.jit
    def track_chunk(T7, frames):
        def body(T7, img):
            T7n, inl = track_step(T7, img)
            return T7n, inl
        return jax.lax.scan(body, T7, frames)

    return track_chunk, SE3.identity().params7(), frames


def time_variant(name):
    track_chunk, T0, frames = build(name)
    out = track_chunk(T0, frames)
    jax.block_until_ready(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = track_chunk(T0, frames)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    ms = sorted(dts)[1] / N_FRAMES * 1e3
    print(json.dumps({"variant": name, "ms_per_frame": round(ms, 4)}),
          flush=True)
    return ms


def main():
    ms = {}
    for v in ["pyramid", "sparse", "no_poseba", "full", "align2d_only"]:
        ms[v] = time_variant(v)
    print(json.dumps({
        "marginal_ms": {
            "pyramid": round(ms["pyramid"], 4),
            "sparse_align": round(ms["sparse"] - ms["pyramid"], 4),
            "align2d": round(ms["no_poseba"] - ms["sparse"], 4),
            "pose_ba": round(ms["full"] - ms["no_poseba"], 4),
            "align2d_only_check": round(ms["align2d_only"] - ms["pyramid"], 4),
            "full": round(ms["full"], 4),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
