"""Same-script stage-marginal profile of the tracking step on real TPU.

Builds the realistic-trajectory workload (_bench_common) as a family
of chunk variants that each DROP one stage suffix (full / no-poseBA /
sparse-only / pyramid-only / align2d-only), times each at the bench
level (median of 3 chunk executions), and prints per-stage marginal
ms/frame.  Single-op microbenches over the axon tunnel are bimodal, so
stage costs are only trustworthy as differences of full-chunk timings
in ONE script run (see _bench_ablate.py).

Each skipped stage's inputs are still folded (at epsilon weight) into
the scan carry so XLA cannot dead-code-eliminate the stages that
remain.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import _bench_common as bc


def build(variant):
    from ygz_slam_tpu.geometry import SE3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align,
    )
    from ygz_slam_tpu.solvers import pose_only_ba
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare

    cam, px, depth, mask, pts_w, patches, ref_pyr, frames, T_gt7 = (
        bc.make_workload()
    )
    ref_prep = prepare_reference(ref_pyr, cam, px, depth, mask,
                                 distorted=False)
    a2d_prep = align2d_prepare(patches)

    def track_step(T7, img):
        eps_mix = jnp.float32(0.0)
        cur_pyr = pyramid.build_pyramid(img, 3)
        if variant == "pyramid":
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
    ms = sorted(dts)[1] / frames.shape[0] * 1e3
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
