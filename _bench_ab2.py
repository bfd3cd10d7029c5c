"""Same-script A/B ladder for the fused-kernel upgrades on real TPU,
on the realistic-trajectory workload (_bench_common).

Variants (cumulative, all timed at the bench level in ONE run):
  A base       : unrolled v1 sparse kernel, XLA pose BA, unrolled align2d
  B pose_fused : + pose-only BA as one Pallas kernel (while early exit)
  C sparse_v2  : + frozen-H substitution-only sparse kernel (early exit)
  D a2d_ee     : + align2d in-kernel while early exit
Each variant passes the per-frame accuracy gate before being timed.
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import _bench_common as bc


def build(pose_fused: bool, sparse_variant: int, a2d_ee: bool,
          full_fused: bool = False, sp_iter: int = 30,
          n_frames: int = 120, a2d_origin_hoist: bool = False,
          unified_gather: bool = False):
    from ygz_slam_tpu.geometry import SE3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.align import align2d
    from ygz_slam_tpu.ops import sparse_align as sa
    from ygz_slam_tpu.ops.sparse_align import (
        prepare_reference, sparse_image_align,
    )
    from ygz_slam_tpu.ops.pallas import align2d_fused as _af
    from ygz_slam_tpu.solvers.ba import pose_only_ba
    from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare

    sa.FUSED_VARIANT = sparse_variant
    _af.EARLY_EXIT = a2d_ee

    cam, px, depth, mask, pts_w, patches, ref_pyr, frames, T_gt7 = (
        bc.make_workload(n_frames)
    )
    ref_prep = prepare_reference(ref_pyr, cam, px, depth, mask,
                                 distorted=False)
    a2d_prep = align2d_prepare(patches)

    # World frame == ref-keyframe camera frame here (T_ref = identity),
    # so the landmark array doubles as the ref-frame point set the
    # fused whole-step kernel expects.
    if full_fused:
        from ygz_slam_tpu.ops.pallas.track_fused import track_step_fused

        def track_step(T_init7, img):
            cur_pyr = pyramid.build_pyramid(img, 3)
            T = SE3.from_params7(T_init7)
            R, t, chi2_sp, chi2_ba, n_inl, xy, err, conv, inlier = (
                track_step_fused(
                    cur_pyr, ref_prep.levels, ref_prep.p_ref, a2d_prep,
                    pts_w, mask, T.R, T.t, cam, distorted=False,
                    max_level=2,
                )
            )
            return SE3(R, t).params7(), n_inl.astype(jnp.int32)
    else:
        def track_step(T_init7, img):
            cur_pyr = pyramid.build_pyramid(img, 3)
            T0 = SE3.from_params7(T_init7)
            org = (cam.world_to_pixel(pts_w, T0, distorted=False)
                   if (a2d_origin_hoist or unified_gather) else None)
            fw = None
            if unified_gather:
                fw = sa.gather_frame_windows(
                    cur_pyr, cam, ref_prep, T0, distorted=False,
                    max_level=2, a2d_centers=org,
                )
            stats = sparse_image_align(
                ref_pyr, cur_pyr, cam, px, depth, mask,
                T0, distorted=False,
                ref_prep=ref_prep, n_iter=sp_iter, frame_windows=fw,
            )
            proj = cam.world_to_pixel(pts_w, stats.T_cur_ref,
                                      distorted=False)
            ares = align2d(
                cur_pyr[0], patches, proj, prep=a2d_prep,
                origin_xy=None if unified_gather else org,
                pregathered=None if fw is None else fw.a2d,
            )
            T, inlier, chi2 = pose_only_ba(
                stats.T_cur_ref, pts_w, ares.xy, ares.converged & mask,
                cam, use_fused=pose_fused,
            )
            return T.params7(), jnp.sum(inlier)

    @jax.jit
    def track_chunk(T7, frames):
        def body(T7, img):
            T7n, inl = track_step(T7, img)
            return T7n, (T7n, inl)
        return jax.lax.scan(body, T7, frames)

    return track_chunk, SE3.identity().params7(), frames, T_gt7


def time_variant(name, **flags):
    track_chunk, T0, frames, T_gt7 = build(**flags)
    n_frames = frames.shape[0]
    out = track_chunk(T0, frames)
    jax.block_until_ready(out)
    T7_final, (T7_all, inliers) = out
    max_err, min_inl, ok = bc.gate(T7_all, inliers, T_gt7)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = track_chunk(T0, frames)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    fps = n_frames / sorted(dts)[1]
    print(json.dumps({
        "variant": name, "fps": round(fps, 1),
        "max_pose_err": round(max_err, 5), "min_inliers": min_inl,
        "gate_ok": ok,
    }), flush=True)
    return fps


def main():
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "ACE"
    fps = {}
    if "A" in which:
        fps["A"] = time_variant("A_base", pose_fused=False,
                                sparse_variant=1, a2d_ee=False)
    if "B" in which:
        fps["B"] = time_variant("B_pose_fused", pose_fused=True,
                                sparse_variant=1, a2d_ee=False)
    if "C" in which:
        fps["C"] = time_variant("C_sparse_v2", pose_fused=True,
                                sparse_variant=2, a2d_ee=False)
    if "D" in which:
        fps["D"] = time_variant("D_a2d_ee", pose_fused=True,
                                sparse_variant=2, a2d_ee=True)
    if "E" in which:
        fps["E"] = time_variant("E_sparse_mega", pose_fused=True,
                                sparse_variant=3, a2d_ee=False)
    if "F" in which:
        fps["F"] = time_variant("F_full_fused", pose_fused=True,
                                sparse_variant=3, a2d_ee=False,
                                full_fused=True)
    if "G" in which:
        # Sub-tile-shift strategy ladder, same script.
        from ygz_slam_tpu.ops.pallas import align2d_kernel as _akm
        _akm.SHIFT_MODE = "takes"
        fps["E_takes"] = time_variant("E_xla_takes", pose_fused=True,
                                      sparse_variant=3, a2d_ee=False)
        _akm.SHIFT_MODE = "matmul"
        fps["G_matmul"] = time_variant("G_shift_matmul", pose_fused=True,
                                       sparse_variant=3, a2d_ee=False)
    if "H" in which:
        # Gather grid-step amortization: CHUNK 25 (8 steps/gather) vs
        # 100 (2 steps/gather) — ~4 us/step Mosaic pipeline overhead.
        from ygz_slam_tpu.ops.pallas import align2d_kernel as _akm
        _akm.CHUNK = 25
        fps["H25"] = time_variant("H_chunk25", pose_fused=True,
                                  sparse_variant=3, a2d_ee=False)
        _akm.CHUNK = 100
        fps["H100"] = time_variant("H_chunk100", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False)
    if "1" in which:
        from ygz_slam_tpu.ops.pallas import align2d_kernel as _akm
        _akm._TIMING_PROBE = "skip_takes"
        fps["Y1"] = time_variant("Y1_skip_takes", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False)
        _akm._TIMING_PROBE = ""
    if "2" in which:
        from ygz_slam_tpu.ops.pallas import align2d_kernel as _akm
        _akm._TIMING_PROBE = "skip_gather"
        fps["Y2"] = time_variant("Y2_skip_gather", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False)
        _akm._TIMING_PROBE = ""
    if "M" in which:
        # Pose-BA round-0 MAD: hoisted XLA sorts vs in-kernel bisection.
        from ygz_slam_tpu.ops.pallas import pose_ba_fused as _pbm
        _pbm.MAD_IN_KERNEL = False
        fps["Msort"] = time_variant("M_mad_hoisted", pose_fused=True,
                                    sparse_variant=3, a2d_ee=False,
                                    n_frames=480)
        _pbm.MAD_IN_KERNEL = True
        fps["Mbis"] = time_variant("M_mad_in_kernel", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False,
                                   n_frames=480)
    if "V" in which:
        # align2d cache window 32 vs 24 (1.78x less roll traffic,
        # slack 11 -> 7 px; 576-lane rolls probe-verified legal).
        from ygz_slam_tpu.ops.pallas import align2d_kernel as _akm
        from ygz_slam_tpu.ops.pallas import align2d_fused as _afm

        def _set_win(win):
            _akm.CACHE_WIN = win
            _akm.CACHE_SLACK = (win - _akm.PATCH - 1) // 2
            _afm.CACHE_WIN = win
            _afm.CACHE_SLACK = _akm.CACHE_SLACK
            _afm.FLAT = win * win
            smax = (win - _afm.PATCH - 1) * win + (win - _afm.PATCH - 1)
            _afm._SMAX_BITS = max(smax.bit_length(), 1)

        _set_win(32)
        fps["V32"] = time_variant("V_win32", pose_fused=True,
                                  sparse_variant=3, a2d_ee=False,
                                  n_frames=480)
        _set_win(24)
        fps["V24"] = time_variant("V_win24", pose_fused=True,
                                  sparse_variant=3, a2d_ee=False,
                                  n_frames=480)
        _set_win(32)
    if "W" in which:
        # align2d window math f32 vs bf16 (halved roll traffic).
        from ygz_slam_tpu.ops.pallas import align2d_fused as _afm
        _afm.BF16_WINDOWS = False
        fps["W32"] = time_variant("W_a2d_f32", pose_fused=True,
                                  sparse_variant=3, a2d_ee=False,
                                  n_frames=480)
        _afm.BF16_WINDOWS = True
        fps["W16"] = time_variant("W_a2d_bf16", pose_fused=True,
                                  sparse_variant=3, a2d_ee=False,
                                  n_frames=480)
        _afm.BF16_WINDOWS = False
    if "L" in which:
        # Chunk-length ladder: fixed per-execution overhead shows as a
        # throughput jump when the chunk doubles.
        fps["L120"] = time_variant("L_chunk120", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False,
                                   n_frames=120)
        fps["L240"] = time_variant("L_chunk240", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False,
                                   n_frames=240)
        fps["L480"] = time_variant("L_chunk480", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False,
                                   n_frames=480)
    if "O" in which:
        # align2d window gather at the frame-INIT pose projection:
        # the fetch no longer waits on the sparse-align kernel.
        fps["O0"] = time_variant("O_a2d_gather_post", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False,
                                 n_frames=480)
        fps["O1"] = time_variant("O_a2d_gather_init", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False,
                                 n_frames=480, a2d_origin_hoist=True)
    if "R" in which:
        # align2d delta-roll sampling: 5 rolls/iter after the first
        # full positioning (vs 10), <=1 px/iter step clamp.
        from ygz_slam_tpu.ops.pallas import align2d_fused as _afm
        _prev_delta_rolls = _afm.DELTA_ROLLS
        _afm.DELTA_ROLLS = False
        fps["R0"] = time_variant("R_full_rolls", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False,
                                 n_frames=480)
        _afm.DELTA_ROLLS = True
        fps["R1"] = time_variant("R_delta_rolls", pose_fused=True,
                                 sparse_variant=3, a2d_ee=False,
                                 n_frames=480)
        # Restore the module default so later variants in the same
        # invocation (U/X/Z) run the intended configuration.
        _afm.DELTA_ROLLS = _prev_delta_rolls
    if "U" in which:
        # ALL 4 window gathers (3 sparse levels + align2d cache) in one
        # pallas_call, everything fetched at the frame-init pose.
        fps["U"] = time_variant("U_unified_gather", pose_fused=True,
                                sparse_variant=3, a2d_ee=False,
                                n_frames=480, unified_gather=True)
    if "X" in which:
        # Chunk 960: further amortization of the ~26 ms fixed dispatch.
        fps["X960"] = time_variant("X_chunk960", pose_fused=True,
                                   sparse_variant=3, a2d_ee=False,
                                   n_frames=960, a2d_origin_hoist=True)
    if "Z" in which:
        # Fixed-cost probe: sparse GN loop never runs (gathers +
        # H assembly + launch + align2d + pose BA remain).  The gate
        # fails by construction — timing only.
        fps["Z"] = time_variant("Z_sp0_probe", pose_fused=True,
                                sparse_variant=3, a2d_ee=False,
                                sp_iter=0)
    keys = sorted(fps)
    print(json.dumps({
        "speedups_vs_first": {
            k: round(fps[k] / fps[keys[0]], 3) for k in keys
        }
    }), flush=True)


if __name__ == "__main__":
    main()
