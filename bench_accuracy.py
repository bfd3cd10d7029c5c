"""Long-trajectory accuracy benchmark: ATE/RPE on a 2000-frame
non-planar loop with photometric perturbation, plus the loop-closure
ablation.

This is the BASELINE.md "ATE RMSE" metric's stand-in for TUM data
(none ships in this environment; the reference's own integration tests
parse real sequences, test/test_vo_init.cpp:26-39).  The world is a
six-face textured box room (utils/synthetic.BoxScene): multi-textured,
genuinely non-planar (depth 2.2-7 m with occluding corners), rendered
with per-frame exposure gain/bias drift and lens vignetting.  The
camera loops 2.4 laps, so the entire second+ lap revisits archived
first-lap keyframes — sustained archive loop-closure opportunity,
whose ATE effect is measured by the `--no-loop` ablation.  (Round-3's
1.08-lap cut overlapped the start only in its final ~150 frames and
its loop machinery demonstrably never fired on the recorded run;
round-4 re-cut per VERDICT #1.)

Usage:
  python bench_accuracy.py [--frames 1200] [--no-loop] [--json-only]
Prints one JSON line; `python tools/update_results.py` folds the
numbers into RESULTS.md.
"""
import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.system import trajectory as traj
from ygz_slam_tpu.utils.synthetic import BoxScene, loop_trajectory

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def render_benchmark(n_frames, seed=0, horizon=None, photos=False):
    """`horizon` sets the trajectory's frame count (and so its
    per-frame motion); n_frames <= horizon renders a prefix — used by
    the fast regression-gate test, which cannot afford 1200 frames but
    must see the SAME motion profile."""
    # Round-4 re-cut (VERDICT #1/#2): 2.2 laps so the entire second
    # lap revisits archived first-lap keyframes, and face="out" locks
    # the view to the outward radial — the legacy trajectory actually
    # swept the view through inward/tangent/outward twice per lap
    # (measured; see loop_trajectory), and its 4-per-lap grazing
    # corridor alignments were exactly where round-3 lost track.
    # radius 1.8 keeps every wall >=2.2 m away; measured per-frame
    # flow is uniform at ~3.0-4.4 px (median), inside the 3-level
    # sparse-align envelope, with no grazing sections at all.
    tex = None
    if photos:
        # REAL pixels through the whole pipeline (VERDICT r4 #5): the
        # six walls carry the reference tree's DBoW3 demo photographs
        # (mirror-tiled to 2048^2) instead of procedural textures.
        from ygz_slam_tpu.utils.synthetic import photo_textures
        tex = photo_textures(tex_size=2048)
    scene = BoxScene(CAM, seed=seed, vignette=0.25, textures=tex)
    poses = loop_trajectory(horizon or n_frames, radius=1.8, laps=2.2,
                            seed=seed, face="out")[:n_frames]
    for k, T in enumerate(poses):
        gain = 1.0 + 0.08 * np.sin(2 * np.pi * k / 400.0)
        bias = 4.0 * np.sin(2 * np.pi * k / 270.0)
        yield k, T, scene.render(T, SHAPE, gain=gain, bias=bias)


def run(n_frames, loop_closing=True, seed=0, log_every=100,
        horizon=None, n_levels=3, photos=False):
    # Operating point: at the default 2000 frames/1.08 laps the
    # camera moves ~0.3 m/s at 30 fps (max flow ~4 px/frame at the
    # nearest-wall approach) — inside the 3-level sparse-align
    # envelope.  At 1200 frames (0.5 m/s, 6-7 px peaks) the direct
    # tracker loses track in the fast sections: 4 levels move the
    # failure points around (coarse 30x40 patches straddle the box's
    # occluding corners) rather than removing them — both measured,
    # see CLAUDE.md round-3 notes.
    vo = VisualOdometry(CAM, VOOptions(
        init_min_disparity=15.0, kf_min_frames=5,
        kf_max_trans=0.04, kf_max_rot=0.05,
        n_levels=n_levels,
        # The default tracking-lost gate (30 inliers; the reference's
        # own gate is a config value, LocalMapping.h:19) trips on
        # TRANSIENT dips: the hardest wall sections support ~15-19
        # matches for a few frames with next-frame recovery.  15 is
        # the round-4-proven operating point; the round-5 hysteresis
        # (track_confirm_frames=2, hard floor 7, descriptor-verified
        # ride-through) absorbs single-frame dips BELOW it, and a
        # gate-20 experiment showed sustained 15-19 sections must
        # track, not coast (segment ATE tripled when they rode
        # marginal status for dozens of frames).
        min_track_inliers=15,
        # Extended-LOST instead of reset: the recurring hard section
        # (~frame 588 region) fails retries for ~12 frames; with the
        # default 10-frame budget that is a RESET (new world frame,
        # new scale, segment split).  40 frames of retry+reloc lets
        # the camera move back into trackable texture and recover
        # into the SAME map — one pose jump instead of a segment
        # boundary.
        lost_reset_frames=40,
        loop_closing=loop_closing,
    ))
    gt_by_fid = {}
    t0 = time.time()
    n_good = 0
    last_status = None
    events = []
    for k, T, img in render_benchmark(n_frames, seed, horizon, photos):
        gt_by_fid[k] = T
        r = vo.add_frame(img, timestamp=float(k))
        n_good += r.status == Status.GOOD
        if r.status != last_status:
            events.append((k, r.status.name, int(r.n_inliers)))
            if log_every:
                print(f"  [transition] frame {k}: {r.status.name} "
                      f"inliers={r.n_inliers} "
                      f"kf={len(vo.server.kf_used)}", file=sys.stderr)
            last_status = r.status
        if log_every and (k + 1) % log_every == 0:
            print(f"  frame {k+1}/{n_frames} status={r.status.name} "
                  f"kf={len(vo.server.kf_used)} arc={vo.archive.count} "
                  f"loops={vo.stats.get('loops_closed_global', 0)}"
                  f"+{vo.stats.get('loops_closed_active', 0)} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)
    # Corrected trajectory (keyframe-anchored, pose-graph-aware).
    out = vo.trajectory_poses()
    est, gt, fids = [], [], []
    for ts, p7 in out:
        fid = int(ts)
        if fid in gt_by_fid:
            est.append(SE3.from_params7(jnp.asarray(p7)))
            gt.append(gt_by_fid[fid])
            fids.append(fid)
    est_c = traj.camera_centers(est)
    gt_c = traj.camera_centers(gt)
    ate = traj.ate_rmse(est_c, gt_c, with_scale=True)  # monocular: Sim3
    # RPE in metric units: put the est trajectory on the gt scale
    # first (monocular maps are mean-depth-1).
    s_align, _, _ = traj.umeyama_align(est_c, gt_c, with_scale=True)
    est_m = [SE3(e.R, e.t * s_align) for e in est]
    rpe_t, rpe_r = traj.rpe_rmse(est_m, gt, delta=1)
    # ODOMETRIC export (corrected=False): pose-graph corrections trade
    # local smoothness for global consistency; users take the
    # corrected trajectory for ATE and the odometric one for RPE
    # (VERDICT r4 #8).  Same frame set as `out`.
    raw = dict(vo.trajectory_poses(corrected=False))
    est_raw = [SE3.from_params7(jnp.asarray(raw[float(f)]))
               for f in fids if float(f) in raw]
    est_raw_c = traj.camera_centers(est_raw)
    s_raw, _, _ = traj.umeyama_align(est_raw_c, gt_c, with_scale=True)
    est_raw_m = [SE3(e.R, e.t * s_raw) for e in est_raw]
    rpe_t_raw, rpe_r_raw = traj.rpe_rmse(est_raw_m, gt, delta=1)
    # Per-SEGMENT ATE: a hard-reset re-initializes the world frame
    # and scale, so whole-run Sim3 alignment across a reset measures
    # the (arbitrary) frame jump, not estimation quality.  Standard
    # practice for trackers with resets: align each contiguous
    # tracked segment independently, report the frame-weighted mean
    # plus coverage.  (With zero resets the single segment equals the
    # whole-run number.)
    reinit_fids = [k for k, name, _ in events
                   if name == "INITING" and k > 0]
    seg_bounds = sorted(set([fids[0]] + reinit_fids + [fids[-1] + 1]))
    seg_ates, seg_sizes = [], []
    for lo, hi in zip(seg_bounds[:-1], seg_bounds[1:]):
        idx = [i for i, f in enumerate(fids) if lo <= f < hi]
        if len(idx) < 10:
            continue
        a = traj.ate_rmse(est_c[idx], gt_c[idx], with_scale=True)
        seg_ates.append(float(a))
        seg_sizes.append(len(idx))
    ate_seg = (float(np.average(seg_ates, weights=seg_sizes))
               if seg_ates else float(ate))
    return dict(
        frames=n_frames,
        tracked=len(est),
        frac_good=n_good / n_frames,
        ate_rmse=float(ate),
        ate_segment=ate_seg,
        n_segments=max(len(seg_ates), 1),
        rpe_trans=float(rpe_t),
        rpe_rot=float(rpe_r),
        rpe_trans_odometric=float(rpe_t_raw),
        rpe_rot_odometric=float(rpe_r_raw),
        keyframes=len(vo.server.kf_used) + vo.archive.count,
        loops_closed=int(vo.stats.get("loops_closed_global", 0)
                         + vo.stats.get("loops_closed_active", 0)),
        loops_confirmed=int(vo.stats.get("loops_confirmed", 0)),
        maps_merged=int(vo.stats.get("maps_merged", 0)),
        wall_s=time.time() - t0,
        events=events[:40],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--horizon", type=int, default=None,
                    help="trajectory frame count (probe a PREFIX of "
                         "the full-benchmark motion profile with "
                         "--frames N --horizon 2000; without this, "
                         "fewer frames mean proportionally faster "
                         "motion)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-loop", action="store_true",
                    help="ablation: disable loop closing")
    ap.add_argument("--photos", action="store_true",
                    help="photo-textured walls (DBoW3 demo images)")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    res = run(args.frames, loop_closing=not args.no_loop, seed=args.seed,
              log_every=0 if args.json_only else 100,
              horizon=args.horizon, photos=args.photos)
    res["loop_closing"] = not args.no_loop
    res["photo_textures"] = args.photos
    print(json.dumps(res))


if __name__ == "__main__":
    main()
