"""Fold benchmark JSON outputs into RESULTS.md.

Usage:
  python tools/update_results.py ACC_LOOP.json ACC_NOLOOP.json \
      [BENCH.json] [BENCH_BA.json] [BENCH_BATCH.json] [BENCH_SYSTEM.json] \
      [ACC_PHOTOS.json] [KF_LATENCY.jsonl]

Each file is the one-line JSON the corresponding bench script prints
(KF_LATENCY.jsonl holds the two measured lines of _bench_kf_latency.py).
Writes RESULTS.md at the repo root.
"""
import json
import os
import sys
import datetime


def load(path):
    if path and os.path.exists(path):
        with open(path) as f:
            txt = f.read().strip()
        if txt:
            return json.loads(txt.splitlines()[-1])
    return None


def load_lines(path):
    if path and os.path.exists(path):
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip().startswith("{")]
    return []


def main(argv):
    acc = load(argv[1]) if len(argv) > 1 else None
    acc_nl = load(argv[2]) if len(argv) > 2 else None
    bench = load(argv[3]) if len(argv) > 3 else None
    ba = load(argv[4]) if len(argv) > 4 else None
    batch = load(argv[5]) if len(argv) > 5 else None
    system = load(argv[6]) if len(argv) > 6 else None
    acc_ph = load(argv[7]) if len(argv) > 7 else None
    kf_lat = load_lines(argv[8]) if len(argv) > 8 else []
    # _bench_kf_latency.py prints warm-up rows (40 frames) before the
    # measured pass (full frame count) — keep only the measured rows.
    if kf_lat:
        fmax = max(r.get("frames", 0) for r in kf_lat)
        kf_lat = [r for r in kf_lat if r.get("frames", 0) >= fmax]

    lines = []
    a = lines.append
    a("# RESULTS — measured benchmark record")
    a("")
    a(f"Updated {datetime.date.today().isoformat()}.  Sources: "
      "`bench_accuracy.py` (CPU backend, deterministic rendered "
      "sequence), `bench.py` / `bench_ba.py` / `bench_batch.py` / "
      "`bench_system.py` / `_bench_kf_latency.py` "
      "(one real TPU v5e via the axon tunnel).")
    a("")
    a("## Trajectory accuracy — 2000-frame non-planar loop "
      "(BoxScene)")
    a("")
    a("World: textured box room (trilinear-mipmapped renderer — "
      "point-sampled textures alias at oblique views, which real "
      "sensors do not; see utils/synthetic.py), camera orbit facing "
      "the walls head-on, 2.2 laps at ~0.4 m/s-equivalent motion, "
      "per-frame exposure gain/bias drift + 25% lens vignetting.  "
      "The entire second lap revisits archived first-lap keyframes — "
      "sustained archive loop-closure opportunity.  Monocular ATE is "
      "Sim(3)-aligned (Umeyama); RPE is per-frame after scale "
      "alignment.  The 'photo-textured' row replaces the procedural "
      "wall textures with the reference tree's DBoW3 demo "
      "photographs (mirror-tiled) — real image statistics through "
      "the ENTIRE pipeline (init, tracking, triangulation, archive "
      "retrieval, loop closure).  This benchmark is the "
      "controlled-ground-truth stand-in for the BASELINE 'ATE on TUM "
      "fr1/fr2' metric — no real dataset ships in this environment "
      "(the reference's own integration tests parse TUM directories; "
      "the data itself is equally absent from its tree).")
    a("")
    a("| run | frames GOOD | segments | whole-run ATE (m) | "
      "RPE trans corrected / odometric (m) | "
      "RPE rot corrected / odometric (rad) | keyframes "
      "| loops closed |")
    a("|---|---|---|---|---|---|---|---|")
    rows = [("loop closing ON", acc),
            ("loop closing OFF (ablation)", acc_nl)]
    if acc_ph is not None or len(argv) > 7:
        rows.append(("photo-textured walls, loop ON (%d frames)"
                     % (acc_ph or {}).get("frames", 0), acc_ph))
    for name, r in rows:
        if r is None:
            a(f"| {name} | _pending_ | | | | | | |")
            continue
        seg = r.get("n_segments", 1)
        ate = r["ate_rmse"]
        if seg > 1:
            ate_s = f"{r.get('ate_segment', ate):.3f} (per-seg)"
        else:
            ate_s = f"{ate:.3f}"
        a(f"| {name} | {r['frac_good']*100:.1f}% "
          f"| {seg} "
          f"| {ate_s} "
          f"| {r['rpe_trans']:.4f} / "
          f"{r.get('rpe_trans_odometric', float('nan')):.4f} "
          f"| {r['rpe_rot']:.4f} / "
          f"{r.get('rpe_rot_odometric', float('nan')):.4f} "
          f"| {r['keyframes']} "
          f"| {r['loops_closed']} |")
    if acc:
        ev = acc.get("events", [])
        losses = [e for e in ev if e[1] == "LOST"]
        reinits = [e for e in ev if e[1] == "INITING" and e[0] > 0]
        a("")
        if losses and not reinits:
            a(f"The loop-ON tracker dipped LOST {len(losses)} time(s) "
              "and recovered into the SAME map within a few frames "
              "each time via the lost-retry/relocalization cascade — "
              "ZERO resets, so the whole-run ATE needs no per-segment "
              "qualification (round 3: 3 resets / 4 segments; round "
              "4: 1 reset / 2 segments).")
        elif reinits:
            a(f"The tracker dipped LOST {len(losses)} time(s); "
              f"{len(reinits)} reset.  Per-segment ATE aligns each "
              "contiguous tracked segment independently "
              "(frame-weighted).")
        a("")
        a("Loop corrections trade local smoothness for global "
          "consistency: a retroactive keyframe correction shifts "
          "consecutive frame anchors, which per-frame RPE counts as "
          "error even as ATE improves.  Users therefore take BOTH "
          "exports (`save_trajectory(corrected=...)`): the corrected "
          "trajectory for globally-consistent mapping, the odometric "
          "one for local motion.  The odometric columns above show "
          "the loop-ON run's underlying odometry is unharmed by "
          "closures.")
    if acc_ph:
        a("")
        a(f"The photo-textured world is genuinely harder than the "
          "tuned procedural textures (the photographs contain "
          "near-textureless regions a direct tracker cannot hold "
          "onto): the run resets "
          f"{acc_ph.get('n_segments', 1) - 1} time(s) — and the "
          "cross-epoch map merge then rejoins the maps: "
          f"**{acc_ph.get('maps_merged', 0)} merge events** and "
          f"{acc_ph['loops_closed']} closed loops in the recorded "
          "run, the first end-to-end artifact in which the "
          "mini-Atlas machinery fires.")
    if acc and acc_nl and acc["loops_closed"] > 0:
        impr = (1.0 - acc["ate_rmse"] / max(acc_nl["ate_rmse"], 1e-9))
        a("")
        a(f"Loop closure improves whole-run ATE by **{impr*100:.1f}%**"
          " over the no-loop ablation on this sequence.")
    a("")
    a("## Throughput (real TPU v5e)")
    a("")
    a("| metric | value | target | ratio |")
    a("|---|---|---|---|")
    if bench:
        a(f"| tracking fps (640×480, 200 pts) | {bench['value']:.1f} "
          f"| 100 | {bench['vs_baseline']:.1f}× |")
    if ba:
        a(f"| local-BA iterations/s (10 KF × 500 pts) "
          f"| {ba['value']:.1f} | — | — |")
    if batch:
        a(f"| multi-sequence aggregate fps (S=8) | {batch['value']:.1f} "
          f"| 100 | {batch['vs_baseline']:.1f}× |")
    if system:
        a(f"| PUBLIC-API end-to-end fps over the serving TUNNEL "
          f"(System.track_monocular_stream, detection + keyframes + "
          f"mapping + loop detection included) | {system['value']:.1f} "
          f"| — | see note |")
        if system.get("device_fps"):
            a(f"| PUBLIC-API end-to-end fps, DEVICE-time-derived "
              f"(same run, {system.get('traced_frames', '?')}-frame "
              f"steady-state profiler trace — the deployment number "
              f"when dispatches are local) | {system['device_fps']:.1f} "
              f"| 1000 | {system['device_fps']/1000.0:.1f}× |")
    a("")
    if system:
        a("")
        a("The public-API WALL number is TUNNEL-BOUND, not "
          "device-bound: every dispatch pays a measured ~26 ms fixed "
          "round trip through the serving relay.  Round 5 collapsed "
          "the per-keyframe host path to ~2 sync dispatches "
          "(`_jit_kf_cycle` + `_jit_map_pass`; asserted by "
          "tests/test_jit_discipline.py) and pre-warms every "
          "archive-capacity jit bucket at startup "
          "(`System.warmup`), so no user-visible step ever pays a "
          "compile.  The DEVICE-fps row is derived from a profiler "
          "trace of a steady-state slice (keyframes, archive "
          "maintenance and loop detection all active), the same "
          "method as the per-kernel budgets in docs/performance.md.")
    if kf_lat:
        a("")
        a("## Per-frame latency at keyframes (sync vs async mapping, "
          "real TPU)")
        a("")
        a("`_bench_kf_latency.py` drives the per-frame public API "
          "(System.track_monocular — the latency path).  Async "
          "mapping (default ON since round 5) moves the "
          "keyframe-rate mapping pass (loop detection + local BA + "
          "culling) off the frame-return path onto a worker thread; "
          "trajectories are bitwise identical "
          "(tests/test_async_mapping.py).")
        a("")
        a("| mode | ordinary frame p50 (ms) | keyframe-frame p50 (ms)"
          " | keyframe-frame max (ms) |")
        a("|---|---|---|---|")
        for r in kf_lat:
            mode = "async" if r.get("async_mapping") else "sync"
            a(f"| {mode} | {r.get('ordinary_ms_p50')} "
              f"| {r.get('kf_frame_ms_p50')} "
              f"| {r.get('kf_frame_ms_max')} |")
    a("")
    a("Scaling-model constants measured on the chip (see "
      "docs/performance.md): Schur-BA compute 1.7 µs/landmark/iter, "
      "psum plumbing ≈ 0 at n=1, 14.6 KB collective payload ⇒ "
      "2-host efficiency ≥ 0.7 with >10× communication-budget margin; "
      "the DCN codepath itself is exercised by the 2-process "
      "jax.distributed tests (tests/test_multiprocess.py).")
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RESULTS.md")


if __name__ == "__main__":
    main(sys.argv)
