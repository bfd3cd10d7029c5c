"""Fold benchmark JSON outputs into RESULTS.md.

Usage:
  python tools/update_results.py ACC_LOOP.json ACC_NOLOOP.json \
      [BENCH.json] [BENCH_BA.json] [BENCH_BATCH.json] [BENCH_SYSTEM.json]

Each file is the one-line JSON the corresponding bench script prints.
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


def main(argv):
    acc = load(argv[1]) if len(argv) > 1 else None
    acc_nl = load(argv[2]) if len(argv) > 2 else None
    bench = load(argv[3]) if len(argv) > 3 else None
    ba = load(argv[4]) if len(argv) > 4 else None
    batch = load(argv[5]) if len(argv) > 5 else None
    system = load(argv[6]) if len(argv) > 6 else None

    lines = []
    a = lines.append
    a("# RESULTS — measured benchmark record")
    a("")
    a(f"Updated {datetime.date.today().isoformat()}.  Sources: "
      "`bench_accuracy.py` (CPU backend, deterministic rendered "
      "sequence), `bench.py` / `bench_ba.py` / `bench_batch.py` "
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
      "alignment.  This is the controlled-ground-truth stand-in for "
      "the BASELINE 'ATE on TUM fr1/fr2' metric — no real dataset "
      "ships in this environment (the reference's own integration "
      "tests parse TUM directories; the data itself is equally "
      "absent from its tree).")
    a("")
    a("| run | frames GOOD | segments | per-segment ATE (m) | "
      "whole-run ATE (m) | RPE trans (m) | RPE rot (rad) | keyframes "
      "| loops closed |")
    a("|---|---|---|---|---|---|---|---|---|")
    for name, r in (("loop closing ON", acc),
                    ("loop closing OFF (ablation)", acc_nl)):
        if r is None:
            a(f"| {name} | _pending_ | | | | | | | |")
            continue
        a(f"| {name} | {r['frac_good']*100:.1f}% "
          f"| {r.get('n_segments', 1)} "
          f"| {r.get('ate_segment', r['ate_rmse']):.3f} "
          f"| {r['ate_rmse']:.3f} | {r['rpe_trans']:.4f} "
          f"| {r['rpe_rot']:.4f} | {r['keyframes']} "
          f"| {r['loops_closed']} |")
    if acc:
        ev = acc.get("events", [])
        losses = [e for e in ev if e[1] == "LOST"]
        n_seg = acc.get("n_segments", 1)
        a("")
        if n_seg == 1 and losses:
            a(f"The tracker dipped LOST {len(losses)} time(s) and "
              "recovered on the NEXT frame each time via the lost-"
              "retry/relocalization cascade — zero resets, so the "
              "whole-run and per-segment ATE coincide (round 3 had 3 "
              "unrecovered losses and 4 segments).")
        elif n_seg > 1:
            a(f"The tracker lost and re-initialized {len(losses)} "
              "time(s); each reset starts a new map epoch whose "
              "keyframes remain archived for cross-epoch merging.  "
              "Per-segment ATE (each contiguous tracked segment "
              "Sim(3)-aligned independently, frame-weighted) is the "
              "accuracy metric in that case.")
    if acc and acc_nl and acc["loops_closed"] > 0:
        impr = (1.0 - acc["ate_rmse"] / max(acc_nl["ate_rmse"], 1e-9))
        a("")
        a(f"Loop closure improves ATE by **{impr*100:.1f}%** over the "
          "no-loop ablation on this sequence.")
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
        a(f"| PUBLIC-API end-to-end fps (System.track_monocular_stream, "
          f"detection+keyframes+mapping included) | {system['value']:.1f} "
          f"| 100 | {system['vs_baseline']:.1f}× |")
    a("")
    a("Scaling-model constants measured on the chip (see "
      "docs/performance.md): Schur-BA compute 1.7 µs/landmark/iter, "
      "psum plumbing ≈ 0 at n=1, 14.6 KB collective payload ⇒ "
      "2-host efficiency ≥ 0.7 with >10× communication-budget margin.")
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RESULTS.md")


if __name__ == "__main__":
    main(sys.argv)
