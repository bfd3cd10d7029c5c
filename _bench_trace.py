"""Capture a JAX profiler trace of one bench chunk and print per-op
device time, aggregated by op name — the definitive attribution tool
(bench-level A/B only localizes to stage granularity)."""
import glob
import json
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import _bench_ab2 as ab


def main():
    track_chunk, T0, frames, T_gt7 = ab.build(
        pose_fused=True, sparse_variant=3, a2d_ee=False)
    out = track_chunk(T0, frames)
    jax.block_until_ready(out)

    logdir = "/tmp/jaxtrace"
    jax.profiler.start_trace(logdir)
    out = track_chunk(T0, frames)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", paths, file=sys.stderr)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    tot[(plane.name, line.name, name)] += ev.duration_ps / 1e6
                    cnt[(plane.name, line.name, name)] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
    print(json.dumps({"planes": [
        {"plane": k[0], "line": k[1], "op": k[2][:90],
         "total_us": round(v, 1), "count": cnt[k]}
        for k, v in rows
    ]}, indent=1))


if __name__ == "__main__":
    main()
