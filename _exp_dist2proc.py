"""Probe: does 2-process jax.distributed work on CPU in this image?

Each process gets 4 virtual CPU devices (8 global); we build a global
mesh, make a sharded array, and psum across the process boundary.
Run:  python _exp_dist2proc.py            (parent spawns 2 workers)
      python _exp_dist2proc.py <pid>      (worker)
"""
import os
import sys
import subprocess

PORT = 52313


def worker(pid: int):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2, process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

    devs = jax.devices()
    print(f"[{pid}] global devices: {len(devs)} "
          f"local: {len(jax.local_devices())}", flush=True)
    mesh = Mesh(np.asarray(devs).reshape(8), ("d",))
    sh = NamedSharding(mesh, P("d"))
    full = np.arange(16, dtype=np.float32).reshape(8, 2)
    arr = jax.make_array_from_callback((8, 2), sh, lambda idx: full[idx])

    @jax.jit
    def f(x):
        from jax.experimental.shard_map import shard_map
        return shard_map(
            lambda v: jax.lax.psum(v.sum(), "d") + 0 * v,
            mesh=mesh, in_specs=P("d"), out_specs=P("d"),
        )(x)

    out = f(arr)
    local = out.addressable_shards[0].data
    print(f"[{pid}] psum result: {float(local.ravel()[0])} "
          f"(expect {full.sum()})", flush=True)
    assert abs(float(local.ravel()[0]) - full.sum()) < 1e-5
    print(f"[{pid}] OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        procs = [
            subprocess.Popen([sys.executable, __file__, str(i)])
            for i in range(2)
        ]
        rcs = [p.wait(timeout=180) for p in procs]
        print("rcs:", rcs)
        sys.exit(0 if all(r == 0 for r in rcs) else 1)
