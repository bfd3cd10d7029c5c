"""Multi-PROCESS execution of the distributed programs (round-5).

Everything else in tests/ runs the meshes in one process with virtual
devices; this spawns 2 OS processes (4 virtual CPU devices each, Gloo
collectives) and runs BOTH distributed programs on the 8-device global
mesh:

- `sharded_local_ba` on a 2-D (host, chip) mesh whose HOST axis lies
  on the process boundary — the camera-system psum reduces
  hierarchically, intra-process then across processes (the DCN
  codepath of SURVEY §2.4 / BASELINE's 2-host scaling axis).
- `sharded_batch_align` on a 1-D mesh spanning both processes
  (sequences data-parallel across the boundary).

Parity with the single-device solvers is asserted INSIDE each worker
(tests/_mp_worker.py); this test checks both workers exit 0 and
report success markers.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2 fresh jax processes, ~2-4 min

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
_PORT = 53171


def test_two_process_distributed_programs():
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # Workers force the CPU backend in-process (jax.config.update);
    # keep the compile cache shared for speed.
    procs = []
    try:
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, _WORKER, str(pid), str(_PORT)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
                cwd=os.path.dirname(os.path.dirname(_WORKER)),
            ))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n{out[-4000:]}"
        )
        assert f"[{pid}] MP-OK" in out, out[-4000:]
