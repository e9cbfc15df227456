"""Real multi-process distributed execution (VERDICT r2 item 3).

Spawns TWO separate Python processes that join one JAX runtime via
jax.distributed.initialize on localhost (the same bring-up path
`init_distributed` uses on a TPU pod, SURVEY.md §5), each owning 4 virtual
CPU devices, and runs the data-parallel pipeline over the GLOBAL 8-device
mesh with process-local inputs.  Each worker asserts its shards of the
global result equal an unsharded local reference (tests/dist_worker.py).
"""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(coord):
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "dist_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # budget: batched phase + TWO whole-pipeline compiles (batched +
            # AOT spatial) on a loaded 1-core host, plus the worker's own
            # 600 s compile-skew barrier
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_batched_flow():
    # _free_port has an inherent bind-then-release race on this shared
    # host; retry once with a fresh port if the coordinator can't bind.
    for attempt in range(2):
        port = _free_port()
        procs, outs = _run_workers(f"127.0.0.1:{port}")
        # gRPC surfaces the bind failure with version-dependent text
        # ("address already in use", "Failed to bind", "could not start
        # gRPC server", errno 98) — match broadly so the retry actually
        # fires on any of them.
        bind_race = any(
            p.returncode != 0
            and any(
                s in out.lower()
                for s in ("address already in use", "bind", "errno 98",
                          "could not start")
            )
            for p, out in zip(procs, outs)
        )
        if not (bind_race and attempt == 0):
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "DIST_SPATIAL_OK" in out, f"worker {pid} no DIST_SPATIAL_OK:\n{out[-2000:]}"
        assert "DIST_TILED_OK" in out, f"worker {pid} no DIST_TILED_OK:\n{out[-2000:]}"
        assert "DIST_OK" in out, f"worker {pid} no DIST_OK:\n{out[-2000:]}"
