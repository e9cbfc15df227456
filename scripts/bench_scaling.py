#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.json north star: >=80% at N>=2).

Two measurements, emitted as bench_scaling.json + a markdown table:

1. Sharding-overhead scaling on the 8-virtual-device CPU mesh (the only
   multi-device surface in this image).  CAVEAT on methodology: XLA:CPU uses
   ONE shared intra-op thread pool for all virtual devices, so a weak-scaling
   curve would just measure core oversubscription, not the framework.  We
   therefore hold TOTAL work and the pool constant (device_count=8 always,
   batch=8) and vary only how many devices the batch is sharded over:
   ideal = flat runtime; any slowdown is sharding overhead (collectives,
   shard_map partitioning).  efficiency = T(1 dev)/T(n dev).  On real
   multi-chip hardware each device brings its own cores/ICI, so this
   overhead share upper-bounds the true efficiency loss.
2. Batch scaling on the real accelerator (if present): sustained pairs/s at
   B = 1..16, Sintel resolution, op2 — the single-chip utilization curve.

Each virtual-mesh point runs in a subprocess (device count is fixed at
backend init).  Run:  python scripts/bench_scaling.py [--skip-tpu]
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_CHILD = r"""
import json, os, sys, time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

mode, n, b = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from of_dis_tpu import operating_point
from of_dis_tpu.parallel.batch import batched_flow, data_mesh
from of_dis_tpu.parallel.multihost import flow_2d, mesh_2d

H, W = 160, 256
rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(b, H, W, 1).astype(np.float32) * 255)
bb = jnp.asarray(rng.rand(b, H, W, 1).astype(np.float32) * 255)
cfg = operating_point(2, W)

if mode == "data":
    mesh = data_mesh(n)
    run = lambda: batched_flow(a, bb, cfg, mesh=mesh)
else:
    mesh = mesh_2d(n_data=n // 2, n_tx=2) if n > 1 else mesh_2d(n_data=1, n_tx=1)
    run = lambda: flow_2d(a, bb, cfg, mesh)

np.asarray(run())  # compile
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    np.asarray(run())
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"mode": mode, "n": n, "b": b, "seconds": best}))
"""


def virtual_mesh_points():
    rows = []
    base = None
    for mode in ("data", "2d"):
        for n in (1, 2, 4, 8):
            if mode == "2d" and n == 1:
                continue
            b = 8  # constant total work; only the sharding degree varies
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                # constant pool: always 8 virtual devices, shard over n
                XLA_FLAGS="--xla_force_host_platform_device_count=8",
            )
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, mode, str(n), str(b)],
                env=env, capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
            if out.returncode != 0:
                print(f"{mode} n={n}: FAILED\n{out.stderr[-1500:]}")
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if mode == "data" and n == 1:
                base = r["seconds"]
            r["efficiency"] = base / r["seconds"] if base else None
            rows.append(r)
            eff = f"{r['efficiency']*100:.0f}%" if r["efficiency"] else "-"
            print(f"{mode:4s} n={n}: {r['seconds']*1e3:8.1f} ms for B=8 "
                  f"(overhead-adjusted efficiency {eff})")
    return rows


def tpu_batch_curve():
    import numpy as np

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no accelerator backend; skipping TPU batch curve")
        return []
    from of_dis_tpu import operating_point
    from of_dis_tpu.parallel.batch import _batched_padded

    H, W = 436, 1024
    cfg = operating_point(2, W)
    scf = 1 << cfg.sc_f
    Hp = H + (-H) % scf
    rows = []
    rng = np.random.RandomState(0)
    for b in (1, 2, 4, 8, 16):
        a = jnp.asarray(rng.rand(b, Hp, W, 1).astype(np.float32) * 255)
        bb = jnp.asarray(rng.rand(b, Hp, W, 1).astype(np.float32) * 255)
        np.asarray(_batched_padded(a, bb, cfg))
        # Queue deep enough to hide the remote-dispatch latency at every
        # batch size (nq=4 measured 3.5x under the sustained rate at B=16).
        nq = max(24, 128 // b)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(nq):
                last = _batched_padded(a, bb, cfg)
            np.asarray(last)
            best = max(best, nq * b / (time.perf_counter() - t0))
        rows.append({"b": b, "pairs_per_s": best})
        print(f"TPU op2 B={b}: {best:.1f} pairs/s")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    out = os.path.join(HERE, "..", "bench_scaling.json")
    result = {"virtual_cpu_mesh": virtual_mesh_points()}
    if not args.skip_tpu:
        result["tpu_batch_curve"] = tpu_batch_curve()
    else:
        # Keep the previously measured real-chip curve instead of dropping it.
        try:
            with open(out) as f:
                result["tpu_batch_curve"] = json.load(f)["tpu_batch_curve"]
        except (OSError, KeyError, ValueError):
            print("WARNING: no prior tpu_batch_curve in", out,
                  "- writing without it")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", os.path.abspath(out))

    print("\n| path | shard degree | ms (B=8, fixed pool) | efficiency |")
    print("|---|---|---|---|")
    for r in result["virtual_cpu_mesh"]:
        eff = f"{r['efficiency']*100:.0f}%" if r.get("efficiency") else "-"
        print(f"| {r['mode']} | {r['n']} | {r['seconds']*1e3:.1f} | {eff} |")


if __name__ == "__main__":
    main()
