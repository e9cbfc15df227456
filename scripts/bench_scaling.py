#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.json north star: >=80% at N>=2).

Two measurements, emitted as bench_scaling.json + a markdown table:

1. Device scaling on the N-device virtual CPU mesh (the only multi-device
   surface available in this image — multi-chip ICI behaves strictly better
   than the shared-memory emulation): weak-scaling throughput of the
   data-parallel path (batched_flow over the 'data' axis) and of the 2-D
   (data, tx) path (flow_2d) at N = 1, 2, 4, 8 devices, efficiency relative
   to N=1.
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
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(run())
    best = max(best, b / (time.perf_counter() - t0))
print(json.dumps({"mode": mode, "n": n, "b": b, "pairs_per_s": best}))
"""


def virtual_mesh_points():
    rows = []
    for mode in ("data", "2d"):
        base = None
        for n in (1, 2, 4, 8):
            if mode == "2d" and n == 1:
                continue
            b = 2 * n  # weak scaling: work per device constant
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
            )
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, mode, str(n), str(b)],
                env=env, capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
            if out.returncode != 0:
                print(f"{mode} n={n}: FAILED\n{out.stderr[-1500:]}")
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            per_dev = r["pairs_per_s"] / n
            if mode == "data" and n == 1:
                base = per_dev
            if base is None:  # 2d baseline: reuse data n=1
                base = next(x["per_dev"] for x in rows if x["mode"] == "data" and x["n"] == 1)
            r["per_dev"] = per_dev
            r["efficiency"] = per_dev / base
            rows.append(r)
            print(f"{mode:4s} n={n}: {r['pairs_per_s']:8.2f} pairs/s "
                  f"({per_dev:.2f}/dev, eff {r['efficiency']*100:.0f}%)")
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
        nq = max(4, 64 // b)
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

    result = {"virtual_cpu_mesh": virtual_mesh_points()}
    if not args.skip_tpu:
        result["tpu_batch_curve"] = tpu_batch_curve()

    out = os.path.join(HERE, "..", "bench_scaling.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", os.path.abspath(out))

    print("\n| path | devices | pairs/s | per-dev | efficiency |")
    print("|---|---|---|---|---|")
    for r in result["virtual_cpu_mesh"]:
        print(f"| {r['mode']} | {r['n']} | {r['pairs_per_s']:.2f} "
              f"| {r['per_dev']:.2f} | {r['efficiency']*100:.0f}% |")


if __name__ == "__main__":
    main()
