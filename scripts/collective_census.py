#!/usr/bin/env python
"""Collective census for the spatial-sharding paths (VERDICT r2 weak #3).

Real multi-chip ICI cannot be measured in this environment (one real chip
behind a tunnel), so the honest scaling artifact is an exact *census* of
the collectives XLA emits for the partitioned program: how many, of which
kind, moving how many bytes — per pipeline and mesh.  Together with the
v5e link numbers (ICI ~45 GB/s/link/dir, HBM ~819 GB/s) this gives the
crossover model documented in ARCHITECTURE.md ("Spatial sharding: when
tiling wins").

Counts come from the compiled partitioned HLO (CPU backend, virtual mesh
— partitioning is backend-independent).  Bytes are the operand bytes of
each collective (what actually crosses the links).

Run:  python scripts/collective_census.py          # writes collective_census.json
"""

import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
sys.path.insert(0, ROOT)

DT_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

COLLECTIVES = ("collective-permute", "all-gather", "all-reduce",
               "reduce-scatter", "all-to-all")


def shape_bytes(shape_str):
    """Bytes of one HLO shape literal like 'f32[8,104,18]' (tuples summed)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def census(hlo_text):
    """Per-kind {count, bytes} over all collective ops in the module."""
    out = {k: {"count": 0, "bytes": 0} for k in COLLECTIVES}
    # One HLO instruction per line: "%name = <shape> <opcode>(...)".
    for line in hlo_text.splitlines():
        for kind in COLLECTIVES:
            # Match the opcode position (start of the RHS), not fused-comp
            # names which XLA prefixes (e.g. %fused_all_gather).  Also match
            # the async '-start' form (count starts only; '-done' carries no
            # transfer of its own) so an async-emitting XLA can't undercount.
            m = re.search(
                r"=\s+([^=]*?)\s+" + kind + r"(-start)?[\s(]", line
            )
            if m:
                out[kind]["count"] += 1
                shape = m.group(1)
                if m.group(2):
                    # Async '-start' result is a tuple (operand, result, ...):
                    # count only the RESULT element so byte totals match the
                    # sync form regardless of which form this XLA emits.
                    parts = re.findall(r"\w+\[[0-9,]*\]", shape)
                    if len(parts) >= 2:
                        shape = parts[1]
                out[kind]["bytes"] += shape_bytes(shape)
                break
    return {k: v for k, v in out.items() if v["count"]}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from of_dis_tpu import DISConfig
    from of_dis_tpu.parallel.spatial import spatial_flow, spatial_flow_tiled

    h, w = 96, 128
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=True, tv_solverit=2,
    ).validate()
    z = jnp.zeros((h, w, 1), jnp.float32)
    report = {"resolution": [h, w], "levels": cfg.sc_f - cfg.sc_l + 1,
              "tv_solverit": cfg.tv_solverit, "cases": {}}

    mesh1 = Mesh(np.asarray(jax.devices()[:4]), ("tx",))
    txt = jax.jit(lambda a, b: spatial_flow(a, b, cfg, mesh1)).lower(
        z, z).compile().as_text()
    report["cases"]["spatial_flow_1d_tx4"] = census(txt)

    mesh2 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("ty", "tx"))
    txt = jax.jit(lambda a, b: spatial_flow_tiled(a, b, cfg, mesh2)).lower(
        z, z).compile().as_text()
    report["cases"]["spatial_flow_tiled_2x2"] = census(txt)

    # 3-axis (data, ty, tx): the data axis must add ZERO collectives — the
    # census must equal the per-pair (ty, tx) structure (batch members are
    # independent; only the tile axes communicate).
    from of_dis_tpu.parallel.multihost import flow_2d_tiled, mesh_3d

    zb = jnp.zeros((2, h, w, 1), jnp.float32)
    mesh3 = mesh_3d(n_data=2, n_ty=2, n_tx=2)
    txt = jax.jit(
        lambda a, b: flow_2d_tiled(a, b, cfg, mesh3)
    ).lower(zb, zb).compile().as_text()
    report["cases"]["flow_2d_tiled_2x2x2"] = census(txt)

    with open(os.path.join(ROOT, "collective_census.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
