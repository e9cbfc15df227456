"""Multi-host setup + 2-D (data, tx) meshes.

The reference is single-process shared-memory (SURVEY.md §2.2 — no MPI/NCCL/
Gloo anywhere).  The TPU-native scaling story (SURVEY.md §5) is:

  - `init_distributed()` -> `jax.distributed.initialize` so every host in a
    pod slice joins one runtime (coordinator from env or args).
  - a 2-D mesh (data, tx): independent frame pairs shard over `data` with
    ZERO communication (the video-throughput axis, rides DCN across hosts);
    single-pair latency shards the image over `tx` with `ppermute` halo
    exchange + psum densify riding ICI within a host (parallel/spatial.py).
  - `flow_2d()` composes both inside ONE shard_map over ("data", "tx"):
    each data-shard processes its local pairs, each pair tiled over tx.

Hardware-independent: the same code runs on the virtual
`--xla_force_host_platform_device_count=8` CPU mesh used by the tests and
the driver's dry run (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DISConfig
from ..ops import pyramid as pyr
from .spatial import _pair_2d, _pair_manual, tile_ownership


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host runtime (jax.distributed.initialize).

    On TPU pods every argument is auto-detected from the environment; args
    are only needed for manual CPU/GPU bring-up.  Call once per process,
    before any other JAX call.  No-op when the environment indicates a
    single process.
    """
    # TPU_WORKER_HOSTNAMES can hold a WARNING sentence on single-host axon
    # images (see CLAUDE.md); only count comma-separated tokens that look
    # like hostnames/IPs (no whitespace).
    workers = [
        t.strip()
        for t in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if t.strip() and " " not in t.strip()
    ]
    n = num_processes if num_processes is not None else max(
        int(os.environ.get("JAX_NUM_PROCESSES", "1")), len(workers)
    )
    if coordinator_address is None and n <= 1:
        return  # single host, nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def mesh_2d(n_data: Optional[int] = None, n_tx: int = 1, devices=None) -> Mesh:
    """(data, tx) mesh over all (global) devices.

    `data` is the outer axis so that, on a multi-host pod, frame pairs shard
    across hosts (DCN, zero communication) and the `tx` halo exchange stays
    inside a host's ICI domain.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devs.size // n_tx
    if n_data * n_tx > devs.size:
        raise ValueError(f"mesh {n_data}x{n_tx} needs {n_data*n_tx} devices, have {devs.size}")
    return Mesh(devs[: n_data * n_tx].reshape(n_data, n_tx), ("data", "tx"))


# jitted shard_map programs cached by structural config: a fresh
# jax.jit(shard_map(...)) per call would key the jit cache on a new function
# object and re-trace + re-compile the full coarse-to-fine program on EVERY
# invocation.  DISConfig and Mesh are both hashable.
_FN_CACHE: dict = {}


def _cached_fn(key, make):
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = make()
    return fn


def mesh_3d(
    n_data: Optional[int] = None, n_ty: int = 1, n_tx: int = 1, devices=None
) -> Mesh:
    """(data, ty, tx) mesh: the full SURVEY §5 composition.

    `data` outermost (frame pairs across hosts over DCN, zero
    communication); (ty, tx) innermost so each pair's 2-D tile halo
    exchange / halo-reduce stays inside one host's ICI domain.

    Axis choice guide (see also flow_2d):
      - throughput-bound video  -> all devices on `data` (n_ty = n_tx = 1);
      - latency-bound single pair, wide frames -> 1-D `tx` strips
        (exact, all content speeds; flow_2d / spatial_flow);
      - latency-bound, large-in-both-dims frames -> (ty, tx) tiles
        (tile-LOCAL memory + permute-only collectives, but bounded
        displacement: the max_disp warm-start contract);
      - mixtures -> this 3-axis mesh: batch over data, tile each pair.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devs.size // (n_ty * n_tx)
    need = n_data * n_ty * n_tx
    if need > devs.size:
        raise ValueError(f"mesh {n_data}x{n_ty}x{n_tx} needs {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(n_data, n_ty, n_tx), ("data", "ty", "tx"))


def flow_2d_tiled(
    imgs1: jnp.ndarray,   # (B, H, W[, C])
    imgs2: jnp.ndarray,
    cfg: DISConfig,
    mesh: Mesh,
    max_disp: float = 8.0,
    return_diagnostics: bool = False,
) -> jnp.ndarray:
    """Batch of frame pairs on a (data, ty, tx) mesh: the batch shards over
    `data` (zero communication, DCN-safe) and each pair runs the 2-D
    tile-local pipeline over (ty, tx) (ppermute halo exchange + border
    halo-reduce densify, ICI-only — see spatial.spatial_flow_tiled for the
    max_disp warm-start contract).

    Returns full-resolution flow (B, H, W, nop).  With
    return_diagnostics=True, returns (flow, clamp_counts) where
    clamp_counts["lv<sl>"] is a (B,) per-pair count of warm starts clamped
    at that level — nonzero means that pair's content moves faster than
    max_disp and the result deviates from the single-device pipeline.
    """
    cfg.validate()
    imgs1 = jnp.asarray(imgs1, jnp.float32)
    imgs2 = jnp.asarray(imgs2, jnp.float32)
    if imgs1.ndim == 3:
        imgs1, imgs2 = imgs1[..., None], imgs2[..., None]
    b, h0, w0 = imgs1.shape[:3]
    n_data = mesh.shape["data"]
    ny, nx = mesh.shape["ty"], mesh.shape["tx"]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    scf = 1 << cfg.sc_f
    t, _, l, _ = pyr.divisibility_padding(h0, w0, scf)
    p1 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs1)
    p2 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs2)
    hp, wp = p1.shape[1:3]

    own, specs = tile_ownership(hp, wp, cfg, ny, nx, max_disp, "ty", "tx")
    inputs_sharded = bool(own)
    in_img = P("data", "ty", "tx", None) if inputs_sharded else P("data")
    p1 = jax.device_put(p1, NamedSharding(mesh, in_img))
    p2 = jax.device_put(p2, NamedSharding(mesh, in_img))

    def make():
        def body(a_shard, b_shard, own_local):
            flows, counts = [], []
            for i in range(a_shard.shape[0]):
                f, cc = _pair_2d(
                    a_shard[i], b_shard[i], own_local, cfg, "ty", "tx",
                    max_disp, inputs_sharded,
                )
                flows.append(f)
                counts.append(cc)
            stacked = {
                k: jnp.stack([c[k] for c in counts])
                for k in (counts[0] if counts else {})
            }
            return jnp.stack(flows), stacked

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(in_img, in_img, specs),
                out_specs=(P("data"), {k: P("data") for k in own}),
                check_vma=False,
            )
        )

    fn = _cached_fn(
        ("2d_tiled", cfg, mesh, float(max_disp), inputs_sharded,
         tuple(sorted(own))),
        make,
    )
    flow, clamp_counts = fn(p1, p2, own)
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = jax.vmap(lambda f: pyr.resize_bilinear(f * sc, hp, wp))(flow)
    flow = flow[:, t : t + h0, l : l + w0]
    if return_diagnostics:
        return flow, clamp_counts
    return flow


def flow_2d(
    imgs1: jnp.ndarray,   # (B, H, W[, C])
    imgs2: jnp.ndarray,
    cfg: DISConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """Batch of frame pairs on a (data, tx) mesh: the batch shards over
    `data` (zero communication) and each pair is spatially tiled over `tx`
    (ppermute halo exchange + psum densify).

    Returns full-resolution flow (B, H, W, nop): like dis_flow/batched_flow,
    the final 2^sc_l upscale and divisibility-padding crop are applied
    (run_dense.cpp:406-414).
    """
    cfg.validate()
    imgs1 = jnp.asarray(imgs1, jnp.float32)
    imgs2 = jnp.asarray(imgs2, jnp.float32)
    if imgs1.ndim == 3:
        imgs1, imgs2 = imgs1[..., None], imgs2[..., None]
    b, h0, w0 = imgs1.shape[:3]
    n_data = mesh.shape["data"]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    scf = 1 << cfg.sc_f
    t, _, l, _ = pyr.divisibility_padding(h0, w0, scf)
    p1 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs1)
    p2 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs2)
    sh = NamedSharding(mesh, P("data"))
    p1 = jax.device_put(p1, sh)
    p2 = jax.device_put(p2, sh)

    def make():
        def body(a_shard, b_shard):  # (B/n_data, Hp, Wp, C), inside shard_map
            outs = [
                _pair_manual(a_shard[i], b_shard[i], cfg, "tx")
                for i in range(a_shard.shape[0])
            ]
            return jnp.stack(outs)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        )

    fn = _cached_fn(("2d", cfg, mesh), make)
    flow = fn(p1, p2)
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = jax.vmap(
            lambda f: pyr.resize_bilinear(f * sc, p1.shape[1], p1.shape[2])
        )(flow)
    return flow[:, t : t + h0, l : l + w0]
