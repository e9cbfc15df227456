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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DISConfig
from ..models.densify import _abs_weights
from ..models.dis import _level_flow
from ..models.grid import level_geometry
from ..models.inverse_search import build_templates, optimize_level
from ..ops import pyramid as pyr
from .spatial import _refine_level_sharded


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


def _level_manual(im_a, dx_a, dy_a, im_b, flow_prev, sl, w, h, cfg, axis):
    """One pyramid level inside a manual (shard_map) region: patch shard ->
    psum densify -> strip refinement -> all_gather.  Mirrors
    spatial.spatial_flow_level's body but is callable from ANY shard_map
    whose mesh has `axis` (e.g. the 2-D (data, tx) mesh)."""
    rank = jax.lax.axis_index(axis)
    ntx = int(jax.lax.axis_size(axis))  # static under shard_map
    pad = cfg.patch_size
    geo = level_geometry(w, h, cfg)
    n = geo.n_patches

    if flow_prev is None:
        p_init_full = jnp.zeros((n, cfg.nop), jnp.float32)
    else:
        p_init_full = 2.0 * flow_prev.reshape(-1, cfg.nop)[jnp.asarray(geo.coarse_idx)]
    pt_full = jnp.asarray(geo.pt_ref)

    # Local patch shard (pad to a multiple of the axis size; padded lanes
    # have far-out-of-bounds centers, so they start converged and inert).
    npad = (-n) % ntx
    if npad:
        pt_full = jnp.concatenate([pt_full, jnp.full((npad, 2), -1e6, jnp.float32)])
        p_init_full = jnp.pad(p_init_full, ((0, npad), (0, 0)))
    k = (n + npad) // ntx
    pt_shard = jax.lax.dynamic_slice_in_dim(pt_full, rank * k, k, axis=0)
    p_init = jax.lax.dynamic_slice_in_dim(p_init_full, rank * k, k, axis=0)

    tmpl = build_templates(im_a, dx_a, dy_a, pt_shard, cfg, pad)
    res = optimize_level(im_b, tmpl, pt_shard, p_init, cfg, w, h, pad)

    # Per-device densification into a full-size accumulator + psum
    # (deterministic; replaces the reference's racy OpenMP scatter).
    lb = -(pad // 2)
    offs = jnp.arange(lb, lb + cfg.patch_size, dtype=jnp.int32)
    oy = jnp.repeat(offs, cfg.patch_size)
    ox = jnp.tile(offs, cfg.patch_size)
    yt = pt_shard[:, 1].astype(jnp.int32)[:, None] + oy[None, :]
    xt = pt_shard[:, 0].astype(jnp.int32)[:, None] + ox[None, :]
    valid = ((xt >= 0) & (yt >= 0) & (xt < w) & (yt < h)).astype(jnp.float32)
    idxm = jnp.clip(yt, 0, h - 1) * w + jnp.clip(xt, 0, w - 1)
    absw = _abs_weights(res.pweight, cfg) * valid
    we = jnp.zeros((w * h,), jnp.float32).at[idxm.ravel()].add(absw.ravel())
    contrib = absw[:, :, None] * res.p[:, None, :]
    fo = jnp.zeros((w * h, cfg.nop), jnp.float32).at[idxm.ravel()].add(
        contrib.reshape(-1, cfg.nop)
    )
    we = jax.lax.psum(we, axis)
    fo = jax.lax.psum(fo, axis)
    safe = jnp.where(we > 0, we, 1.0)
    flow = jnp.where((we > 0)[:, None], fo / safe[:, None], 0.0).reshape(h, w, cfg.nop)

    if cfg.use_tv_refine:
        wl = w // ntx
        strip = jax.lax.dynamic_slice_in_dim(flow, rank * wl, wl, axis=1)
        raw1 = im_a[pad:-pad, pad:-pad]
        raw2 = im_b[pad:-pad, pad:-pad]
        raw1_strip = jax.lax.dynamic_slice_in_dim(raw1, rank * wl, wl, axis=1)
        strip = _refine_level_sharded(strip, raw1_strip, raw2, sl, cfg, axis)
        flow = jax.lax.all_gather(strip, axis, axis=1, tiled=True)
    return flow


def _pair_manual(img1p, img2p, cfg, axis):
    """Coarse-to-fine flow for one padded pair inside a manual region.

    Level images are replicated over `axis` (they are small); levels whose
    width divides the axis run sharded, others run replicated."""
    h, w = img1p.shape[:2]
    pad = cfg.patch_size
    ntx = int(jax.lax.axis_size(axis))
    im1s, dx1s, dy1s = pyr.build_pyramid(img1p, cfg.sc_f + 1, pad)
    im2s, dx2s, dy2s = pyr.build_pyramid(img2p, cfg.sc_f + 1, pad)
    flow = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        if lw % ntx == 0 and lw >= 2 * ntx and cfg.mode == "flow":
            flow = _level_manual(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], flow, sl, lw, lh, cfg, axis
            )
        else:
            raw1 = im1s[sl][pad:-pad, pad:-pad]
            raw2 = im2s[sl][pad:-pad, pad:-pad]
            flow, _ = _level_flow(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
                flow, None, sl, lw, lh, cfg, raw1, raw2,
            )
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

    Returns flow at scale sc_l: (B, H/2^sc_l, W/2^sc_l, nop).
    """
    cfg.validate()
    imgs1 = jnp.asarray(imgs1, jnp.float32)
    imgs2 = jnp.asarray(imgs2, jnp.float32)
    if imgs1.ndim == 3:
        imgs1, imgs2 = imgs1[..., None], imgs2[..., None]
    b = imgs1.shape[0]
    n_data = mesh.shape["data"]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    scf = 1 << cfg.sc_f
    p1 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs1)
    p2 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs2)
    sh = NamedSharding(mesh, P("data"))
    p1 = jax.device_put(p1, sh)
    p2 = jax.device_put(p2, sh)

    def body(a_shard, b_shard):  # (B/n_data, Hp, Wp, C), inside shard_map
        outs = [
            _pair_manual(a_shard[i], b_shard[i], cfg, "tx")
            for i in range(a_shard.shape[0])
        ]
        return jnp.stack(outs)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )
    return fn(p1, p2)
