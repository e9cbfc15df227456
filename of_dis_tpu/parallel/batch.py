"""Data-parallel frame-pair batching over a device mesh.

The reference is single-process/shared-memory (SURVEY.md §2.2); its TPU
equivalent for video-rate throughput is the trivial-communication axis:
shard a batch of independent frame pairs over all chips/hosts with
jax.sharding, one pair (or more) per device, zero collectives.

    flow = batched_flow(imgs1, imgs2, cfg)            # vmapped, one device
    flow = batched_flow(imgs1, imgs2, cfg, mesh=mesh) # sharded over 'data'
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DISConfig
from ..models.dis import _dis_padded
from ..ops import pyramid as pyr


def data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@partial(jax.jit, static_argnames=("cfg",))
def _batched_padded(imgs1: jnp.ndarray, imgs2: jnp.ndarray, cfg: DISConfig):
    """(B, H, W, C) -> (B, h_l, w_l, nop) at scale sc_l; inputs pre-padded."""
    return jax.vmap(lambda a, b: _dis_padded(a, b, cfg))(imgs1, imgs2)


def batched_flow(
    imgs1,
    imgs2,
    cfg: DISConfig,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
) -> jnp.ndarray:
    """Flow for a batch of frame pairs (B, H, W[, C]) -> (B, H, W, nop).

    With a mesh, the batch axis is sharded across devices (pure data
    parallelism: zero communication).  B must be divisible by the mesh size.
    """
    imgs1 = jnp.asarray(imgs1, jnp.float32)
    imgs2 = jnp.asarray(imgs2, jnp.float32)
    if imgs1.ndim == 3:
        imgs1 = imgs1[..., None]
        imgs2 = imgs2[..., None]
    b, h0, w0 = imgs1.shape[:3]
    scf = 1 << cfg.sc_f
    t, _, l, _ = pyr.divisibility_padding(h0, w0, scf)
    p1 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs1)
    p2 = jax.vmap(lambda x: pyr.pad_to_divisible(x, scf))(imgs2)

    if mesh is not None:
        sh = NamedSharding(mesh, P(axis))
        p1 = jax.device_put(p1, sh)
        p2 = jax.device_put(p2, sh)

    flow = _batched_padded(p1, p2, cfg)
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = jax.vmap(lambda f: pyr.resize_bilinear(f * sc, p1.shape[1], p1.shape[2]))(flow)
    return flow[:, t : t + h0, l : l + w0]
