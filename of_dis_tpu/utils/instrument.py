"""Instrumented pipeline runner: per-scale stage timing table (C15 parity).

Reproduces the reference's verbosity-2 output
(oflow.cpp:296-304: "TIME (Sc: %i, #p:%6i, pconst, pinit, poptim, cflow,
tvopt, total)") by running each stage as its own jit with
block_until_ready barriers.  The production path (models/dis.py) stays
fully fused; use this only to inspect where time goes.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import DISConfig
from ..models.densify import aggregate_flow_dense
from ..models.grid import level_geometry
from ..models.inverse_search import build_templates, optimize_level
from ..models.refine import refine_level
from ..ops import pyramid as pyr


def _ms(t0):
    return (time.perf_counter() - t0) * 1000.0


def dis_flow_timed(img1, img2, cfg: DISConfig, verbosity: Optional[int] = None):
    """Run the pipeline with per-scale stage timings.

    Returns (flow_at_sc_l, stats) where stats is a list of per-scale dicts
    with keys sc, n_patches, pconst, pinit, poptim, cflow, tvopt, total (ms).
    """
    v = cfg.verbosity if verbosity is None else verbosity
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    scf = 1 << cfg.sc_f
    img1 = pyr.pad_to_divisible(img1, scf)
    img2 = pyr.pad_to_divisible(img2, scf)
    h, w = img1.shape[:2]
    pad = cfg.patch_size
    c = cfg.channels

    t0 = time.perf_counter()
    pyr_fn = jax.jit(lambda x: pyr.build_pyramid(x, cfg.sc_f + 1, pad))
    im1s, dx1s, dy1s = jax.block_until_ready(pyr_fn(img1))
    im2s, dx2s, dy2s = jax.block_until_ready(pyr_fn(img2))
    t_pyr = _ms(t0)
    if v > 1:
        print(f"TIME (Pyramide+Gradients) (ms): {t_pyr:3g}")

    tmpl_jit = jax.jit(
        lambda a, dx, dy, ptr: build_templates(a, dx, dy, ptr, cfg, pad)
    )
    opt_jit = jax.jit(
        lambda b, t, ptr, p0, wl, hl: optimize_level(b, t, ptr, p0, cfg, wl, hl, pad),
        static_argnums=(4, 5),
    )

    stats: List[Dict] = []
    flow = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        geo = level_geometry(lw, lh, cfg)
        ptr = jnp.asarray(geo.pt_ref)
        t0 = time.perf_counter()
        tmpl = jax.block_until_ready(
            tmpl_jit(im1s[sl], dx1s[sl], dy1s[sl], ptr)
        )
        t_const = _ms(t0)

        t0 = time.perf_counter()
        if flow is None:
            p0 = jnp.zeros((geo.n_patches, cfg.nop), jnp.float32)
        else:
            p0 = 2.0 * flow.reshape(-1, cfg.nop)[jnp.asarray(geo.coarse_idx)]
        p0 = jax.block_until_ready(p0)
        t_init = _ms(t0)

        t0 = time.perf_counter()
        res = jax.block_until_ready(opt_jit(im2s[sl], tmpl, ptr, p0, lw, lh))
        t_opt = _ms(t0)

        t0 = time.perf_counter()
        dens = jax.jit(partial(aggregate_flow_dense, geo=geo, cfg=cfg))
        flow = jax.block_until_ready(dens(res))
        t_dens = _ms(t0)

        t_tv = 0.0
        if cfg.use_tv_refine:
            t0 = time.perf_counter()
            ref = jax.jit(partial(refine_level, level=sl, cfg=cfg, camlr=cfg.camlr))
            flow = jax.block_until_ready(
                ref(flow, im1s[sl][pad:-pad, pad:-pad], im2s[sl][pad:-pad, pad:-pad])
            )
            t_tv = _ms(t0)

        total = t_const + t_init + t_opt + t_dens + t_tv
        stats.append(dict(sc=sl, n_patches=geo.n_patches, pconst=t_const,
                          pinit=t_init, poptim=t_opt, cflow=t_dens, tvopt=t_tv,
                          total=total))
        if v > 1:
            print(
                f"TIME (Sc: {sl}, #p:{geo.n_patches:6d}, pconst, pinit, poptim, "
                f"cflow, tvopt, total): {t_const:8.2f} {t_init:8.2f} {t_opt:8.2f} "
                f"{t_dens:8.2f} {t_tv:8.2f} -> {total:8.2f} ms."
            )
    if v > 0:
        print(f"TIME (O.Flow Run-Time   ) (ms): {sum(s['total'] for s in stats):3g}")
    return flow, stats
