"""Instrumented pipeline runner: per-scale stage timing table (C15 parity).

Reproduces the reference's verbosity-2 output
(oflow.cpp:296-304: "TIME (Sc: %i, #p:%6i, pconst, pinit, poptim, cflow,
tvopt, total)") by running THE SAME stage functions the production path is
composed of (models/dis.py::_stage_templates/_stage_init/_stage_optimize/
_stage_densify/_stage_refine), each as its own jit with block_until_ready
barriers.  The production path (models/dis.py) stays fully fused; this path
trades fusion for stage visibility — numerics are identical because the
stage bodies are shared, and the end-to-end driver steps (divisibility
padding, final 2^sc_l upscale + crop, run_dense.cpp:296-414) are applied
the same way as dis_raw.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import DISConfig
from ..models.dis import (
    _stage_densify,
    _stage_init,
    _stage_optimize,
    _stage_refine,
    _stage_templates,
)
from ..models.grid import level_geometry
from ..ops import pyramid as pyr


def _ms(t0):
    return (time.perf_counter() - t0) * 1000.0


# Jitted stage wrappers are cached at module level so a SECOND -v 2
# invocation (same config/shapes) pays zero trace cost — the reference's
# timing table measures steady-state stage work (oflow.cpp:296-304), not
# tracing.  Keys are (kind, cfg, ...) — DISConfig is a frozen (hashable)
# dataclass and level_geometry() is lru_cached, so closing over `geo` per
# (sl, w, h) key is stable across calls.
_JIT_CACHE: Dict = {}


def _cached_jit(key, make):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = make()
    return fn


def dis_flow_timed(
    img1,
    img2,
    cfg: DISConfig,
    verbosity: Optional[int] = None,
    gradmag_input: bool = False,
    init_flow=None,
):
    """Run the full driver with per-scale stage timings.

    Returns (out, stats): `out` is the full-resolution (H, W, nop) flow —
    identical semantics to dis_raw — and `stats` is a list of per-scale
    dicts with keys sc, n_patches, pconst, pinit, poptim, cflow, tvopt,
    total (ms).
    """
    v = cfg.verbosity if verbosity is None else verbosity
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    h0, w0 = img1.shape[:2]
    scf = 1 << cfg.sc_f
    t, _, l, _ = pyr.divisibility_padding(h0, w0, scf)
    img1 = pyr.pad_to_divisible(img1, scf)
    img2 = pyr.pad_to_divisible(img2, scf)
    h, w = img1.shape[:2]
    pad = cfg.patch_size

    t0 = time.perf_counter()
    pyr_fn = _cached_jit(
        ("pyr", cfg, gradmag_input),
        lambda: jax.jit(
            lambda x: pyr.build_pyramid(
                x, cfg.sc_f + 1, pad, gradmag_input, first_level=cfg.sc_l
            )
        ),
    )
    im1s, dx1s, dy1s = jax.block_until_ready(pyr_fn(img1))
    im2s, dx2s, dy2s = jax.block_until_ready(pyr_fn(img2))
    t_pyr = _ms(t0)
    if v > 1:
        print(f"TIME (Pyramide+Gradients) (ms): {t_pyr:3g}")

    tmpl_jit = _cached_jit(
        ("tmpl", cfg, pad),
        lambda: jax.jit(
            lambda ia, dxa, dya, ib, dxb, dyb, ptr: _stage_templates(
                ia, dxa, dya, ib, dxb, dyb, ptr, cfg, pad
            )
        ),
    )
    opt_jit = _cached_jit(
        ("opt", cfg, pad),
        lambda: jax.jit(
            lambda ia, ib, tf, tb, ptr, p0, p0b, wl, hl: _stage_optimize(
                ia, ib, tf, tb, ptr, p0, p0b, cfg, wl, hl, pad
            ),
            static_argnums=(7, 8),
        ),
    )

    stats: List[Dict] = []
    # Warm start: init_flow is sized for scale sc_f+1 and consumed by the
    # coarsest level's _stage_init exactly like dis_raw (oflow.cpp:217-220).
    flow = None if init_flow is None else jnp.asarray(init_flow, jnp.float32)
    flow_bw = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        geo = level_geometry(lw, lh, cfg)
        ptr = jnp.asarray(geo.pt_ref)

        t0 = time.perf_counter()
        tmpl_fw, tmpl_bw = jax.block_until_ready(
            tmpl_jit(im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl], ptr)
        )
        t_const = _ms(t0)

        t0 = time.perf_counter()
        p0 = _stage_init(flow, geo, cfg)
        p0b = _stage_init(flow_bw, geo, cfg) if cfg.use_fb_merge else None
        p0 = jax.block_until_ready(p0)
        t_init = _ms(t0)

        t0 = time.perf_counter()
        res_fw, res_bw = jax.block_until_ready(
            opt_jit(im1s[sl], im2s[sl], tmpl_fw, tmpl_bw, ptr, p0, p0b, lw, lh)
        )
        t_opt = _ms(t0)

        t0 = time.perf_counter()
        dens = _cached_jit(
            ("dens", cfg, sl, geo.w, geo.h),
            lambda: jax.jit(partial(_stage_densify, sl=sl, geo=geo, cfg=cfg)),
        )
        flow, flow_bw = jax.block_until_ready(dens(res_fw, res_bw))
        t_dens = _ms(t0)

        t_tv = 0.0
        if cfg.use_tv_refine:
            t0 = time.perf_counter()
            ref = _cached_jit(
                ("ref", cfg, sl),
                lambda: jax.jit(partial(_stage_refine, sl=sl, cfg=cfg)),
            )
            flow, flow_bw = jax.block_until_ready(
                ref(flow, flow_bw,
                    im1s[sl][pad:-pad, pad:-pad], im2s[sl][pad:-pad, pad:-pad])
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

    # Final upscale + divisibility crop (run_dense.cpp:406-414), same as
    # dis_raw.
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = pyr.resize_bilinear(flow * sc, h, w)
    return flow[t : t + h0, l : l + w0], stats
