"""Coarse-to-fine DIS driver: dense inverse search optical flow / stereo.

TPU-native redesign of OFC::OFClass (oflow.cpp:32-363) + the driver glue in
run_dense.cpp:296-414.  The reference hides the whole algorithm inside a
constructor; here it is a pure function

    flow = dis_flow(img1, img2, cfg)          # (H, W, 2)
    disp = dis_stereo(img1, img2, cfg)        # (H, W)

jit-compiled end-to-end: the scale loop is a static Python loop (per-level
shapes are compile-time constants), so XLA sees one fused program per input
shape — one dispatch per frame pair at inference time.

Pipeline per scale sl = sc_f .. sc_l (oflow.cpp:184-337):
  templates -> init from coarser flow (2x NN lookup) -> batched inverse
  search -> deterministic densification (+ optional fwd-bwd merge) ->
  optional variational refinement.
Final: upscale by 2^sc_l (INTER_LINEAR, flow values scaled) and crop the
divisibility padding (run_dense.cpp:406-414).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DISConfig
from ..ops import pyramid as pyr
from .densify import aggregate_flow_dense
from .grid import level_geometry
from .inverse_search import build_templates, optimize_level
from .refine import refine_level


def _stage_templates(im_a, dx_a, dy_a, im_b, dx_b, dy_b, pt_ref, cfg: DISConfig, pad: int):
    """Stage 'pconst': template extraction + Hessians (patchgrid.cpp:109-114).

    Levels the fused whole-level kernel handles DEFER template extraction
    into the kernel itself (zero XLA-side extraction/relayout work): this
    stage then just forwards the level images, and the extraction cost is
    attributed to 'poptim' in the verbosity-2 table."""
    from ..models.inverse_search import PatchTemplates
    from ..ops.pallas_kernels import level_gn_applicable

    hp, wp, c = im_a.shape
    psz = cfg.patch_size
    sy = min(2 * psz + 2, hp)
    sx = min(2 * psz + 2, wp)
    if level_gn_applicable(hp, wp, c, pt_ref.shape[0], psz, sy, sx):
        tmpl_fw = PatchTemplates(tmp=im_a, dx=dx_a, dy=dy_a, hes=None)
        tmpl_bw = (
            PatchTemplates(tmp=im_b, dx=dx_b, dy=dy_b, hes=None)
            if cfg.use_fb_merge else None
        )
        return tmpl_fw, tmpl_bw
    tmpl_fw = build_templates(im_a, dx_a, dy_a, pt_ref, cfg, pad)
    tmpl_bw = (
        build_templates(im_b, dx_b, dy_b, pt_ref, cfg, pad)
        if cfg.use_fb_merge else None
    )
    return tmpl_fw, tmpl_bw


def _stage_init(flow_prev: Optional[jnp.ndarray], geo, cfg: DISConfig) -> jnp.ndarray:
    """Stage 'pinit': InitializeFromCoarserOF (patchgrid.cpp:195-211),
    a 2x NN upsample of the coarser flow (zeros at the coarsest scale)."""
    if flow_prev is None:
        return jnp.zeros((geo.n_patches, cfg.nop), jnp.float32)
    return 2.0 * flow_prev.reshape(-1, cfg.nop)[jnp.asarray(geo.coarse_idx)]


def _stage_optimize(
    im_a, im_b, tmpl_fw, tmpl_bw, pt_ref, p_init, p_init_bw, cfg: DISConfig,
    w: int, h: int, pad: int,
):
    """Stage 'poptim': batched inverse search, fw (+ bw for fb-merge with the
    flipped camera, oflow.cpp:154-157)."""
    res_fw = optimize_level(im_b, tmpl_fw, pt_ref, p_init, cfg, w, h, pad)
    res_bw = None
    if cfg.use_fb_merge:
        res_bw = optimize_level(
            im_a, tmpl_bw, pt_ref, p_init_bw, cfg, w, h, pad,
            camlr=1 - cfg.camlr,
        )
    return res_fw, res_bw


def _stage_densify(res_fw, res_bw, sl: int, geo, cfg: DISConfig):
    """Stage 'cflow': weighted aggregation (+ fb merge); backward flow only
    needed above the finest scale (oflow.cpp:269-270)."""
    flow_fw = aggregate_flow_dense(res_fw, geo, cfg, bw_result=res_bw)
    flow_bw = None
    if cfg.use_fb_merge and sl > cfg.sc_l:
        flow_bw = aggregate_flow_dense(res_bw, geo, cfg, bw_result=res_fw)
    return flow_fw, flow_bw


def _stage_refine(flow_fw, flow_bw, im_a_raw, im_b_raw, sl: int, cfg: DISConfig):
    """Stage 'tvopt': variational refinement of fw (and bw when chained)."""
    if not cfg.use_tv_refine:
        return flow_fw, flow_bw
    flow_fw = refine_level(flow_fw, im_a_raw, im_b_raw, sl, cfg, camlr=cfg.camlr)
    if flow_bw is not None:
        flow_bw = refine_level(flow_bw, im_b_raw, im_a_raw, sl, cfg, camlr=1 - cfg.camlr)
    return flow_fw, flow_bw


def _level_flow(
    im_a, dx_a, dy_a, im_b, dx_b, dy_b,
    flow_prev: Optional[jnp.ndarray],
    flow_bw_prev: Optional[jnp.ndarray],
    sl: int,
    w: int,
    h: int,
    cfg: DISConfig,
    im_a_raw, im_b_raw,
):
    """One pyramid level: returns (flow_fw, flow_bw or None).

    Composed from the _stage_* functions above; utils/instrument.py times
    exactly these stages for the verbosity-2 table (oflow.cpp:296-304)."""
    pad = cfg.patch_size
    geo = level_geometry(w, h, cfg)
    pt_ref = jnp.asarray(geo.pt_ref)

    tmpl_fw, tmpl_bw = _stage_templates(im_a, dx_a, dy_a, im_b, dx_b, dy_b, pt_ref, cfg, pad)
    p_init = _stage_init(flow_prev, geo, cfg)
    p_init_bw = _stage_init(flow_bw_prev, geo, cfg) if cfg.use_fb_merge else None
    res_fw, res_bw = _stage_optimize(
        im_a, im_b, tmpl_fw, tmpl_bw, pt_ref, p_init, p_init_bw, cfg, w, h, pad
    )
    flow_fw, flow_bw = _stage_densify(res_fw, res_bw, sl, geo, cfg)
    return _stage_refine(flow_fw, flow_bw, im_a_raw, im_b_raw, sl, cfg)


def _dis_padded(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cfg: DISConfig,
    init_flow: Optional[jnp.ndarray] = None,
    gradmag_input: bool = False,
) -> jnp.ndarray:
    """Run DIS on images already padded to divisibility by 2^sc_f.

    Returns flow at scale sc_l: (H/2^sc_l, W/2^sc_l, nop).
    """
    h, w = img1.shape[:2]
    if w % (1 << cfg.sc_f) or h % (1 << cfg.sc_f):
        raise ValueError(f"image dims {h}x{w} not divisible by 2^{cfg.sc_f}")
    pad = cfg.patch_size
    n_lv = cfg.sc_f + 1
    im1s, dx1s, dy1s = pyr.build_pyramid(
        img1, n_lv, pad, gradmag_input, first_level=cfg.sc_l
    )
    im2s, dx2s, dy2s = pyr.build_pyramid(
        img2, n_lv, pad, gradmag_input, first_level=cfg.sc_l
    )

    flow_fw = init_flow  # sized for scale sc_f+1 when provided (oflow.cpp:217-220)
    flow_bw = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        raw1 = im1s[sl][pad:-pad, pad:-pad]
        raw2 = im2s[sl][pad:-pad, pad:-pad]
        if sl == cfg.sc_f and init_flow is None:
            prev = None
        else:
            prev = flow_fw
        flow_fw, flow_bw = _level_flow(
            im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
            prev, flow_bw, sl, lw, lh, cfg, raw1, raw2,
        )
    return flow_fw


@partial(jax.jit, static_argnames=("cfg", "gradmag_input"))
def dis_padded_jit(img1, img2, cfg: DISConfig, gradmag_input: bool = False):
    return _dis_padded(img1, img2, cfg, None, gradmag_input)


@partial(jax.jit, static_argnames=("cfg", "gradmag_input"))
def dis_padded_init_jit(img1, img2, init_flow, cfg: DISConfig, gradmag_input: bool = False):
    return _dis_padded(img1, img2, cfg, init_flow, gradmag_input)


def dis_raw(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cfg: DISConfig,
    init_flow: Optional[jnp.ndarray] = None,
    gradmag_input: bool = False,
) -> jnp.ndarray:
    """Full driver on arbitrary-size (H, W, C) inputs: divisibility padding,
    pyramid, coarse-to-fine, final upscale + crop (run_dense.cpp:296-414).

    Returns (H, W, nop) float32.
    """
    cfg.validate()
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    if img1.shape[2] != cfg.channels:
        raise ValueError(f"expected {cfg.channels} channels, got {img1.shape[2]}")
    h0, w0 = img1.shape[:2]
    scf = 1 << cfg.sc_f
    t, b, l, r = pyr.divisibility_padding(h0, w0, scf)
    p1 = pyr.pad_to_divisible(jnp.asarray(img1, jnp.float32), scf)
    p2 = pyr.pad_to_divisible(jnp.asarray(img2, jnp.float32), scf)

    if init_flow is not None:
        flow = dis_padded_init_jit(p1, p2, jnp.asarray(init_flow, jnp.float32), cfg, gradmag_input)
    else:
        flow = dis_padded_jit(p1, p2, cfg, gradmag_input)

    # Upscale to scale 0 if the finest computed scale is coarser
    # (run_dense.cpp:406-411): multiply values by 2^sc_l, INTER_LINEAR resize.
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = pyr.resize_bilinear(flow * sc, p1.shape[0], p1.shape[1])
    # Crop divisibility padding (run_dense.cpp:414).
    return flow[t : t + h0, l : l + w0]


def dis_flow(img1, img2, cfg: Optional[DISConfig] = None, **kw) -> jnp.ndarray:
    """Optical flow: (H, W, 2) float32 (u, v)."""
    if cfg is None:
        from ..config import operating_point

        cfg = operating_point(2, img1.shape[1], channels=1 if img1.ndim == 2 else img1.shape[2])
    if cfg.mode != "flow":
        raise ValueError("cfg.mode must be 'flow'")
    return dis_raw(img1, img2, cfg, **kw)


def dis_stereo(img1, img2, cfg: Optional[DISConfig] = None, **kw) -> jnp.ndarray:
    """Stereo disparity: (H, W) float32, sign convention internal
    (left camera <= 0); negate on .pfm write like the reference."""
    if cfg is None:
        from ..config import operating_point

        cfg = operating_point(
            2, img1.shape[1], mode="stereo", channels=1 if img1.ndim == 2 else img1.shape[2]
        )
    if cfg.mode != "stereo":
        raise ValueError("cfg.mode must be 'stereo'")
    return dis_raw(img1, img2, cfg, **kw)[..., 0]
