"""Spatial sharding: one frame pair split across devices with halo exchange.

The reference's only "sequence-length" scaling is pyramid locality
(SURVEY.md §5): patch search reads a bounded window, SOR is a 5-point
stencil, derivative filters are 5-tap.  Exactly these locality structures
make spatial sharding work on a TPU mesh.  Two modes:

1-D column strips (spatial_flow, axis "tx") — level images replicated
(small at Sintel res), exact for unbounded displacements:
  - Patch search: the patch axis is sharded (embarrassingly parallel once
    each device holds the level images).
  - Densification: each device splats its patch shard into a full-size
    (h, w) accumulator; a single psum over the mesh axis merges tile
    borders.  Deterministic, and strictly better than the reference's racy
    OpenMP scatter (CMakeLists.txt:18-19).
  - Variational refinement: the image is tiled into column strips; every
    stencil op (5-tap/3-tap convs, weighted Laplacian, red-black SOR
    half-steps) exchanges 1-2 halo columns with its lax.ppermute neighbors
    over ICI.  Global borders keep replicate semantics via axis-index
    masking.

2-D (ty, tx) tiles (spatial_flow_tiled) — fully TILE-LOCAL memory: inputs
shard over the mesh, each device builds its own raw tile pyramid (2x2 box
averages never straddle tile borders), gradients/search windows/warp
sources come from ppermute halo exchange, densify is tile-local with a
border halo-REDUCE, fb-merge splats into the halo'd accumulator, and only
the final finest flow is all_gathered — per-device peak live bytes scale
as ~1/(nty*ntx) + halos (asserted on the partitioned HLO by
tests/test_spatial.py).  Displacements carried between levels are clamped
to +-max_disp (the image-halo budget; see the section comment below) —
the high-resolution / single-pair-latency mode.

The test invariant for both modes is sharded == single-device
(tests/test_spatial.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DISConfig
from ..models import refine as rf
from ..models.densify import merge_backward, result_absw, splat_forward_scatter
from ..models.dis import _level_flow
from ..models.grid import level_geometry
from ..models.inverse_search import build_templates, optimize_level
from ..ops import pyramid as pyr


# ---------------------------------------------------------------------------
# Halo exchange primitives (axis "tx", column strips)
# ---------------------------------------------------------------------------

def _axis_info(axis: str) -> Tuple[jnp.ndarray, int]:
    return jax.lax.axis_index(axis), jax.lax.axis_size(axis)


def halo_x(x: jnp.ndarray, k: int, axis: str, edge_mode: str = "edge") -> jnp.ndarray:
    """Extend a local strip (h, wl, ...) with k columns from each neighbor.

    Global borders are filled with edge-replication (edge_mode="edge",
    matching the replicate conv borders) or zeros (edge_mode="zero",
    matching the shift ops whose out-of-image weights are zero).
    """
    idx, n = _axis_info(axis)
    # Send my rightmost k cols to my right neighbor (they become its left
    # halo); likewise leftward.
    right_halo_src = x[:, -k:]
    left_halo_src = x[:, :k]
    from_left = jax.lax.ppermute(right_halo_src, axis, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(left_halo_src, axis, [(i + 1, i) for i in range(n - 1)])
    if edge_mode == "edge":
        edge_l = jnp.repeat(x[:, :1], k, axis=1)
        edge_r = jnp.repeat(x[:, -1:], k, axis=1)
    else:
        edge_l = jnp.zeros_like(left_halo_src)
        edge_r = jnp.zeros_like(right_halo_src)
    left = jnp.where(idx == 0, edge_l, from_left)
    right = jnp.where(idx == n - 1, edge_r, from_right)
    return jnp.concatenate([left, x, right], axis=1)


def _conv_h_sharded(img, coeffs, axis):
    """Horizontal conv on a strip: halo-extend, then valid conv."""
    r = len(coeffs) // 2
    xh = halo_x(img, r, axis, "edge")
    w = img.shape[1]
    out = jnp.zeros_like(img)
    for k, c in enumerate(coeffs):
        if c != 0.0:
            out = out + c * xh[:, k : k + w]
    return out


def _shift_left_sharded(x, axis):
    """x[j, i-1] with zero at the global left edge (local strip view)."""
    xh = halo_x(x, 1, axis, "zero")
    return xh[:, : x.shape[1]]


def _shift_right_sharded(x, axis):
    xh = halo_x(x, 1, axis, "zero")
    return xh[:, 2 : 2 + x.shape[1]]


# ---------------------------------------------------------------------------
# Sharded variational refinement
# ---------------------------------------------------------------------------

def _smoothness_sharded(uu, vv, qa, axis):
    ux = _conv_h_sharded(uu, rf.DERIV3, axis)
    uy = rf._conv_v(uu, rf.DERIV3)
    vx = _conv_h_sharded(vv, rf.DERIV3, axis)
    vy = rf._conv_v(vv, rf.DERIV3)
    s = qa / jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy + rf.EPS_SMOOTH)
    horiz = s + _shift_right_sharded(s, axis)
    idx, n = _axis_info(axis)
    # zero the globally-last column only (compute_smoothness semantics)
    col = jnp.arange(horiz.shape[1])
    is_last_dev = idx == n - 1
    horiz = jnp.where(is_last_dev & (col == horiz.shape[1] - 1)[None, :], 0.0, horiz)
    vert = s + rf._down(s)
    vert = vert.at[-1, :].set(0.0)
    return horiz, vert


def _sub_laplacian_sharded(b, src, wh, wv, axis):
    th = wh * (_shift_right_sharded(src, axis) - src)
    tv = wv * (rf._down(src) - src)
    return b + th - _shift_left_sharded(th, axis) + tv - rf._up(tv)


def _sor_coupled_rb_sharded(du, dv, a11, a12, a22, b1, b2, wh, wv, iters, omega, axis):
    h, wl = du.shape
    idx, n = _axis_info(axis)
    # Global checkerboard color depends on the global column index.
    col0 = idx * wl  # equal strip widths enforced by caller
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 1) + col0
    red = (ii + jj) % 2 == 0

    sum_dpsis = (
        rf._up(wv) + _shift_left_sharded(wh, axis) + wv + wh
    )
    A11 = a11 + sum_dpsis
    A22 = a22 + sum_dpsis

    def nb(x):
        return (
            rf._up(wv * x)
            + _shift_left_sharded(wh * x, axis)
            + wv * rf._down(x)
            + wh * _shift_right_sharded(x, axis)
        )

    def half(du, dv, mask):
        B1 = b1 + nb(du)
        du = jnp.where(mask, (1 - omega) * du + (omega / A11) * (B1 - a12 * dv), du)
        B2 = b2 + nb(dv)
        dv = jnp.where(mask, (1 - omega) * dv + (omega / A22) * (B2 - a12 * du), dv)
        return du, dv

    def body(_, c):
        du, dv = c
        du, dv = half(du, dv, red)
        du, dv = half(du, dv, ~red)
        return du, dv

    return jax.lax.fori_loop(0, iters, body, (du, dv))


def _sor_scalar_rb_sharded(du, a11, b1, wh, wv, iters, omega, axis):
    """Scalar (stereo) red-black SOR on a column strip — mirrors
    models/refine.py::sor_scalar_rb with halo-exchanged horizontal shifts."""
    h, wl = du.shape
    idx, n = _axis_info(axis)
    col0 = idx * wl
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 1) + col0
    red = (ii + jj) % 2 == 0

    A11 = a11 + rf._up(wv) + _shift_left_sharded(wh, axis) + wv + wh

    def nb(x):
        return (
            rf._up(wv * x)
            + _shift_left_sharded(wh * x, axis)
            + wv * rf._down(x)
            + wh * _shift_right_sharded(x, axis)
        )

    def half(du, mask):
        B1 = b1 + nb(du)
        return jnp.where(mask, (1 - omega) * du + (omega / A11) * B1, du)

    def body(_, du):
        du = half(du, red)
        du = half(du, ~red)
        return du

    return jax.lax.fori_loop(0, iters, body, du)


def _warp_sharded(src_full, wx, wy, col0):
    """Warp: local flow strip samples the FULL (replicated) target image."""
    h, wl = wx.shape
    wfull = src_full.shape[1]
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 1) + col0
    xx = ii.astype(jnp.float32) + wx
    yy = jj.astype(jnp.float32) + wy
    x = jnp.floor(xx)
    y = jnp.floor(yy)
    dx = (xx - x)[..., None]
    dy = (yy - y)[..., None]
    mask = ((xx >= 0) & (xx <= wfull - 1) & (yy >= 0) & (yy <= h - 1)).astype(jnp.float32)
    x1 = jnp.clip(x.astype(jnp.int32), 0, wfull - 1)
    x2 = jnp.clip(x.astype(jnp.int32) + 1, 0, wfull - 1)
    y1 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    y2 = jnp.clip(y.astype(jnp.int32) + 1, 0, h - 1)
    flat = src_full.reshape(-1, src_full.shape[2])
    g = lambda yi, xi: jnp.take(flat, yi * wfull + xi, axis=0)
    dst = (
        g(y1, x1) * (1 - dx) * (1 - dy)
        + g(y1, x2) * dx * (1 - dy)
        + g(y2, x1) * (1 - dx) * dy
        + g(y2, x2) * dx * dy
    )
    return dst, mask


def _get_derivatives_sharded(im1, im2w, axis):
    mean = 0.5 * (im1 + im2w)
    iz = im2w - im1
    ix = _conv_h_sharded(mean, rf.DERIV5, axis)
    iy = rf._conv_v(mean, rf.DERIV5)
    ixx = _conv_h_sharded(ix, rf.DERIV5, axis)
    ixy = rf._conv_v(ix, rf.DERIV5)
    iyy = rf._conv_v(iy, rf.DERIV5)
    ixz = _conv_h_sharded(iz, rf.DERIV5, axis)
    iyz = rf._conv_v(iz, rf.DERIV5)
    return ix, iy, iz, ixx, ixy, iyy, ixz, iyz


def _refine_level_sharded(flow_strip, im1_strip, im2_full, level, cfg, axis,
                          camlr=None):
    """refine_level on a column strip; im2 replicated for the warp.  camlr
    overrides cfg.camlr for the backward (fb-merge) stereo grid."""
    if camlr is None:
        camlr = cfg.camlr
    nop = cfg.nop
    n_inner = cfg.tv_innerit * (level + 1)
    qa = 0.25 * cfg.tv_alpha
    hd3 = cfg.tv_delta * 0.5 / 3.0
    hg3 = cfg.tv_gamma * 0.5 / 3.0

    idx, _ = _axis_info(axis)
    wl = flow_strip.shape[1]
    col0 = idx * wl

    wx = flow_strip[..., 0]
    wy = flow_strip[..., 1] if nop == 2 else jnp.zeros_like(wx)
    im2w, mask = _warp_sharded(im2_full, wx, wy, col0)
    derivs = _get_derivatives_sharded(im1_strip, im2w, axis)

    du = jnp.zeros_like(wx)
    dv = jnp.zeros_like(wx)
    uu, vv = wx, wy
    for _ in range(n_inner):
        wh, wv_ = _smoothness_sharded(uu, vv, qa, axis)
        a11, a12, a22, b1, b2 = rf.compute_data(du, dv, mask, derivs, hd3, hg3, nop)
        b1 = _sub_laplacian_sharded(b1, wx, wh, wv_, axis)
        if nop == 2:
            b2 = _sub_laplacian_sharded(b2, wy, wh, wv_, axis)
            du, dv = _sor_coupled_rb_sharded(
                du, dv, a11, a12, a22, b1, b2, wh, wv_, cfg.tv_solverit, cfg.tv_sor, axis
            )
            uu = wx + du
            vv = wy + dv
        else:
            du = _sor_scalar_rb_sharded(
                du, a11, b1, wh, wv_, cfg.tv_solverit, cfg.tv_sor, axis
            )
            # Disparity sign clamp (refine_variational.cpp:299-314).
            if camlr == 0:
                uu = jnp.minimum(wx + du, 0.0)
            else:
                uu = jnp.maximum(wx + du, 0.0)
    if nop == 2:
        return jnp.stack([uu, vv], axis=-1)
    return uu[..., None]


# ---------------------------------------------------------------------------
# Sharded level pipeline: patch shard -> psum densify -> strip refine
# ---------------------------------------------------------------------------

def _shard_of(full, rank, k):
    return jax.lax.dynamic_slice_in_dim(full, rank * k, k, axis=0)


def _densify_psum(res, res_other, pt_shard, w, h, cfg, axis):
    """Shard splat (+ optional fb merge of the other direction's shard) into
    a full-size accumulator, psum over the mesh, normalize."""
    we, fo = splat_forward_scatter(res.p, result_absw(res, cfg), pt_shard, w, h, cfg)
    if res_other is not None:
        we, fo = merge_backward(we, fo, res_other, w, h, cfg)
    we = jax.lax.psum(we, axis)
    fo = jax.lax.psum(fo, axis)
    safe = jnp.where(we > 0, we, 1.0)
    return jnp.where((we > 0)[:, None], fo / safe[:, None], 0.0).reshape(h, w, cfg.nop)


def _refine_strip(flow, im_src, im_tgt, sl, cfg, axis, rank, camlr):
    """Slice this device's column strip, refine it against the (replicated)
    target image, and gather the full field back."""
    wl = flow.shape[1] // int(jax.lax.axis_size(axis))
    strip = jax.lax.dynamic_slice_in_dim(flow, rank * wl, wl, axis=1)
    src_strip = jax.lax.dynamic_slice_in_dim(im_src, rank * wl, wl, axis=1)
    strip = _refine_level_sharded(strip, src_strip, im_tgt, sl, cfg, axis, camlr)
    return jax.lax.all_gather(strip, axis, axis=1, tiled=True)


def _level_manual(im_a, dx_a, dy_a, im_b, dx_b, dy_b, flow_prev, flow_bw_prev,
                  sl, w, h, cfg, axis):
    """One pyramid level inside a manual (shard_map) region: patch shard ->
    psum densify (incl. fb merge) -> strip refinement -> all_gather.
    Mirrors models/dis.py::_level_flow per-device, callable from ANY
    shard_map whose mesh has `axis` (e.g. the 2-D (data, tx) mesh).
    Returns (flow, flow_bw or None)."""
    rank = jax.lax.axis_index(axis)
    ntx = int(jax.lax.axis_size(axis))  # static under shard_map
    pad = cfg.patch_size
    geo = level_geometry(w, h, cfg)
    n = geo.n_patches

    def init_full(prev):
        if prev is None:
            return jnp.zeros((n, cfg.nop), jnp.float32)
        return 2.0 * prev.reshape(-1, cfg.nop)[jnp.asarray(geo.coarse_idx)]

    p_init_full = init_full(flow_prev)
    pt_full = jnp.asarray(geo.pt_ref)

    # Local patch shard (pad to a multiple of the axis size; padded lanes
    # have far-out-of-bounds centers, so they start converged and inert).
    npad = (-n) % ntx
    if npad:
        pt_full = jnp.concatenate([pt_full, jnp.full((npad, 2), -1e6, jnp.float32)])
        p_init_full = jnp.pad(p_init_full, ((0, npad), (0, 0)))
    k = (n + npad) // ntx
    pt_shard = _shard_of(pt_full, rank, k)
    p_init = _shard_of(p_init_full, rank, k)

    tmpl = build_templates(im_a, dx_a, dy_a, pt_shard, cfg, pad)
    res = optimize_level(im_b, tmpl, pt_shard, p_init, cfg, w, h, pad)

    res_bw = None
    if cfg.use_fb_merge:
        # Backward grid: swapped images, flipped camera (oflow.cpp:154-157).
        p_init_bw_full = init_full(flow_bw_prev)
        if npad:
            p_init_bw_full = jnp.pad(p_init_bw_full, ((0, npad), (0, 0)))
        tmpl_bw = build_templates(im_b, dx_b, dy_b, pt_shard, cfg, pad)
        res_bw = optimize_level(
            im_a, tmpl_bw, pt_shard, _shard_of(p_init_bw_full, rank, k),
            cfg, w, h, pad, camlr=1 - cfg.camlr,
        )

    # Per-device densification into a full-size accumulator + psum
    # (deterministic; replaces the reference's racy OpenMP scatter).
    # Splat numerics live in ONE place: models/densify.py.
    flow = _densify_psum(res, res_bw, pt_shard, w, h, cfg, axis)
    flow_bw = None
    if cfg.use_fb_merge and sl > cfg.sc_l:
        flow_bw = _densify_psum(res_bw, res, pt_shard, w, h, cfg, axis)

    if cfg.use_tv_refine:
        raw1 = im_a[pad:-pad, pad:-pad]
        raw2 = im_b[pad:-pad, pad:-pad]
        flow = _refine_strip(flow, raw1, raw2, sl, cfg, axis, rank, cfg.camlr)
        if flow_bw is not None:
            flow_bw = _refine_strip(
                flow_bw, raw2, raw1, sl, cfg, axis, rank, 1 - cfg.camlr
            )
    return flow, flow_bw


def _pair_manual(img1p, img2p, cfg, axis):
    """Coarse-to-fine flow for one padded pair inside a manual region.

    Level images are replicated over `axis` (they are small); levels whose
    width divides the axis run sharded, others run replicated."""
    h, w = img1p.shape[:2]
    pad = cfg.patch_size
    ntx = int(jax.lax.axis_size(axis))
    im1s, dx1s, dy1s = pyr.build_pyramid(img1p, cfg.sc_f + 1, pad, first_level=cfg.sc_l)
    im2s, dx2s, dy2s = pyr.build_pyramid(img2p, cfg.sc_f + 1, pad, first_level=cfg.sc_l)
    flow = None
    flow_bw = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        sharded_ok = lw % ntx == 0 and lw >= 2 * ntx
        if sharded_ok:
            flow, flow_bw = _level_manual(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
                flow, flow_bw, sl, lw, lh, cfg, axis
            )
        else:
            raw1 = im1s[sl][pad:-pad, pad:-pad]
            raw2 = im2s[sl][pad:-pad, pad:-pad]
            flow, flow_bw = _level_flow(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
                flow, flow_bw, sl, lw, lh, cfg, raw1, raw2,
            )
    return flow


def spatial_fn(cfg: DISConfig, mesh: Mesh, axis: str = "tx"):
    """The bare sharded pipeline callable behind spatial_flow: a shard_map
    over _pair_manual taking two padded (H, W, C) float32 images.

    Exposed separately so multi-process callers can AOT-compile it
    (jax.jit(spatial_fn(...)).lower(a, b).compile()) and barrier BEFORE the
    first execution — the first cross-process collective initializes its
    Gloo/ICI context under a timeout, which compile-time skew between
    processes can blow through (tests/dist_worker.py)."""
    return jax.shard_map(
        functools.partial(_pair_manual, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def spatial_flow(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cfg: DISConfig,
    mesh: Mesh,
    axis: str = "tx",
) -> jnp.ndarray:
    """Coarse-to-fine flow for ONE pair, sharded spatially over `axis`.

    One shard_map over the whole pipeline (_pair_manual): levels whose width
    divides the mesh run patch-sharded with psum densification and column-
    strip refinement; coarse levels fall back to replicated execution (their
    cost is negligible).
    """
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    h, w = img1.shape[:2]
    if w % (1 << cfg.sc_f) or h % (1 << cfg.sc_f):
        raise ValueError("inputs must be padded to divisibility by 2^sc_f")
    fn = spatial_fn(cfg, mesh, axis)
    return fn(jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32))


# ---------------------------------------------------------------------------
# 2-D (ty, tx) tiling: tiled level images + halo exchange in both axes
# ---------------------------------------------------------------------------
#
# SURVEY.md §5's "sequence-parallel" design: the frame is cut into an
# nty x ntx grid of tiles; each device holds only a halo'd TILE of every
# pyramid level (images, search windows, flow, refinement fields), patches
# are owned by the tile containing their grid center, densification is a
# tile-local splat with a border halo-REDUCE (ppermute) instead of a
# full-image psum, and refinement exchanges 1-2 px halos per stencil op.
#
# Contract (the one deviation from the replicated paths): the warm-start
# displacement a patch may carry into a level is clamped to +-max_disp px
# (default 8), because the image halo each device holds is
# H = psz + ceil(max_disp) + 2 wide.  Flow fields whose inter-level growth
# stays under max_disp (the common case: DIS displacement per level is
# bounded by patch travel psz/2 plus densify smoothing) are EXACTLY equal to
# the single-device result; faster content degrades gracefully (the clamp
# re-finds large motion over successive levels).  Use spatial_flow /
# batched_flow when unbounded per-level motion must be preserved.


def halo_y(x: jnp.ndarray, k: int, axis: str, edge_mode: str = "edge") -> jnp.ndarray:
    """Row version of halo_x: extend a (hl, w, ...) tile with k rows from
    each neighbor along `axis`.  edge_mode at the GLOBAL borders: "edge"
    (replicate), "zero", or "reflect101" (mirror without the edge row —
    OpenCV BORDER_DEFAULT, the Sobel border)."""
    idx, n = _axis_info(axis)
    bot_src = x[-k:]
    top_src = x[:k]
    from_top = jax.lax.ppermute(bot_src, axis, [(i, i + 1) for i in range(n - 1)])
    from_bot = jax.lax.ppermute(top_src, axis, [(i + 1, i) for i in range(n - 1)])
    if edge_mode == "edge":
        edge_t = jnp.repeat(x[:1], k, axis=0)
        edge_b = jnp.repeat(x[-1:], k, axis=0)
    elif edge_mode == "reflect101":
        edge_t = jnp.flip(x[1 : k + 1], axis=0)
        edge_b = jnp.flip(x[-k - 1 : -1], axis=0)
    else:
        edge_t = jnp.zeros_like(top_src)
        edge_b = jnp.zeros_like(bot_src)
    top = jnp.where(idx == 0, edge_t, from_top)
    bot = jnp.where(idx == n - 1, edge_b, from_bot)
    return jnp.concatenate([top, x, bot], axis=0)


def _halo_x_mode(x, k, axis, edge_mode):
    """halo_x with the extra reflect101 edge mode (column version)."""
    if edge_mode != "reflect101":
        return halo_x(x, k, axis, edge_mode)
    idx, n = _axis_info(axis)
    from_left = jax.lax.ppermute(x[:, -k:], axis, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(x[:, :k], axis, [(i + 1, i) for i in range(n - 1)])
    edge_l = jnp.flip(x[:, 1 : k + 1], axis=1)
    edge_r = jnp.flip(x[:, -k - 1 : -1], axis=1)
    left = jnp.where(idx == 0, edge_l, from_left)
    right = jnp.where(idx == n - 1, edge_r, from_right)
    return jnp.concatenate([left, x, right], axis=1)


def _halo2d(x, k, ay, ax, edge_mode="edge"):
    """Extend a (th, tw, ...) tile by k in both axes (2-pass: the y-pass
    carries the x-halos, so corners arrive from diagonal neighbors)."""
    return halo_y(_halo_x_mode(x, k, ax, edge_mode), k, ay, edge_mode)


def _sobel_tile(tile, ay, ax):
    """3x3 Sobel /8 on a tile: 1-px halo exchange, reflect-101 at global
    borders — identical values to pyr.sobel on the full level."""
    p = _halo2d(tile, 1, ay, ax, "reflect101")
    diff_x = p[:, 2:] - p[:, :-2]
    smooth_x = p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]
    dx = (diff_x[:-2] + 2.0 * diff_x[1:-1] + diff_x[2:]) * 0.125
    dy = (smooth_x[2:] - smooth_x[:-2]) * 0.125
    return dx, dy


def _conv_v_sharded(img, coeffs, axis):
    r = len(coeffs) // 2
    xh = halo_y(img, r, axis, "edge")
    h = img.shape[0]
    out = jnp.zeros_like(img)
    for k, c in enumerate(coeffs):
        if c != 0.0:
            out = out + c * xh[k : k + h]
    return out


def _shift_up_sharded(x, axis):
    """x[j-1, i] with zero at the global top edge."""
    xh = halo_y(x, 1, axis, "zero")
    return xh[: x.shape[0]]


def _shift_down_sharded(x, axis):
    xh = halo_y(x, 1, axis, "zero")
    return xh[2 : 2 + x.shape[0]]


def _smoothness_2d(uu, vv, qa, ay, ax):
    ux = _conv_h_sharded(uu, rf.DERIV3, ax)
    uy = _conv_v_sharded(uu, rf.DERIV3, ay)
    vx = _conv_h_sharded(vv, rf.DERIV3, ax)
    vy = _conv_v_sharded(vv, rf.DERIV3, ay)
    s = qa / jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy + rf.EPS_SMOOTH)
    iy, ny = _axis_info(ay)
    ix, nx = _axis_info(ax)
    th, tw = s.shape
    col = jnp.arange(tw)
    row = jnp.arange(th)
    horiz = s + _shift_right_sharded(s, ax)
    horiz = jnp.where((ix == nx - 1) & (col == tw - 1)[None, :], 0.0, horiz)
    vert = s + _shift_down_sharded(s, ay)
    vert = jnp.where((iy == ny - 1) & (row == th - 1)[:, None], 0.0, vert)
    return horiz, vert


def _sub_laplacian_2d(b, src, wh, wv, ay, ax):
    th_ = wh * (_shift_right_sharded(src, ax) - src)
    tv = wv * (_shift_down_sharded(src, ay) - src)
    return b + th_ - _shift_left_sharded(th_, ax) + tv - _shift_up_sharded(tv, ay)


def _sor_rb_2d(du, dv, a11, a12, a22, b1, b2, wh, wv, iters, omega, ay, ax, nop):
    """Red-black SOR on a 2-D tile; global checkerboard color, halo
    exchange in both axes per half-step.  dv/a12/a22/b2 ignored for nop=1."""
    h, wl = du.shape
    iy, _ = _axis_info(ay)
    ix, _ = _axis_info(ax)
    row0 = iy * h
    col0 = ix * wl
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 0) + row0
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, wl), 1) + col0
    red = (ii + jj) % 2 == 0

    sum_dpsis = _shift_up_sharded(wv, ay) + _shift_left_sharded(wh, ax) + wv + wh
    A11 = a11 + sum_dpsis

    def nb(x):
        return (
            _shift_up_sharded(wv * x, ay)
            + _shift_left_sharded(wh * x, ax)
            + wv * _shift_down_sharded(x, ay)
            + wh * _shift_right_sharded(x, ax)
        )

    if nop == 2:
        A22 = a22 + sum_dpsis

        def half(du, dv, mask):
            B1 = b1 + nb(du)
            du = jnp.where(mask, (1 - omega) * du + (omega / A11) * (B1 - a12 * dv), du)
            B2 = b2 + nb(dv)
            dv = jnp.where(mask, (1 - omega) * dv + (omega / A22) * (B2 - a12 * du), dv)
            return du, dv

        def body(_, c):
            du, dv = c
            du, dv = half(du, dv, red)
            du, dv = half(du, dv, ~red)
            return du, dv

        return jax.lax.fori_loop(0, iters, body, (du, dv))

    def half1(du, mask):
        B1 = b1 + nb(du)
        return jnp.where(mask, (1 - omega) * du + (omega / A11) * B1, du)

    def body1(_, du):
        du = half1(du, red)
        du = half1(du, ~red)
        return du

    return jax.lax.fori_loop(0, iters, body1, du), dv


def _warp_2d(src_tile, wx, wy, y0, x0, ty0, tx0, w, h):
    """Warp a (th, tw) flow tile against a halo'd raw image tile whose row 0
    sits at (ty0, tx0) of the global raw level.  Taps are clamped globally
    (reference semantics) then into the tile (exact when |flow| <= the halo
    width — the max_disp contract)."""
    th, tw = wx.shape
    lth, ltw = src_tile.shape[:2]
    jj = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0
    ii = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0
    xx = ii.astype(jnp.float32) + wx
    yy = jj.astype(jnp.float32) + wy
    x = jnp.floor(xx)
    y = jnp.floor(yy)
    dx = (xx - x)[..., None]
    dy = (yy - y)[..., None]
    mask = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)).astype(jnp.float32)
    x1 = jnp.clip(jnp.clip(x.astype(jnp.int32), 0, w - 1) - tx0, 0, ltw - 1)
    x2 = jnp.clip(jnp.clip(x.astype(jnp.int32) + 1, 0, w - 1) - tx0, 0, ltw - 1)
    y1 = jnp.clip(jnp.clip(y.astype(jnp.int32), 0, h - 1) - ty0, 0, lth - 1)
    y2 = jnp.clip(jnp.clip(y.astype(jnp.int32) + 1, 0, h - 1) - ty0, 0, lth - 1)
    flat = src_tile.reshape(-1, src_tile.shape[2])
    g = lambda yi, xi: jnp.take(flat, yi * ltw + xi, axis=0)
    dst = (
        g(y1, x1) * (1 - dx) * (1 - dy)
        + g(y1, x2) * dx * (1 - dy)
        + g(y2, x1) * (1 - dx) * dy
        + g(y2, x2) * dx * dy
    )
    return dst, mask


def _get_derivatives_2d(im1, im2w, ay, ax):
    mean = 0.5 * (im1 + im2w)
    iz = im2w - im1
    ix = _conv_h_sharded(mean, rf.DERIV5, ax)
    iy = _conv_v_sharded(mean, rf.DERIV5, ay)
    ixx = _conv_h_sharded(ix, rf.DERIV5, ax)
    ixy = _conv_v_sharded(ix, rf.DERIV5, ay)
    iyy = _conv_v_sharded(iy, rf.DERIV5, ay)
    ixz = _conv_h_sharded(iz, rf.DERIV5, ax)
    iyz = _conv_v_sharded(iz, rf.DERIV5, ay)
    return ix, iy, iz, ixx, ixy, iyy, ixz, iyz


def _refine_level_2d(flow_tile, im1_tile, im2_tile, y0, x0, ty0, tx0,
                     level, cfg, ay, ax, w, h, camlr=None):
    """refine_level on a 2-D tile; im1 tile is interior-only (halo via
    exchange), im2 tile is halo'd for the warp.  camlr overrides cfg.camlr
    for the backward (fb-merge) stereo grid."""
    if camlr is None:
        camlr = cfg.camlr
    nop = cfg.nop
    n_inner = cfg.tv_innerit * (level + 1)
    qa = 0.25 * cfg.tv_alpha
    hd3 = cfg.tv_delta * 0.5 / 3.0
    hg3 = cfg.tv_gamma * 0.5 / 3.0

    wx = flow_tile[..., 0]
    wy = flow_tile[..., 1] if nop == 2 else jnp.zeros_like(wx)
    im2w, mask = _warp_2d(im2_tile, wx, wy, y0, x0, ty0, tx0, w, h)
    derivs = _get_derivatives_2d(im1_tile, im2w, ay, ax)

    du = jnp.zeros_like(wx)
    dv = jnp.zeros_like(wx)
    uu, vv = wx, wy
    for _ in range(n_inner):
        wh, wv_ = _smoothness_2d(uu, vv, qa, ay, ax)
        a11, a12, a22, b1, b2 = rf.compute_data(du, dv, mask, derivs, hd3, hg3, nop)
        b1 = _sub_laplacian_2d(b1, wx, wh, wv_, ay, ax)
        if nop == 2:
            b2 = _sub_laplacian_2d(b2, wy, wh, wv_, ay, ax)
        du, dv = _sor_rb_2d(du, dv, a11, a12, a22, b1, b2, wh, wv_,
                            cfg.tv_solverit, cfg.tv_sor, ay, ax, nop)
        if nop == 2:
            uu = wx + du
            vv = wy + dv
        else:
            if camlr == 0:
                uu = jnp.minimum(wx + du, 0.0)
            else:
                uu = jnp.maximum(wx + du, 0.0)
    if nop == 2:
        return jnp.stack([uu, vv], axis=-1)
    return uu[..., None]


def _halo_reduce_2d(acc, k, ay, ax):
    """Fold a tile-local splat's k-wide border accumulations into the
    neighbors (2-pass: x then y propagates corners).  acc (th+2k, tw+2k, K);
    edge-tile outer borders (out-of-image footprints) are dropped — exactly
    the reference's global bounds check."""
    iy, ny = _axis_info(ay)
    ix, nx = _axis_info(ax)
    to_right = jax.lax.ppermute(acc[:, -k:], ax, [(i, i + 1) for i in range(nx - 1)])
    to_left = jax.lax.ppermute(acc[:, :k], ax, [(i + 1, i) for i in range(nx - 1)])
    acc = acc.at[:, k : 2 * k].add(jnp.where(ix == 0, 0.0, to_right))
    acc = acc.at[:, -2 * k : -k].add(jnp.where(ix == nx - 1, 0.0, to_left))
    to_bot = jax.lax.ppermute(acc[-k:], ay, [(i, i + 1) for i in range(ny - 1)])
    to_top = jax.lax.ppermute(acc[:k], ay, [(i + 1, i) for i in range(ny - 1)])
    acc = acc.at[k : 2 * k].add(jnp.where(iy == 0, 0.0, to_bot))
    acc = acc.at[-2 * k : -k].add(jnp.where(iy == ny - 1, 0.0, to_top))
    return acc[k:-k, k:-k]


def _level_2d(tile1, tile2, flow_prev, flow_bw_prev, prev_is_full,
              own_idx, own_valid, sl, lw, lh, cfg, ay, ax, max_disp):
    """One pyramid level on TILE-LOCAL data: tile1/tile2 are this device's
    (th, tw, C) raw level tiles.  Gradients, padded search tiles and the
    warp-source tile are built by HALO EXCHANGE (ppermute) — nothing
    full-size is ever materialized per device, so peak live bytes scale as
    ~1/(nty*ntx) + halos.  flow_prev is the device's coarser flow TILE
    (th/2, tw/2, nop), or the full coarser field when the previous level ran
    replicated (prev_is_full).  Returns (flow_tile (th, tw, nop), n_clamped).
    """
    pad = cfg.patch_size
    psz = cfg.patch_size
    nop = cfg.nop
    iy, ny = _axis_info(ay)
    ix, nx = _axis_info(ax)
    th, tw, c = tile1.shape
    y0 = iy * th
    x0 = ix * tw
    hp_g, wp_g = lh + 2 * pad, lw + 2 * pad
    H = psz + int(np.ceil(max_disp)) + 2

    # Tile-local gradients (1-px halo exchange; reflect-101 global borders).
    dx1_t, dy1_t = _sobel_tile(tile1, ay, ax)

    # Halo'd padded tiles: an H-wide exchange with replicate (images) / zero
    # (gradients) global borders reproduces exactly the corresponding region
    # of the full padded level arrays.  Frame origin in global padded
    # coordinates is (y0 + pad - H, x0 + pad - H) — possibly negative;
    # such virtual rows are replicas/zeros and are never selected (window
    # bases are clipped to the global padded extent).
    im1p_t = _halo2d(tile1, H, ay, ax, "edge")
    im2p_t = _halo2d(tile2, H, ay, ax, "edge")
    dx1p_t = _halo2d(dx1_t, H, ay, ax, "zero")
    dy1p_t = _halo2d(dy1_t, H, ay, ax, "zero")
    sy0 = y0 + pad - H
    sx0 = x0 + pad - H

    geo = level_geometry(lw, lh, cfg)
    pt_full = jnp.asarray(geo.pt_ref)
    own_idx = own_idx.reshape(-1)
    own_valid = own_valid.reshape(-1)
    pt_own = jnp.where(
        own_valid[:, None], jnp.take(pt_full, own_idx, axis=0), -1e6
    )

    def warm_start(prev):
        """(p_init, clamp-hit count) from the coarser flow (full or tiled)."""
        if prev is None:
            return (
                jnp.zeros((own_idx.shape[0], nop), jnp.float32),
                jnp.zeros((), jnp.int32),
            )
        cidx = jnp.take(jnp.asarray(geo.coarse_idx), own_idx)
        cw = max(lw // 2, 1)
        if prev_is_full:
            p_raw = 2.0 * prev.reshape(-1, nop)[cidx]
        else:
            # Tiled coarser flow: a patch center inside this tile always
            # maps into this device's coarser tile (tiles halve exactly).
            th2, tw2 = prev.shape[:2]
            ly = jnp.clip(cidx // cw - y0 // 2, 0, th2 - 1)
            lx = jnp.clip(cidx % cw - x0 // 2, 0, tw2 - 1)
            p_raw = 2.0 * prev.reshape(-1, nop)[ly * tw2 + lx]
        # The max_disp contract; count hits (silent degradation guard,
        # VERDICT r2 weak #4).
        hit = own_valid & jnp.any(jnp.abs(p_raw) > max_disp, axis=1)
        return jnp.clip(p_raw, -max_disp, max_disp), jnp.sum(hit.astype(jnp.int32))

    p_init, ncl_fw = warm_start(flow_prev)
    tmpl = build_templates(
        im1p_t, dx1p_t, dy1p_t, pt_own, cfg, pad, tile_origin=(sy0, sx0),
    )
    res = optimize_level(
        im2p_t, tmpl, pt_own, p_init, cfg, lw, lh, pad,
        tile=(sy0, sx0, hp_g, wp_g),
    )

    res_bw = None
    ncl_bw = jnp.zeros((), jnp.int32)
    if cfg.use_fb_merge:
        # Backward grid on the same tile ownership: swapped images, flipped
        # camera (oflow.cpp:154-157).
        dx2_t, dy2_t = _sobel_tile(tile2, ay, ax)
        dx2p_t = _halo2d(dx2_t, H, ay, ax, "zero")
        dy2p_t = _halo2d(dy2_t, H, ay, ax, "zero")
        p_init_bw, ncl_bw = warm_start(flow_bw_prev)
        tmpl_bw = build_templates(
            im2p_t, dx2p_t, dy2p_t, pt_own, cfg, pad, tile_origin=(sy0, sx0),
        )
        res_bw = optimize_level(
            im1p_t, tmpl_bw, pt_own, p_init_bw, cfg, lw, lh, pad,
            camlr=1 - cfg.camlr, tile=(sy0, sx0, hp_g, wp_g),
        )
    n_clamped = jax.lax.psum(jax.lax.psum(ncl_fw + ncl_bw, ax), ay)

    # --- tile-local densify + halo reduce (no full-image psum) ---
    # fb-merge splats at the CONVERGED backward positions (runtime, up to
    # max_disp + psz/2 + 1 from the static centers), so the accumulator
    # halo must be H-wide then; pure-forward splats reach only psz.
    ks = H if cfg.use_fb_merge else psz

    def densify_tile(r_fw, r_bw):
        pt_loc = pt_own - jnp.stack(
            [x0.astype(jnp.float32) - ks, y0.astype(jnp.float32) - ks]
        )[None, :]
        we, fo = splat_forward_scatter(
            r_fw.p, result_absw(r_fw, cfg), pt_loc, tw + 2 * ks, th + 2 * ks, cfg
        )
        if r_bw is not None:
            we, fo = merge_backward(
                we, fo, r_bw, lw, lh, cfg,
                origin=(y0 - ks, x0 - ks), acc_shape=(th + 2 * ks, tw + 2 * ks),
            )
        acc = jnp.concatenate(
            [we[:, None], fo], axis=1
        ).reshape(th + 2 * ks, tw + 2 * ks, 1 + nop)
        acc = _halo_reduce_2d(acc, ks, ay, ax)
        wacc = acc[..., 0]
        safe = jnp.where(wacc > 0, wacc, 1.0)
        return jnp.where((wacc > 0)[..., None], acc[..., 1:] / safe[..., None], 0.0)

    flow = densify_tile(res, res_bw)
    flow_bw = None
    if cfg.use_fb_merge and sl > cfg.sc_l:
        flow_bw = densify_tile(res_bw, res)

    if cfg.use_tv_refine:
        # Warp-source tile: im2p_t IS the H-wide replicate-halo'd raw tile —
        # taps beyond it clamp into the halo (the max_disp contract);
        # global-border taps see the replicate values, i.e. exactly the
        # reference's clamp-to-edge.
        flow = _refine_level_2d(
            flow, tile1, im2p_t, y0, x0, y0 - H, x0 - H, sl, cfg, ay, ax,
            lw, lh, camlr=cfg.camlr,
        )
        if flow_bw is not None:
            flow_bw = _refine_level_2d(
                flow_bw, tile2, im1p_t, y0, x0, y0 - H, x0 - H, sl, cfg, ay, ax,
                lw, lh, camlr=1 - cfg.camlr,
            )

    return flow, flow_bw, n_clamped


def _pair_2d(img1p, img2p, own, cfg, ay, ax, max_disp, inputs_sharded):
    """Coarse-to-fine flow for one padded pair on a (ty, tx) tile mesh.

    Levels in `own` (a CONTIGUOUS run from sc_l upward; spatial_flow_tiled
    enforces it) run tile-local: each device builds its raw tile chain
    bottom-up from its INPUT SHARD (one 2^sc_l box average + local 2x2
    averages — non-overlapping boxes never straddle tile borders, so the
    pyramid needs no halo at all and values are bit-identical to the
    replicated chain).  Levels above the run are replicated: their full
    images derive from ONE all_gather of the coarsest tiled level's tiles
    (small).  Only the final finest flow is gathered full-size.

    Returns (flow, clamp_counts)."""
    pad = cfg.patch_size
    _, ny = _axis_info(ay)
    _, nx = _axis_info(ax)
    if inputs_sharded:
        h = img1p.shape[0] * ny
        w = img1p.shape[1] * nx
    else:
        h, w = img1p.shape[:2]
    c = img1p.shape[2]
    tiled_lvls = sorted(int(k[2:]) for k in own)
    sl_t = tiled_lvls[-1] if tiled_lvls else cfg.sc_l - 1

    # --- per-device raw tile chain for the tiled levels ---
    tiles = {}
    if tiled_lvls:
        k0 = 1 << cfg.sc_l
        for key, img in (("t1", img1p), ("t2", img2p)):
            # any tiled level => spatial_flow_tiled shards the inputs
            # (inputs_sharded = bool(own)), so img IS this device's slice
            sl0 = img
            if cfg.sc_l > 0:
                s = jax.lax.reduce_window(
                    sl0, 0.0, jax.lax.add, (k0, k0, 1), (k0, k0, 1), "VALID"
                )
                t = s * (1.0 / (k0 * k0))
            else:
                t = sl0
            tiles[(key, cfg.sc_l)] = t
            for sl in range(cfg.sc_l + 1, sl_t + 1):
                t = pyr.downsample_half(t)
                tiles[(key, sl)] = t

    # --- full images for the replicated levels (above sl_t) ---
    im1s = im2s = dx1s = dy1s = dx2s = dy2s = None
    if sl_t < cfg.sc_f:
        if tiled_lvls:
            f1 = jax.lax.all_gather(tiles[("t1", sl_t)], ax, axis=1, tiled=True)
            f1 = jax.lax.all_gather(f1, ay, axis=0, tiled=True)
            f2 = jax.lax.all_gather(tiles[("t2", sl_t)], ax, axis=1, tiled=True)
            f2 = jax.lax.all_gather(f2, ay, axis=0, tiled=True)
            first = sl_t + 1
            f1 = pyr.downsample_half(f1)
            f2 = pyr.downsample_half(f2)
        else:
            first = cfg.sc_l
            f1, f2 = img1p, img2p
        # Build padded image/gradient lists for levels first..sc_f, indexed
        # by level (entries below `first` stay None).
        n_lv = cfg.sc_f + 1
        im1s, dx1s, dy1s = [None] * n_lv, [None] * n_lv, [None] * n_lv
        im2s, dx2s, dy2s = [None] * n_lv, [None] * n_lv, [None] * n_lv
        if tiled_lvls:
            cur1, cur2 = f1, f2
            for sl in range(first, cfg.sc_f + 1):
                if sl > first:
                    cur1 = pyr.downsample_half(cur1)
                    cur2 = pyr.downsample_half(cur2)
                for (cur, ims, dxs, dys) in (
                    (cur1, im1s, dx1s, dy1s), (cur2, im2s, dx2s, dy2s)
                ):
                    dx_, dy_ = pyr.sobel(cur)
                    ims[sl] = pyr.pad_replicate(cur, pad)
                    dxs[sl] = pyr.pad_zero(dx_, pad)
                    dys[sl] = pyr.pad_zero(dy_, pad)
        else:
            im1s, dx1s, dy1s = pyr.build_pyramid(f1, n_lv, pad, first_level=first)
            im2s, dx2s, dy2s = pyr.build_pyramid(f2, n_lv, pad, first_level=first)

    flow = None
    flow_bw = None
    prev_is_full = True
    clamp_counts = {}
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        if f"lv{sl}" in own:
            flow, flow_bw, nclamp = _level_2d(
                tiles[("t1", sl)], tiles[("t2", sl)], flow, flow_bw, prev_is_full,
                own[f"lv{sl}"][0], own[f"lv{sl}"][1],
                sl, lw, lh, cfg, ay, ax, max_disp,
            )
            clamp_counts[f"lv{sl}"] = nclamp
            prev_is_full = False
        else:
            raw1 = im1s[sl][pad:-pad, pad:-pad]
            raw2 = im2s[sl][pad:-pad, pad:-pad]
            flow, flow_bw = _level_flow(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
                flow, flow_bw, sl, lw, lh, cfg, raw1, raw2,
            )
            prev_is_full = True
    if not prev_is_full:  # finest level ran tiled: gather once at the end
        flow = jax.lax.all_gather(flow, ax, axis=1, tiled=True)
        flow = jax.lax.all_gather(flow, ay, axis=0, tiled=True)
    return flow, clamp_counts


def tile_ownership(h, w, cfg, ny, nx, max_disp, ay, ax):
    """Static patch-ownership tables per tileable level of an (h, w) pair on
    an (ny, nx) tile grid — shared by spatial_flow_tiled and the 3-axis
    (data, ty, tx) composition (multihost.flow_2d_tiled).

    Tile-local levels must form a CONTIGUOUS run from sc_l upward (the
    per-device raw tile chain and the tiled flow_prev handoff both assume
    it): stop at the first non-tileable level.  Returns (own, specs):
    own["lv<sl>"] = (idx (ny,nx,K) int32, valid (ny,nx,K) bool) and the
    matching shard_map PartitionSpecs over (ay, ax)."""
    psz = cfg.patch_size
    H = psz + int(np.ceil(max_disp)) + 2
    own = {}
    specs = {}
    for sl in range(cfg.sc_l, cfg.sc_f + 1):
        lw, lh = w >> sl, h >> sl
        th, tw = lh // ny, lw // nx
        tileable = (
            lh % ny == 0 and lw % nx == 0
            # one-hop halo exchange: neighbors must hold the whole halo
            # (H > psz always, so this also covers the patch-fits bound)
            and th >= H and tw >= H
        )
        if not tileable:
            break
        geo = level_geometry(lw, lh, cfg)
        if geo.n_patches == 0:
            break
        ty = np.clip(geo.pt_ref[:, 1].astype(np.int64) // th, 0, ny - 1)
        tx = np.clip(geo.pt_ref[:, 0].astype(np.int64) // tw, 0, nx - 1)
        owner = ty * nx + tx
        counts = np.bincount(owner, minlength=ny * nx)
        kmax = max(int(counts.max()), 1)
        idx = np.zeros((ny, nx, kmax), np.int32)
        valid = np.zeros((ny, nx, kmax), bool)
        for t in range(ny * nx):
            mine = np.nonzero(owner == t)[0]
            idx[t // nx, t % nx, : mine.size] = mine
            valid[t // nx, t % nx, : mine.size] = True
        own[f"lv{sl}"] = (jnp.asarray(idx), jnp.asarray(valid))
        specs[f"lv{sl}"] = (P(ay, ax, None), P(ay, ax, None))
    return own, specs


def spatial_flow_tiled(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cfg: DISConfig,
    mesh: Mesh,
    axes: Tuple[str, str] = ("ty", "tx"),
    max_disp: float = 8.0,
    return_diagnostics: bool = False,
) -> jnp.ndarray:
    """Flow/disparity for ONE pair spatially tiled over a 2-D (ty, tx) mesh
    with tiled level images (module-header contract: warm-start displacement
    clamped to +-max_disp in the tiled levels).

    With return_diagnostics=True, returns (flow, clamp_counts) where
    clamp_counts maps "lv<sl>" -> number of patches whose warm start was
    clamped at that level.  A nonzero count means the result deviates from
    the single-device pipeline for fast content (the max_disp contract) —
    callers should raise max_disp or fall back to spatial_flow."""
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    h, w = img1.shape[:2]
    if w % (1 << cfg.sc_f) or h % (1 << cfg.sc_f):
        raise ValueError("inputs must be padded to divisibility by 2^sc_f")
    fn, own = spatial_tiled_fn(cfg, mesh, h, w, axes=axes, max_disp=max_disp)
    flow, clamp_counts = fn(
        jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32), own
    )
    if return_diagnostics:
        return flow, clamp_counts
    return flow


def spatial_tiled_fn(
    cfg: DISConfig,
    mesh: Mesh,
    h: int,
    w: int,
    axes: Tuple[str, str] = ("ty", "tx"),
    max_disp: float = 8.0,
):
    """The bare 2-D tiled pipeline callable behind spatial_flow_tiled plus
    its static ownership tables: returns (fn, own) with
    fn(img1, img2, own) -> (flow, clamp_counts).

    Exposed (like spatial_fn) so multi-process callers can AOT-compile and
    barrier before the first cross-process collective
    (tests/dist_worker.py)."""
    ay, ax = axes
    ny, nx = mesh.shape[ay], mesh.shape[ax]
    own, specs = tile_ownership(h, w, cfg, ny, nx, max_disp, ay, ax)

    # With any tiled level, the INPUTS shard over the mesh too (each device
    # only ever reads its slice); the all-replicated fallback needs them
    # whole.
    inputs_sharded = bool(own)
    in_img = P(ay, ax, None) if inputs_sharded else P()
    fn = jax.shard_map(
        functools.partial(
            _pair_2d, cfg=cfg, ay=ay, ax=ax, max_disp=max_disp,
            inputs_sharded=inputs_sharded,
        ),
        mesh=mesh,
        in_specs=(in_img, in_img, specs),
        out_specs=(P(), {k: P() for k in own}),
        check_vma=False,
    )
    return fn, own
