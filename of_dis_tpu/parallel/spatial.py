"""Spatial sharding: one frame pair split across devices with halo exchange.

The reference's only "sequence-length" scaling is pyramid locality
(SURVEY.md §5): patch search reads a bounded window, SOR is a 5-point
stencil, derivative filters are 5-tap.  Exactly these locality structures
make spatial sharding work on a TPU mesh:

  - Patch search: the patch axis is sharded (embarrassingly parallel once
    each device holds the level images — they are small, ~2 MB at full
    Sintel resolution, so they are replicated; patch *displacements* are
    data-dependent and unbounded at init, which rules out tiling the target
    image without a displacement cap).
  - Densification: each device splats its patch shard into a full-size
    (h, w) accumulator; a single psum over the mesh axis merges tile
    borders.  Deterministic, and strictly better than the reference's racy
    OpenMP scatter (CMakeLists.txt:18-19).
  - Variational refinement: the image is tiled into column strips; every
    stencil op (5-tap/3-tap convs, weighted Laplacian, red-black SOR
    half-steps) exchanges 1-2 halo columns with its lax.ppermute neighbors
    over ICI.  Global borders keep replicate semantics via axis-index
    masking.

All of it runs under jax.shard_map on a mesh axis "tx"; the test invariant
is sharded == single-device (tests/test_spatial.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DISConfig
from ..models import refine as rf
from ..models.densify import splat_forward_scatter
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


def _refine_level_sharded(flow_strip, im1_strip, im2_full, level, cfg, axis):
    """refine_level on a column strip; im2 replicated for the warp."""
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
            if cfg.camlr == 0:
                uu = jnp.minimum(wx + du, 0.0)
            else:
                uu = jnp.maximum(wx + du, 0.0)
    if nop == 2:
        return jnp.stack([uu, vv], axis=-1)
    return uu[..., None]


# ---------------------------------------------------------------------------
# Sharded level pipeline: patch shard -> psum densify -> strip refine
# ---------------------------------------------------------------------------

def _level_manual(im_a, dx_a, dy_a, im_b, flow_prev, sl, w, h, cfg, axis):
    """One pyramid level inside a manual (shard_map) region: patch shard ->
    psum densify -> strip refinement -> all_gather.  Mirrors
    the per-device level body, callable from ANY shard_map
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
    # Splat numerics live in ONE place: models/densify.py.
    we, fo = splat_forward_scatter(res.p, res.pweight, pt_shard, w, h, cfg)
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
    flow_bw = None
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = w >> sl, h >> sl
        sharded_ok = (
            lw % ntx == 0 and lw >= 2 * ntx
            # fb-merge needs the backward search + fb-weighted densify,
            # which _level_manual does not implement; run the exact
            # replicated pipeline instead of silently diverging from
            # dis_flow (round-1 advisor finding).
            and not cfg.use_fb_merge
        )
        if sharded_ok:
            flow = _level_manual(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], flow, sl, lw, lh, cfg, axis
            )
        else:
            raw1 = im1s[sl][pad:-pad, pad:-pad]
            raw2 = im2s[sl][pad:-pad, pad:-pad]
            flow, flow_bw = _level_flow(
                im1s[sl], dx1s[sl], dy1s[sl], im2s[sl], dx2s[sl], dy2s[sl],
                flow, flow_bw, sl, lw, lh, cfg, raw1, raw2,
            )
    return flow


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
    fn = jax.shard_map(
        functools.partial(_pair_manual, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32))
