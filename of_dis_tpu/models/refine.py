"""Variational (TV) refinement — DIS step 5.

TPU-native redesign of VarRefClass (refine_variational.cpp) over the
FDF1.0.1 C kernels (opticalflow_aux.c, solver.c).  Everything is expressed
as dense XLA ops on the (h, w[, C]) level arrays — no stride-padded buffers,
no SSE shuffles:

  - bilinear backward warp + validity mask        (opticalflow_aux.c:16-60)
  - 5-tap derivative filter {1,-8,0,8,-1}/12 and 3-tap flow derivative
    {-0.5,0,0.5}, replicate borders               (refine_variational.cpp:45-48,
                                                   image.c convolve_* fast paths)
  - TV diffusivity + neighbor-sum edge weights    (opticalflow_aux.c:119-165)
  - data term (color + gradient constancy, lagged diffusivity, datanorm=0.01,
    eps=1e-6, x3 single-channel compensation)     (opticalflow_aux.c:306-548)
  - weighted-Laplacian RHS update                 (opticalflow_aux.c:171-199)
  - RED-BLACK SOR instead of the reference's sequential (or racy row-parallel)
    Gauss-Seidel sweep (solver.c:19-72 is the numeric spec; solver.c:24
    documents that the reference itself tolerates sweep-order nondeterminism).
    Red-black is deterministic and data-parallel; convergence behavior is
    equivalent up to sweep ordering.

Inner-iteration count scales with pyramid level: n_inner = tv_innerit *
(level+1) (refine_variational.cpp:36).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DISConfig

DATANORM = 0.1 * 0.1          # opticalflow_aux.c:10
EPS_COLOR = 0.001 * 0.001     # opticalflow_aux.c:11
EPS_GRAD = 0.001 * 0.001
EPS_SMOOTH = 0.001 * 0.001


# ---------------------------------------------------------------------------
# Shifts with zero fill (borders carry zero weights by construction)
# ---------------------------------------------------------------------------

def _up(x):     # x[j-1, i]
    return jnp.pad(x[:-1], ((1, 0),) + ((0, 0),) * (x.ndim - 1))


def _down(x):   # x[j+1, i]
    return jnp.pad(x[1:], ((0, 1),) + ((0, 0),) * (x.ndim - 1))


def _left(x):   # x[j, i-1]
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2))


def _right(x):  # x[j, i+1]
    return jnp.pad(x[:, 1:], ((0, 0), (0, 1)) + ((0, 0),) * (x.ndim - 2))


# ---------------------------------------------------------------------------
# Convolutions (replicate borders, matching the FDF fast paths)
# ---------------------------------------------------------------------------

def _conv_h(img: jnp.ndarray, coeffs) -> jnp.ndarray:
    """Horizontal 1-D convolution dst[x] = sum_k c[k] src[x+k-r], replicate."""
    r = len(coeffs) // 2
    p = jnp.pad(img, ((0, 0), (r, r)) + ((0, 0),) * (img.ndim - 2), mode="edge")
    w = img.shape[1]
    out = jnp.zeros_like(img)
    for k, c in enumerate(coeffs):
        if c != 0.0:
            out = out + c * p[:, k : k + w]
    return out


def _conv_v(img: jnp.ndarray, coeffs) -> jnp.ndarray:
    r = len(coeffs) // 2
    p = jnp.pad(img, ((r, r), (0, 0)) + ((0, 0),) * (img.ndim - 2), mode="edge")
    h = img.shape[0]
    out = jnp.zeros_like(img)
    for k, c in enumerate(coeffs):
        if c != 0.0:
            out = out + c * p[k : k + h]
    return out


# {1, -8, 0, 8, -1}/12 — from convolution_new(2, {0,-8/12,1/12}, 0)
# (refine_variational.cpp:45-46 + image.c convolve_extract_coeffs).
DERIV5 = (1.0 / 12.0, -8.0 / 12.0, 0.0, 8.0 / 12.0, -1.0 / 12.0)
# {-0.5, 0, 0.5} — from convolution_new(1, {0,-0.5}, 0)
# (refine_variational.cpp:47-48).
DERIV3 = (-0.5, 0.0, 0.5)


# ---------------------------------------------------------------------------
# Warp + derivatives
# ---------------------------------------------------------------------------

# Use the gather-free matmul warp while its vertical-phase FLOPs
# (2 * h*w * h*w * C) stay under this budget; element gathers cost ~10 ns/el
# on TPU so the MXU path wins up to ~3e10 FLOPs (a 224x512 level: 26 GFLOP
# matmul ~5 ms vs ~20 ms gather at batch 4).
WARP_MATMUL_MAX_FLOPS = int(os.environ.get("OF_DIS_WARP_MATMUL_MAX_FLOPS", 30_000_000_000))


def _warp_coords(src, wx, wy):
    h, w, _ = src.shape
    jj, ii = jnp.mgrid[0:h, 0:w]
    xx = ii.astype(jnp.float32) + wx
    yy = jj.astype(jnp.float32) + wy
    x = jnp.floor(xx)
    y = jnp.floor(yy)
    mask = (
        (xx >= 0.0) & (xx <= w - 1.0) & (yy >= 0.0) & (yy <= h - 1.0)
    ).astype(jnp.float32)
    x1 = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    x2 = jnp.clip(x.astype(jnp.int32) + 1, 0, w - 1)
    y1 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    y2 = jnp.clip(y.astype(jnp.int32) + 1, 0, h - 1)
    return (xx - x), (yy - y), x1, x2, y1, y2, mask


def image_warp(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray):
    """Bilinear backward warp with clamp-to-edge taps and in-bounds mask
    (image_warp, opticalflow_aux.c:16-60).  src (h, w, C); wx, wy (h, w).

    Small levels: gather-free.  Bilinear weights separate per axis, so the
    warp is (1) a per-pixel two-hot row-interpolation ver[ji, l] =
    (1-dy)*src[y1,l] + dy*src[y2,l] for ALL columns l — one (h*w, h) @
    (h, w*C) MXU matmul — then (2) a horizontal two-hot reduce picking
    columns x1/x2.  Large levels fall back to the 4-tap element gather.
    """
    h, w, c = src.shape
    dx, dy, x1, x2, y1, y2, mask = _warp_coords(src, wx, wy)
    dx = dx[..., None]
    dy = dy[..., None]

    if 2 * (h * w) * (h * w) * c <= WARP_MATMUL_MAX_FLOPS:
        ks = jnp.arange(h, dtype=jnp.int32)[None, :]
        y1f = y1.reshape(-1, 1)
        y2f = y2.reshape(-1, 1)
        R = jnp.where(ks == y1f, 1.0 - dy.reshape(-1, 1), 0.0) + jnp.where(
            ks == y2f, dy.reshape(-1, 1), 0.0
        )  # (h*w, h)
        ver = jnp.dot(
            R, src.reshape(h, w * c), preferred_element_type=jnp.float32
        ).reshape(h, w, w, c)  # [j, i, l, c] vertically interpolated columns
        ls = jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
        Hsel = jnp.where(ls == x1[..., None, None], 1.0 - dx[:, :, None], 0.0) + jnp.where(
            ls == x2[..., None, None], dx[:, :, None], 0.0
        )  # (h, w, l, 1)
        dst = jnp.sum(ver * Hsel, axis=2)
        return dst, mask

    flat = src.reshape(-1, c)
    # One fused gather for all 4 taps (each jnp.take pays a fixed
    # latency-bound cost on TPU; 4 separate calls quadruple it).
    idx = jnp.stack([y1 * w + x1, y1 * w + x2, y2 * w + x1, y2 * w + x2])
    taps = jnp.take(flat, idx, axis=0)  # (4, h, w, C)
    dst = (
        taps[0] * (1 - dx) * (1 - dy)
        + taps[1] * dx * (1 - dy)
        + taps[2] * (1 - dx) * dy
        + taps[3] * dx * dy
    )
    return dst, mask


def get_derivatives(im1: jnp.ndarray, im2w: jnp.ndarray):
    """First/second spatio-temporal derivatives on the mean image
    (get_derivatives, opticalflow_aux.c:63-116)."""
    mean = 0.5 * (im1 + im2w)
    iz = im2w - im1
    ix = _conv_h(mean, DERIV5)
    iy = _conv_v(mean, DERIV5)
    ixx = _conv_h(ix, DERIV5)
    ixy = _conv_v(ix, DERIV5)
    iyy = _conv_v(iy, DERIV5)
    ixz = _conv_h(iz, DERIV5)
    iyz = _conv_v(iz, DERIV5)
    return ix, iy, iz, ixx, ixy, iyy, ixz, iyz


# ---------------------------------------------------------------------------
# Smoothness + RHS
# ---------------------------------------------------------------------------

def compute_smoothness(uu, vv, quarter_alpha: float):
    """TV diffusivity edge weights (compute_smoothness, opticalflow_aux.c:119-165).

    Returns (horiz, vert): horiz[j,i] couples (j,i)<->(j,i+1) (last col 0),
    vert[j,i] couples (j,i)<->(j+1,i) (last row 0)."""
    ux = _conv_h(uu, DERIV3)
    uy = _conv_v(uu, DERIV3)
    vx = _conv_h(vv, DERIV3)
    vy = _conv_v(vv, DERIV3)
    s = quarter_alpha / jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy + EPS_SMOOTH)
    horiz = s + _right(s)
    horiz = horiz.at[:, -1].set(0.0)
    vert = s + _down(s)
    vert = vert.at[-1, :].set(0.0)
    return horiz, vert


def sub_laplacian(b, src, wh, wv):
    """b += div(w * grad(src)) (sub_laplacian, opticalflow_aux.c:171-199)."""
    th = wh * (_right(src) - src)   # zero at last col since wh there is 0
    tv = wv * (_down(src) - src)
    return b + th - _left(th) + tv - _up(tv)


# ---------------------------------------------------------------------------
# Data term
# ---------------------------------------------------------------------------

def compute_data(
    du, dv, mask, derivs, half_delta_over3: float, half_gamma_over3: float, nop: int
):
    """Per-pixel system (a11, a12, a22, b1, b2) — compute_data
    (opticalflow_aux.c:306-438) and compute_data_DE (:442-548, nop == 1,
    where dv contributions vanish and only a11/b1 are kept).

    derivs arrays are (h, w, C); du/dv/mask (h, w)."""
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = derivs
    c = ix.shape[-1]
    du3 = du[..., None]
    dv3 = dv[..., None] if nop == 2 else None
    m = mask[..., None]
    z = jnp.zeros_like(du)
    a11, a12, a22, b1, b2 = z, z, z, z, z

    # --- color constancy ---
    if half_delta_over3:
        t = iz + ix * du3 + (iy * dv3 if nop == 2 else 0.0)
        n = ix * ix + iy * iy + DATANORM
        if c == 1:
            denom = jnp.sqrt(3.0 * t * t / n + EPS_COLOR)
        else:
            denom = jnp.sqrt(jnp.sum(t * t / n, axis=-1, keepdims=True) + EPS_COLOR)
        coef = (m * half_delta_over3 / denom) / n  # (h, w, C)
        a11 = a11 + jnp.sum(coef * ix * ix, axis=-1)
        b1 = b1 - jnp.sum(coef * iz * ix, axis=-1)
        if nop == 2:
            a12 = a12 + jnp.sum(coef * ix * iy, axis=-1)
            a22 = a22 + jnp.sum(coef * iy * iy, axis=-1)
            b2 = b2 - jnp.sum(coef * iz * iy, axis=-1)

    # --- gradient constancy ---
    n1 = ixx * ixx + ixy * ixy + DATANORM
    n2 = iyy * iyy + ixy * ixy + DATANORM
    t1 = ixz + ixx * du3 + (ixy * dv3 if nop == 2 else 0.0)
    t2 = iyz + ixy * du3 + (iyy * dv3 if nop == 2 else 0.0)
    if c == 1:
        denom = jnp.sqrt(3.0 * t1 * t1 / n1 + 3.0 * t2 * t2 / n2 + EPS_GRAD)
    else:
        denom = jnp.sqrt(
            jnp.sum(t1 * t1 / n1 + t2 * t2 / n2, axis=-1, keepdims=True) + EPS_GRAD
        )
    t = m * half_gamma_over3 / denom
    c1 = t / n1
    c2 = t / n2
    a11 = a11 + jnp.sum(c1 * ixx * ixx + c2 * ixy * ixy, axis=-1)
    b1 = b1 - jnp.sum(c1 * ixx * ixz + c2 * ixy * iyz, axis=-1)
    if nop == 2:
        a12 = a12 + jnp.sum(c1 * ixx * ixy + c2 * ixy * iyy, axis=-1)
        a22 = a22 + jnp.sum(c2 * iyy * iyy + c1 * ixy * ixy, axis=-1)
        b2 = b2 - jnp.sum(c2 * iyy * iyz + c1 * ixy * ixz, axis=-1)

    if c == 1:
        # x3 so smoothing weights match the RGB path (opticalflow_aux.c:420-427).
        a11, a12, a22, b1, b2 = 3 * a11, 3 * a12, 3 * a22, 3 * b1, 3 * b2
    return a11, a12, a22, b1, b2


# ---------------------------------------------------------------------------
# Red-black SOR
# ---------------------------------------------------------------------------

def _checkerboard(h: int, w: int) -> jnp.ndarray:
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((ii + jj) % 2 == 0)


def sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv, iterations: int, omega: float):
    """Coupled red-black SOR on the 5-point system (numeric spec:
    sor_coupled_slow_but_readable, solver.c:19-72).  Within a color, du is
    updated first and dv uses the NEW du, exactly like the reference."""
    h, w = du.shape
    red = _checkerboard(h, w)
    sum_dpsis = _up(wv) + _left(wh) + wv + wh
    A11 = a11 + sum_dpsis
    A22 = a22 + sum_dpsis

    def nb(x):
        return _up(wv * x) + _left(wh * x) + wv * _down(x) + wh * _right(x)

    def half_step(du, dv, color_mask):
        B1 = b1 + nb(du)
        du_new = (1.0 - omega) * du + (omega / A11) * (B1 - a12 * dv)
        du = jnp.where(color_mask, du_new, du)
        B2 = b2 + nb(dv)
        dv_new = (1.0 - omega) * dv + (omega / A22) * (B2 - a12 * du)
        dv = jnp.where(color_mask, dv_new, dv)
        return du, dv

    def body(_, carry):
        du, dv = carry
        du, dv = half_step(du, dv, red)
        du, dv = half_step(du, dv, ~red)
        return du, dv

    return jax.lax.fori_loop(0, iterations, body, (du, dv))


def sor_scalar_rb(du, a11, b1, wh, wv, iterations: int, omega: float):
    """Scalar red-black SOR (spec: sor_coupled_slow_but_readable_DE,
    solver.c:428-466)."""
    h, w = du.shape
    red = _checkerboard(h, w)
    A11 = a11 + _up(wv) + _left(wh) + wv + wh

    def nb(x):
        return _up(wv * x) + _left(wh * x) + wv * _down(x) + wh * _right(x)

    def half_step(du, color_mask):
        B1 = b1 + nb(du)
        du_new = (1.0 - omega) * du + omega * B1 / A11
        return jnp.where(color_mask, du_new, du)

    def body(_, du):
        du = half_step(du, red)
        du = half_step(du, ~red)
        return du

    return jax.lax.fori_loop(0, iterations, body, du)


# ---------------------------------------------------------------------------
# Level driver
# ---------------------------------------------------------------------------

# Use the fused Pallas SOR kernel when the level fits in VMEM (set to 0 to
# force the XLA red-black path, e.g. for A/B testing).  The fused inner
# kernel keeps ~25 (h, w) f32 buffers live; with the kernel's raised
# vmem_limit_bytes (100 MB of the v5e's 128 MB VMEM) the whole op4 finest
# level (448x1024 = 459k px, measured ~15 ms/call) compiles and runs fused.
# Levels beyond ~semi-HD fall back to the XLA red-black path.
PALLAS_SOR_MAX_PIXELS = int(os.environ.get("OF_DIS_PALLAS_SOR_MAX_PIXELS", 470_000))


def _use_pallas_sor(arr) -> bool:
    return 0 < arr.shape[0] * arr.shape[1] <= PALLAS_SOR_MAX_PIXELS

def refine_level(
    flow: jnp.ndarray,   # (h, w, nop)
    im1: jnp.ndarray,    # (h, w, C) unpadded level image
    im2: jnp.ndarray,
    level: int,
    cfg: DISConfig,
    camlr: int = 0,
) -> jnp.ndarray:
    """One scale of variational refinement (RefLevelOF / RefLevelDE,
    refine_variational.cpp:152-336)."""
    nop = cfg.nop
    n_inner = cfg.tv_innerit * (level + 1)   # refine_variational.cpp:36
    qa = 0.25 * cfg.tv_alpha
    hd3 = cfg.tv_delta * 0.5 / 3.0
    hg3 = cfg.tv_gamma * 0.5 / 3.0

    wx = flow[..., 0]
    wy = flow[..., 1] if nop == 2 else jnp.zeros_like(wx)

    im2w, mask = image_warp(im2, wx, wy)
    derivs = get_derivatives(im1, im2w)

    if nop == 2 and _use_pallas_sor(wx):
        # Whole inner loop fused in one Pallas kernel (ops/pallas_kernels.py).
        from ..ops.pallas_kernels import refine_inner_pallas

        uu, vv = refine_inner_pallas(
            wx, wy, mask, derivs, n_inner, cfg.tv_solverit, cfg.tv_sor, qa, hd3, hg3
        )
        return jnp.stack([uu, vv], axis=-1)

    du = jnp.zeros_like(wx)
    dv = jnp.zeros_like(wx)
    uu = wx
    vv = wy

    for _ in range(n_inner):
        wh, wv_ = compute_smoothness(uu, vv, qa)
        a11, a12, a22, b1, b2 = compute_data(du, dv, mask, derivs, hd3, hg3, nop)
        b1 = sub_laplacian(b1, wx, wh, wv_)
        if nop == 2:
            b2 = sub_laplacian(b2, wy, wh, wv_)
            if _use_pallas_sor(wx):
                from ..ops.pallas_kernels import sor_coupled_rb_pallas

                du, dv = sor_coupled_rb_pallas(
                    du, dv, a11, a12, a22, b1, b2, wh, wv_, cfg.tv_solverit, cfg.tv_sor
                )
            else:
                du, dv = sor_coupled_rb(
                    du, dv, a11, a12, a22, b1, b2, wh, wv_, cfg.tv_solverit, cfg.tv_sor
                )
            uu = wx + du
            vv = wy + dv
        else:
            if _use_pallas_sor(wx):
                from ..ops.pallas_kernels import sor_scalar_rb_pallas

                du = sor_scalar_rb_pallas(du, a11, b1, wh, wv_, cfg.tv_solverit, cfg.tv_sor)
            else:
                du = sor_scalar_rb(du, a11, b1, wh, wv_, cfg.tv_solverit, cfg.tv_sor)
            # Disparity sign clamp (refine_variational.cpp:299-314).
            if camlr == 0:
                uu = jnp.minimum(wx + du, 0.0)
            else:
                uu = jnp.maximum(wx + du, 0.0)

    if nop == 2:
        return jnp.stack([uu, vv], axis=-1)
    return uu[..., None]
