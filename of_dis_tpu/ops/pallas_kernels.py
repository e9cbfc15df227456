"""Pallas TPU kernels for the refinement hot loop.

The red-black SOR sweep is a chain of hundreds of tiny dependent elementwise
XLA kernels (each half-step is ~6 ops on a small level array); kernel-launch
overhead dominates.  This module fuses the whole `iterations x 2-color`
relaxation into ONE Pallas kernel with every operand resident in VMEM —
the level arrays are far below the 16 MB VMEM budget for all pyramid levels
of Sintel-sized inputs.

Numerics match models/refine.py::sor_coupled_rb exactly (same update
order: du first, dv with the new du, red then black).  Falls back to the
XLA implementation when the working set would not fit in VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 9 (h, w) f32 operands + working copies must fit in VMEM (~16 MB/core).
SOR_PALLAS_MAX_PIXELS = 200_000

# The refinement-family kernels hold the whole level in VMEM; let Mosaic use
# most of the v5e's 128 MB physical VMEM instead of the 16 MB default scoped
# limit (measured: the full op4 finest level, 448x1024, compiles and runs).
_SOR_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _shifts(h, w):
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def up(x):    # x[j-1, i], zero row 0
        return jnp.where(jj == 0, 0.0, pltpu.roll(x, 1, 0))

    def down(x):  # x[j+1, i], zero last row
        return jnp.where(jj == h - 1, 0.0, pltpu.roll(x, h - 1, 0))

    def left(x):  # x[j, i-1], zero col 0
        return jnp.where(ii == 0, 0.0, pltpu.roll(x, 1, 1))

    def right(x):  # x[j, i+1], zero last col
        return jnp.where(ii == w - 1, 0.0, pltpu.roll(x, w - 1, 1))

    red = ((ii + jj) % 2) == 0
    return up, down, left, right, red


def _sor_coupled_kernel(
    du_ref, dv_ref, a11_ref, a12_ref, a22_ref, b1_ref, b2_ref, wh_ref, wv_ref,
    duo_ref, dvo_ref, *, iterations: int, omega: float,
):
    h, w = du_ref.shape
    up, down, left, right, red = _shifts(h, w)
    wh = wh_ref[:]
    wv = wv_ref[:]
    a12 = a12_ref[:]
    b1 = b1_ref[:]
    b2 = b2_ref[:]
    sum_dpsis = up(wv) + left(wh) + wv + wh
    A11 = a11_ref[:] + sum_dpsis
    A22 = a22_ref[:] + sum_dpsis
    inv11 = omega / A11
    inv22 = omega / A22

    def nb(x):
        return up(wv * x) + left(wh * x) + wv * down(x) + wh * right(x)

    def half(color, du, dv):
        B1 = b1 + nb(du)
        du = jnp.where(color, (1.0 - omega) * du + inv11 * (B1 - a12 * dv), du)
        B2 = b2 + nb(dv)
        dv = jnp.where(color, (1.0 - omega) * dv + inv22 * (B2 - a12 * du), dv)
        return du, dv

    def body(_, c):
        du, dv = c
        du, dv = half(red, du, dv)
        du, dv = half(~red, du, dv)
        return du, dv

    du, dv = jax.lax.fori_loop(0, iterations, body, (du_ref[:], dv_ref[:]))
    duo_ref[:] = du
    dvo_ref[:] = dv


def sor_coupled_rb_pallas(du, dv, a11, a12, a22, b1, b2, wh, wv,
                          iterations: int, omega: float):
    h, w = du.shape
    kernel = functools.partial(
        _sor_coupled_kernel, iterations=iterations, omega=float(omega)
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=_SOR_VMEM_LIMIT,
        interpret=_interpret(),
    )(du, dv, a11, a12, a22, b1, b2, wh, wv)


def _shifts_rep(h, w):
    """Replicate-edge shifts (conv border semantics)."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def up(x):
        return jnp.where(jj == 0, x, pltpu.roll(x, 1, x.ndim - 2))

    def down(x):
        return jnp.where(jj == h - 1, x, pltpu.roll(x, h - 1, x.ndim - 2))

    def left(x):
        return jnp.where(ii == 0, x, pltpu.roll(x, 1, x.ndim - 1))

    def right(x):
        return jnp.where(ii == w - 1, x, pltpu.roll(x, w - 1, x.ndim - 1))

    return up, down, left, right


DATANORM = 0.1 * 0.1
EPS_COLOR = 0.001 * 0.001
EPS_GRAD = 0.001 * 0.001
EPS_SMOOTH = 0.001 * 0.001


def _refine_inner_kernel(
    wx_ref, wy_ref, mask_ref,
    ix_ref, iy_ref, iz_ref, ixx_ref, ixy_ref, iyy_ref, ixz_ref, iyz_ref,
    uu_ref, vv_ref,
    *, n_inner: int, solver_it: int, omega: float,
    qa: float, hd3: float, hg3: float,
):
    """The full RefLevelOF inner fixed-point loop
    (refine_variational.cpp:192-218) as ONE kernel: smoothness -> data term
    -> weighted-Laplacian RHS -> red-black SOR -> flow update, iterated
    n_inner times with all state in VMEM.

    Derivative inputs are (C, h, w); flow fields (h, w).
    """
    c, h, w = ix_ref.shape
    upz, downz, leftz, rightz, red = _shifts(h, w)
    upr, downr, leftr, rightr = _shifts_rep(h, w)

    wx = wx_ref[:]
    wy = wy_ref[:]
    mask = mask_ref[:]
    ix = ix_ref[:]; iy = iy_ref[:]; iz = iz_ref[:]
    ixx = ixx_ref[:]; ixy = ixy_ref[:]; iyy = iyy_ref[:]
    ixz = ixz_ref[:]; iyz = iyz_ref[:]

    n1g = ixx * ixx + ixy * ixy + DATANORM
    n2g = iyy * iyy + ixy * ixy + DATANORM
    nc = ix * ix + iy * iy + DATANORM

    def csum(x):
        return jnp.sum(x, axis=0)

    def inner(_, state):
        uu, vv, du, dv = state
        # --- smoothness (opticalflow_aux.c:119-165) ---
        ux = 0.5 * (rightr(uu) - leftr(uu))
        uy = 0.5 * (downr(uu) - upr(uu))
        vx = 0.5 * (rightr(vv) - leftr(vv))
        vy = 0.5 * (downr(vv) - upr(vv))
        s = qa / jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy + EPS_SMOOTH)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        wh = jnp.where(ii2 == w - 1, 0.0, s + pltpu.roll(s, w - 1, 1))
        wv = jnp.where(jj2 == h - 1, 0.0, s + pltpu.roll(s, h - 1, 0))

        # --- data term (opticalflow_aux.c:306-438) ---
        t = iz + ix * du + iy * dv
        if c == 1:
            denc = jnp.sqrt(3.0 * t * t / nc + EPS_COLOR)
        else:
            denc = jnp.sqrt(csum(t * t / nc)[None] + EPS_COLOR)
        coefc = (mask * hd3 / denc) / nc
        a11 = csum(coefc * ix * ix)
        a12 = csum(coefc * ix * iy)
        a22 = csum(coefc * iy * iy)
        b1 = -csum(coefc * iz * ix)
        b2 = -csum(coefc * iz * iy)

        t1 = ixz + ixx * du + ixy * dv
        t2 = iyz + ixy * du + iyy * dv
        if c == 1:
            deng = jnp.sqrt(3.0 * t1 * t1 / n1g + 3.0 * t2 * t2 / n2g + EPS_GRAD)
        else:
            deng = jnp.sqrt(csum(t1 * t1 / n1g + t2 * t2 / n2g)[None] + EPS_GRAD)
        tg = mask * hg3 / deng
        c1 = tg / n1g
        c2 = tg / n2g
        a11 = a11 + csum(c1 * ixx * ixx + c2 * ixy * ixy)
        a12 = a12 + csum(c1 * ixx * ixy + c2 * ixy * iyy)
        a22 = a22 + csum(c2 * iyy * iyy + c1 * ixy * ixy)
        b1 = b1 - csum(c1 * ixx * ixz + c2 * ixy * iyz)
        b2 = b2 - csum(c2 * iyy * iyz + c1 * ixy * ixz)
        if c == 1:
            a11, a12, a22, b1, b2 = 3 * a11, 3 * a12, 3 * a22, 3 * b1, 3 * b2

        # --- weighted Laplacian RHS (opticalflow_aux.c:171-199) ---
        def sub_lap(b, src):
            th = wh * (rightz(src) - src)
            tv = wv * (downz(src) - src)
            return b + th - leftz(th) + tv - upz(tv)

        b1 = sub_lap(b1, wx)
        b2 = sub_lap(b2, wy)

        # --- red-black SOR (solver.c:19-72 spec) ---
        sum_dpsis = upz(wv) + leftz(wh) + wv + wh
        A11 = a11 + sum_dpsis
        A22 = a22 + sum_dpsis
        inv11 = omega / A11
        inv22 = omega / A22

        def nb(x):
            return upz(wv * x) + leftz(wh * x) + wv * downz(x) + wh * rightz(x)

        def half(color, du, dv):
            B1 = b1 + nb(du)
            du = jnp.where(color, (1.0 - omega) * du + inv11 * (B1 - a12 * dv), du)
            B2 = b2 + nb(dv)
            dv = jnp.where(color, (1.0 - omega) * dv + inv22 * (B2 - a12 * du), dv)
            return du, dv

        def sor_body(_, cst):
            du, dv = cst
            du, dv = half(red, du, dv)
            du, dv = half(~red, du, dv)
            return du, dv

        du, dv = jax.lax.fori_loop(0, solver_it, sor_body, (du, dv))
        return wx + du, wy + dv, du, dv

    uu0 = wx
    vv0 = wy
    du0 = jnp.zeros_like(wx)
    dv0 = jnp.zeros_like(wx)
    uu, vv, _, _ = jax.lax.fori_loop(0, n_inner, inner, (uu0, vv0, du0, dv0))
    uu_ref[:] = uu
    vv_ref[:] = vv


def refine_inner_pallas(wx, wy, mask, derivs, n_inner, solver_it, omega, qa, hd3, hg3):
    """Run the whole inner refinement loop in one Pallas kernel.

    wx, wy, mask: (h, w); derivs: 8-tuple of (h, w, C) arrays (transposed to
    (C, h, w) internally).  Returns (uu, vv).
    """
    h, w = wx.shape
    dv = [jnp.transpose(d, (2, 0, 1)) for d in derivs]
    kernel = functools.partial(
        _refine_inner_kernel,
        n_inner=int(n_inner), solver_it=int(solver_it), omega=float(omega),
        qa=float(qa), hd3=float(hd3), hg3=float(hg3),
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=_SOR_VMEM_LIMIT,
        interpret=_interpret(),
    )(wx, wy, mask, *dv)


# ---------------------------------------------------------------------------
# Fused inverse-compositional Gauss-Newton search (models/inverse_search.py)
# ---------------------------------------------------------------------------

def _band_fine_select(win, bx, sx: int):
    """Fine column select from the coarse 64-wide band (gather_windows_rows
    return_band=True contract: window n starts at band column bx_n % 32).
    8-aligned block (4 offsets) then fine (8 offsets) — 12 slice-FMA steps
    instead of XLA's 64-way one-hot reduce.  win's leading axis is the band
    (64); bx's dims are win's trailing lane dims ((1, N) untiled /
    (PS, 128) tiled).  Returns win[loc : loc + sx] per lane."""
    f32 = jnp.float32
    nd = win.ndim - bx.ndim  # broadcast rank between bx and the band dims

    def bcast(m):
        return m.reshape((1,) * nd + m.shape)

    loc = bx - (bx // 32) * 32            # in [0, 32)
    b8 = loc // 8
    w2 = sx + 8
    bandm = jnp.zeros((w2,) + win.shape[1:], f32)
    for k in range(4):
        m = bcast(jnp.where(b8 == k, 1.0, 0.0))
        bandm = bandm + m * win[8 * k : 8 * k + w2]
    bxf = loc - 8 * b8                    # [0, 8)
    out = jnp.zeros((sx,) + win.shape[1:], f32)
    for k in range(8):
        m = bcast(jnp.where(bxf == k, 1.0, 0.0))
        out = out + m * bandm[k : k + sx]
    return out


def _gn_machine(
    win, T, DX, DY, hes3, ptref, p_in, by, bx,
    *,
    psz: int, sy: int, sx: int, nop: int, c: int, pad: int,
    w: int, h: int, max_iter: int, min_iter: int,
    cost: int, patch_norm: bool, normoutlier: float,
    dp_thresh_sq: float, dr_thresh: float, res_thresh: float,
    outlier_sq: float, stereo_clamp: int,  # -1 none, 0 min(p,0), 1 max(p,0)
    band_select: bool = False,
):
    """The whole per-level GN state machine on VMEM-resident VALUES:
    per-iteration window extraction, loss, 2x2 solve, outlier resets and the
    reference's convergence predicate (patch.cpp:119-284).  Semantics
    identical to optimize_level's XLA loop.  Shared by _gn_kernel (windows
    gathered by XLA) and _level_kernel (windows built in-kernel).

    Extraction is a roll-blend + block-select (cheaper than the XLA two-hot):
    bilinear weights separate per axis, so first blend the WHOLE window
    vertically with the per-patch fraction ry against its roll-by-one copy
    (2 FMA/window element; the rolled copy is iteration-invariant and
    hoisted), then select the psz-row block at integer offset oy with a
    one-hot mask over the sy-psz possible offsets (static sublane slices).
    Repeat along x.  Patch-pixel tensors are laid out (psz_i, C, psz_j, N)
    so the horizontal block-select lands in the output layout directly.

    Shapes: win (sx, C, sy, N); T/DX/DY (psz_i, C, psz_j, N); hes3 (3, N);
    ptref (2, N); p_in (nop, N); by/bx (1, N) int32.
    Returns (p (nop,N), pt (2,N), pweight (psz_i,C,psz_j,N), conv (1,N) i32).
    """
    f32 = jnp.float32
    n = ptref.shape[1]
    lb = -(psz // 2)
    novals = float(c * psz * psz)

    if band_select:
        win = _band_fine_select(win, bx, sx)

    win_dn = pltpu.roll(win, sy - 1, 2)   # win[., ., k+1, .] (wrap row unused)
    h00 = hes3[0:1, :]
    h01 = hes3[1:2, :]
    h11 = hes3[2:3, :]
    det = h00 * h11 - h01 * h01

    def csum(x):  # (psz_i, C, psz_j, N) -> (1, N)
        # Reduction-tree note: this cannot be bit-identical to the XLA
        # path's jnp.sum (different compilers reassociate differently), so
        # few-ULP divergence between the Pallas and XLA paths is expected;
        # on chaotic high-gradient patches that flips equally-valid GN
        # trajectories (see tests/test_golden.py textured cases).
        return jnp.sum(x.reshape(psz * c * psz, n), axis=0, keepdims=True)

    def param_to_pt(p):
        if nop == 2:
            return ptref + p
        return jnp.concatenate([ptref[0:1] + p[0:1], ptref[1:2]], axis=0)

    def oob(pt):
        lbf = -float(psz) / 2.0
        return (
            (pt[0:1] < lbf) | (pt[1:2] < lbf)
            | (pt[0:1] > float(w + psz // 2 - 2))
            | (pt[1:2] > float(h + psz // 2 - 2))
        )

    def extract(pt):
        fy = jnp.floor(pt[1:2])
        fx = jnp.floor(pt[0:1])
        ry = pt[1:2] - fy   # (1, N)
        rx = pt[0:1] - fx
        oy = fy.astype(jnp.int32) + lb + pad - by   # in [0, sy-psz-1]
        ox = fx.astype(jnp.int32) + lb + pad - bx
        # vertical: blend whole window, then one-hot block-select psz rows
        wbv = (1.0 - ry)[None, None] * win + ry[None, None] * win_dn
        rows = jnp.zeros((sx, c, psz, n), f32)
        for s in range(sy - psz):
            m = jnp.where(oy == s, 1.0, 0.0)
            rows = rows + m[None, None] * wbv[:, :, s : s + psz, :]
        # horizontal: same along the leading (sx) axis
        rows_dn = pltpu.roll(rows, sx - 1, 0)
        rowsb = (1.0 - rx)[None, None] * rows + rx[None, None] * rows_dn
        out = jnp.zeros((psz, c, psz, n), f32)
        for s in range(sx - psz):
            m = jnp.where(ox == s, 1.0, 0.0)
            out = out + m[None, None] * rowsb[s : s + psz]
        return out

    def loss(diff):
        if cost == 0:
            pd = diff
        elif cost == 1:
            pd = jnp.sign(diff) * jnp.sqrt(jnp.abs(diff))
        elif cost == 2:
            bsq = normoutlier * normoutlier
            pd = jnp.sign(diff) * jnp.sqrt(
                2.0 * bsq * (jnp.sqrt(1.0 + diff * diff / bsq) - 1.0)
            )
        else:
            pd = diff
        return pd, jnp.abs(pd)

    def residual(pt):
        raw = extract(pt)
        if patch_norm:
            raw = raw - (csum(raw) / novals)[None, None]
        if cost == 10:
            tn = jnp.sqrt(csum(T * T))[None, None]
            rn = jnp.sqrt(csum(raw * raw))[None, None]
            diff = raw * (tn / jnp.maximum(rn, 1e-10)) - T
            return diff, jnp.abs(diff)
        return loss(raw - T)

    tmpl_pd, tmpl_pw = (T, jnp.abs(T)) if cost == 10 else loss(T)

    pt_st = param_to_pt(p_in)
    oob0 = oob(pt_st)  # (1, N) bool

    # Loop-carry inits must have CONCRETE (non-replicated) layouts: Mosaic
    # assigns splat constants a replicated layout, and the body's select_n
    # results cannot relayout back into it ("invalid relayout").  The iota
    # term forces a concrete layout; it is numerically zero.
    # 0.0 * <input> is not constant-foldable for floats (NaN semantics),
    # so these zeros keep a concrete vector layout.
    zf = ptref[0:1] * 0.0
    zi = zf.astype(jnp.int32)
    state = (
        p_in,                                   # p_iter
        pt_st,                                  # pt_iter
        jnp.zeros((psz, c, psz, n), f32),       # pdiff
        jnp.zeros((psz, c, psz, n), f32),       # pweight
        zf + 1e5,                               # mares
        zf + 1e5,                               # mares_old
        zf + 1e-10,                             # dpsq
        zf + 1e-10,                             # dpsq_init
        zi,                                     # cnt
        zi,                                     # converged (0/1 int32; Mosaic
        # cannot select_n on bool loop carries)
    )

    def body(i, state):
        (p_iter, pt_iter, pdiff, pweight, mares, mares_old,
         dpsq, dpsq_init, cnt, converged) = state
        # Vector-shaped predicate: Mosaic miscompiles chains of selects on a
        # scalar predicate ("invalid relayout" on the replicated constant).
        first = (jnp.zeros((1, n), jnp.int32) + i) == 0
        active = converged == 0
        cnt_n = jnp.where(first, 0, cnt + 1)

        b0 = csum(DX * pdiff)
        if nop == 2:
            b1 = csum(DY * pdiff)
            du = (h11 * b0 - h01 * b1) / det
            dv = (h00 * b1 - h01 * b0) / det
            delta_p = jnp.concatenate([du, dv], axis=0)
        else:
            delta_p = b0 / h00
        delta_p = jnp.where(first, 0.0, delta_p)
        p_new = p_iter - delta_p
        if stereo_clamp == 0:
            p_new = jnp.where(first, p_new, jnp.minimum(p_new, 0.0))
        elif stereo_clamp == 1:
            p_new = jnp.where(first, p_new, jnp.maximum(p_new, 0.0))
        pt_new = param_to_pt(p_new)

        moved = (
            jnp.sum((pt_st - pt_new) ** 2, axis=0, keepdims=True) > outlier_sq
        )
        reset = jnp.logical_not(first) & (moved | oob(pt_new))
        p_new = jnp.where(reset, p_in, p_new)
        pt_new = param_to_pt(p_new)

        pd_new, pw_new = residual(pt_new)
        oob_start = first & oob0
        pd_new = jnp.where(oob_start[None, None], tmpl_pd, pd_new)
        pw_new = jnp.where(oob_start[None, None], tmpl_pw, pw_new)
        dpsq_n = jnp.where(
            first, 1e-10, jnp.sum(delta_p * delta_p, axis=0, keepdims=True)
        )
        # Arithmetic blend instead of select_n: Mosaic rejects this select
        # with an "invalid relayout" on the (1, N) operands.
        m1 = (cnt_n == 1).astype(jnp.float32)
        dpsq_init_n = m1 * dpsq_n + (1.0 - m1) * dpsq_init
        mares_old_n = jnp.where(first, 1e5, mares)
        mares_n = csum(pw_new) / novals
        mares_n = jnp.where(oob_start, 1e5, mares_n)

        keep_going = (
            (cnt_n < max_iter)
            & (mares_n > res_thresh)
            & ((cnt_n < min_iter) | (dpsq_n / dpsq_init_n >= dp_thresh_sq))
            & ((cnt_n < min_iter) | (mares_n / mares_old_n <= dr_thresh))
        )
        conv_n = ((converged != 0) | reset | ~keep_going | oob_start).astype(
            jnp.int32
        )

        am4 = active[None, None]
        return (
            jnp.where(active, p_new, p_iter),
            jnp.where(active, pt_new, pt_iter),
            jnp.where(am4, pd_new, pdiff),
            jnp.where(am4, pw_new, pweight),
            jnp.where(active, mares_n, mares),
            jnp.where(active, mares_old_n, mares_old),
            jnp.where(active, dpsq_n, dpsq),
            jnp.where(active, dpsq_init_n, dpsq_init),
            jnp.where(active, cnt_n, cnt),
            jnp.where(active, conv_n, converged),
        )

    state = jax.lax.fori_loop(0, max_iter + 1, body, state)
    p_iter, pt_iter, _, pweight, _, _, _, _, _, converged = state
    return p_iter, pt_iter, pweight, converged


def _gn_kernel(
    win_ref,    # (sx, C, sy, N) per-patch windows (patches on lanes)
    t_ref, dx_ref, dy_ref,   # (psz_i, C, psz_j, N) templates
    hes_ref,    # (3, N) [h00, h01, h11] (rows 1-2 ignored for stereo)
    ptref_ref,  # (2, N)
    pinit_ref,  # (nop, N)
    by_ref, bx_ref,          # (1, N) int32 window bases (padded coords)
    p_out, pt_out, pw_out, conv_out,
    **consts,
):
    """XLA-gathered-windows wrapper around _gn_machine (one grid step per
    patch tile; see gn_search_pallas)."""
    p, pt, pw, conv = _gn_machine(
        win_ref[:], t_ref[:], dx_ref[:], dy_ref[:], hes_ref[:],
        ptref_ref[:], pinit_ref[:], by_ref[:], bx_ref[:], **consts,
    )
    p_out[:] = p
    pt_out[:] = pt
    pw_out[:] = pw
    conv_out[:] = conv


def _gn_kernel_tiled(
    win_ref,    # (sx, C, sy, PS, 128) per-patch windows, patches on the TILE
    t_ref, dx_ref, dy_ref,   # (psz_i, C, psz_j, PS, 128) templates
    hes_ref,    # (3, PS, 128)
    ptref_ref,  # (2, PS, 128)
    pinit_ref,  # (nop, PS, 128)
    by_ref, bx_ref,          # (1, PS, 128) int32 window bases (padded coords)
    p_out, pt_out, pw_out, conv_out,
    *,
    psz: int, sy: int, sx: int, nop: int, c: int, pad: int,
    w: int, h: int, max_iter: int, min_iter: int,
    cost: int, patch_norm: bool, normoutlier: float,
    dp_thresh_sq: float, dr_thresh: float, res_thresh: float,
    outlier_sq: float, stereo_clamp: int,
    band_select: bool = False,
):
    """Big-N variant of _gn_kernel: the patch axis is reshaped (PS, 128) and
    carries the (sublane, lane) tile, so every pixel dimension is an OUTER
    dim — all block-select slices and rolls are free vector-register
    re-indexing instead of cross-sublane shifts, and tiles are fully
    utilized regardless of psz/sy (no 26->32 sublane padding on the window).
    The bilinear blend is fused into the block-select (no wbv buffer) to
    keep the working set ~10 MB at psz=12, PS=8.  Numerics identical to
    _gn_kernel up to reassociation."""
    f32 = jnp.float32
    ps, nl = ptref_ref.shape[1:]
    lb = -(psz // 2)
    novals = float(c * psz * psz)

    win = win_ref[:]
    T = t_ref[:]
    DX = dx_ref[:]
    DY = dy_ref[:]
    h00 = hes_ref[0]
    h01 = hes_ref[1]
    h11 = hes_ref[2]
    det = h00 * h11 - h01 * h01
    ptref = ptref_ref[:]
    p_in = pinit_ref[:]
    by = by_ref[0]
    bx = bx_ref[0]

    if band_select:
        win = _band_fine_select(win, bx, sx)

    def csum(x):  # (psz_i, C, psz_j, PS, 128) -> (PS, 128)
        return jnp.sum(x.reshape(psz * c * psz, ps, nl), axis=0)

    def param_to_pt(p):
        if nop == 2:
            return ptref + p
        return jnp.concatenate([ptref[0:1] + p[0:1], ptref[1:2]], axis=0)

    def oob(pt):
        lbf = -float(psz) / 2.0
        return (
            (pt[0] < lbf) | (pt[1] < lbf)
            | (pt[0] > float(w + psz // 2 - 2))
            | (pt[1] > float(h + psz // 2 - 2))
        )

    def extract(pt):
        fy = jnp.floor(pt[1])
        fx = jnp.floor(pt[0])
        ry = (pt[1] - fy)[None, None, None]   # (1,1,1,PS,128)
        rx = (pt[0] - fx)[None, None, None]
        oy = fy.astype(jnp.int32) + lb + pad - by   # (PS,128), in [0, sy-psz-1]
        ox = fx.astype(jnp.int32) + lb + pad - bx
        rows = jnp.zeros((sx, c, psz, ps, nl), f32)
        for s in range(sy - psz):
            m = jnp.where(oy == s, 1.0, 0.0)[None, None, None]
            rows = rows + m * (
                (1.0 - ry) * win[:, :, s : s + psz]
                + ry * win[:, :, s + 1 : s + psz + 1]
            )
        out = jnp.zeros((psz, c, psz, ps, nl), f32)
        for s in range(sx - psz):
            m = jnp.where(ox == s, 1.0, 0.0)[None, None, None]
            out = out + m * (
                (1.0 - rx) * rows[s : s + psz] + rx * rows[s + 1 : s + psz + 1]
            )
        return out

    def loss(diff):
        if cost == 0:
            pd = diff
        elif cost == 1:
            pd = jnp.sign(diff) * jnp.sqrt(jnp.abs(diff))
        elif cost == 2:
            bsq = normoutlier * normoutlier
            pd = jnp.sign(diff) * jnp.sqrt(
                2.0 * bsq * (jnp.sqrt(1.0 + diff * diff / bsq) - 1.0)
            )
        else:
            pd = diff
        return pd, jnp.abs(pd)

    def residual(pt):
        raw = extract(pt)
        if patch_norm:
            raw = raw - (csum(raw) / novals)[None, None, None]
        if cost == 10:
            tn_ = jnp.sqrt(csum(T * T))[None, None, None]
            rn = jnp.sqrt(csum(raw * raw))[None, None, None]
            diff = raw * (tn_ / jnp.maximum(rn, 1e-10)) - T
            return diff, jnp.abs(diff)
        return loss(raw - T)

    tmpl_pd, tmpl_pw = (T, jnp.abs(T)) if cost == 10 else loss(T)

    pt_st = param_to_pt(p_in)
    oob0 = oob(pt_st)  # (PS,128) bool

    zf = ptref[0] * 0.0   # concrete-layout zeros (see _gn_kernel notes)
    zi = zf.astype(jnp.int32)
    state = (
        p_in,
        pt_st,
        jnp.zeros((psz, c, psz, ps, nl), f32),  # pdiff
        jnp.zeros((psz, c, psz, ps, nl), f32),  # pweight
        zf + 1e5,                               # mares
        zf + 1e5,                               # mares_old
        zf + 1e-10,                             # dpsq
        zf + 1e-10,                             # dpsq_init
        zi,                                     # cnt
        zi,                                     # converged
    )

    def body(i, state):
        (p_iter, pt_iter, pdiff, pweight, mares, mares_old,
         dpsq, dpsq_init, cnt, converged) = state
        first = (jnp.zeros((ps, nl), jnp.int32) + i) == 0
        active = converged == 0
        cnt_n = jnp.where(first, 0, cnt + 1)

        b0 = csum(DX * pdiff)
        if nop == 2:
            b1 = csum(DY * pdiff)
            du = (h11 * b0 - h01 * b1) / det
            dv = (h00 * b1 - h01 * b0) / det
            delta_p = jnp.stack([du, dv], axis=0)
        else:
            delta_p = (b0 / h00)[None]
        delta_p = jnp.where(first[None], 0.0, delta_p)
        p_new = p_iter - delta_p
        if stereo_clamp == 0:
            p_new = jnp.where(first[None], p_new, jnp.minimum(p_new, 0.0))
        elif stereo_clamp == 1:
            p_new = jnp.where(first[None], p_new, jnp.maximum(p_new, 0.0))
        pt_new = param_to_pt(p_new)

        moved = jnp.sum((pt_st - pt_new) ** 2, axis=0) > outlier_sq
        reset = jnp.logical_not(first) & (moved | oob(pt_new))
        p_new = jnp.where(reset[None], p_in, p_new)
        pt_new = param_to_pt(p_new)

        pd_new, pw_new = residual(pt_new)
        oob_start = first & oob0
        m0 = oob_start[None, None, None]
        pd_new = jnp.where(m0, tmpl_pd, pd_new)
        pw_new = jnp.where(m0, tmpl_pw, pw_new)
        dpsq_n = jnp.where(first, 1e-10, jnp.sum(delta_p * delta_p, axis=0))
        m1 = (cnt_n == 1).astype(jnp.float32)
        dpsq_init_n = m1 * dpsq_n + (1.0 - m1) * dpsq_init
        mares_old_n = jnp.where(first, 1e5, mares)
        mares_n = csum(pw_new) / novals
        mares_n = jnp.where(oob_start, 1e5, mares_n)

        keep_going = (
            (cnt_n < max_iter)
            & (mares_n > res_thresh)
            & ((cnt_n < min_iter) | (dpsq_n / dpsq_init_n >= dp_thresh_sq))
            & ((cnt_n < min_iter) | (mares_n / mares_old_n <= dr_thresh))
        )
        conv_n = ((converged != 0) | reset | ~keep_going | oob_start).astype(
            jnp.int32
        )

        am = active[None]
        am4 = active[None, None, None]
        return (
            jnp.where(am, p_new, p_iter),
            jnp.where(am, pt_new, pt_iter),
            jnp.where(am4, pd_new, pdiff),
            jnp.where(am4, pw_new, pweight),
            jnp.where(active, mares_n, mares),
            jnp.where(active, mares_old_n, mares_old),
            jnp.where(active, dpsq_n, dpsq),
            jnp.where(active, dpsq_init_n, dpsq_init),
            jnp.where(active, cnt_n, cnt),
            jnp.where(active, conv_n, converged),
        )

    state = jax.lax.fori_loop(0, max_iter + 1, body, state)
    p_iter, pt_iter, _, pweight, _, _, _, _, _, converged = state
    p_out[:] = p_iter
    pt_out[:] = pt_iter
    pw_out[:] = pweight
    conv_out[:] = converged[None]


# The fused GN kernel is the default search path (OF_DIS_GN_PALLAS=0 falls
# back to the XLA two-hot loop).  Round-1 history: an untiled two-hot version
# of this kernel measured 1.5x SLOWER than XLA at op2 scale; the current
# version wins everywhere because (a) the roll-blend + block-select
# extraction does ~2x fewer VPU ops than the two-hot, (b) the patch axis is
# tiled over a grid so each tile's window, templates and loop state stay
# VMEM-resident across ALL trips (XLA streams its 100+ MB loop carries from
# HBM every trip at op4's 51k-patch levels), and (c) one kernel replaces the
# ~10 small per-trip XLA ops whose ~4 us dispatch latency dominates the
# tiny op1/op2 levels.
GN_PALLAS = os.environ.get("OF_DIS_GN_PALLAS", "1") != "0"

# On the CPU backend the kernel would run in Pallas interpret mode — ~4x
# slower than the XLA formulation and testing nothing the dedicated
# equivalence tests (tests/test_inverse_search.py) don't already cover, so
# CPU defaults to the XLA path.  Set to True (or OF_DIS_GN_PALLAS_CPU=1) to
# force the interpreted kernel, e.g. for kernel-logic tests.
GN_PALLAS_CPU = os.environ.get("OF_DIS_GN_PALLAS_CPU", "0") != "0"


def gn_pallas_applicable(sy: int, sx: int, psz: int, c: int, n: int) -> bool:
    # The block-select needs at least one valid row/col offset; degenerate
    # tiny levels (window smaller than psz+1) use the XLA path.
    if not GN_PALLAS or (_interpret() and not GN_PALLAS_CPU):
        return False
    return sy > psz and sx > psz


# Feed the GN kernel the coarse 64-wide column band instead of XLA-selected
# sx-wide windows; the fine select runs in VMEM (band_select prologue).
# Measured on real v5e (bench_logs/r4_ab_band.json, 2026-08-18): op1
# 10044->9898 Hz (-1.5% wall, device flat), op3 59.6->60.1 Hz (+0.8% wall,
# device 21.0->20.0 ms).  Neither op point clears the 5% noise floor in the
# same direction, so the simpler XLA column select stays the default; the
# flag remains as an escape hatch for future toolchains.
GN_BAND_SELECT = os.environ.get("OF_DIS_GN_BAND_SELECT", "0") != "0"


def gn_band_applicable(sx: int, wp: int) -> bool:
    """Band mode needs the coarse-select gather branches: sx <= 31 (the
    local offset fits [0,32)) and a level wider than one 64-px band."""
    return GN_BAND_SELECT and sx <= 31 and wp > 64


# Mosaic's scoped stack allocation for _gn_kernel_tiled measures ~4.5x the
# naive live-buffer word count (the unrolled block-select keeps every slice
# temporary alive); budget against that with an explicit vmem_limit_bytes
# raised far past the 16 MB default (the v5e has 128 MB physical VMEM).
_GN_TILED_STACK_FACTOR = 4.5
_GN_TILED_VMEM_BUDGET = 56 * 2**20


def _gn_tiled_naive_words(sy: int, sx: int, psz: int, c: int, wb: int | None = None) -> int:
    w = (wb or sx) * c * sy + 3 * c * psz * psz + sx * c * psz + 4 * c * psz * psz + 64
    if wb and wb != sx:  # band_select temporaries (bandm + selected win)
        w += (2 * sx + 8) * c * sy
    return w


def _gn_tiled_ps(sy: int, sx: int, psz: int, c: int, wb: int | None = None):
    """Largest (ps, 128) patch-tile whose estimated scoped VMEM fits.
    Mosaic requires the block's second-minor dim be a multiple of 8."""
    per_lane = _gn_tiled_naive_words(sy, sx, psz, c, wb) * _GN_TILED_STACK_FACTOR * 4
    for ps in (16, 8):
        if per_lane * ps * 128 <= _GN_TILED_VMEM_BUDGET:
            return ps
    return None


def _gn_tile_n(sy: int, sx: int, psz: int, c: int, wb: int | None = None) -> int:
    """Largest patch-tile size whose VMEM working set fits ~10 MB:
    win + rolled copy (2*sx*c*sy) + rows/rowsb/blend temps (4*sx*c*psz) +
    templates/state/extract outputs (10*c*psz^2) words per lane, f32."""
    words = 2 * sx * c * sy + 4 * sx * c * psz + 10 * c * psz * psz + 64
    if wb and wb != sx:  # band input + select temporaries
        words += (wb + sx + 8) * c * sy
    budget = (10 * 2**20) // 4
    for tn in (2048, 1024, 512, 256, 128):
        if words * tn <= budget:
            return tn
    return 128


def gn_search_pallas(
    win, T, DX, DY, hes3, ptref, p_init, by, bx, *,
    psz, sy, sx, nop, c, pad, w, h, cfg, camlr, band_select=False,
):
    """Run the fused GN search kernel, tiled over the patch axis.

    Inputs are patches-last: win (sx, C, sy, N) — or the coarse (64, C,
    sy, N) column band when band_select (the kernel runs the fine select);
    T/DX/DY (psz_i, C, psz_j, N); hes3 (3, N); ptref (2, N); p_init
    (nop, N); by/bx (1, N) int32.
    Returns (p (nop,N), pt (2,N), pweight (psz_i,C,psz_j,N), converged (N,)).
    """
    wb = win.shape[0]
    n0 = ptref.shape[1]
    # Big-N levels use the (PS, 128) patch-tile kernel: pixel dims become
    # outer dims (free slicing), tiles are fully utilized, and the VMEM
    # working set per program is bounded by the patch-tile size.
    ps = _gn_tiled_ps(sy, sx, psz, c, wb)
    # Tiled only when the patch count fills at least one (ps, 128) tile.
    # Small-N alternatives both measured WORSE than the untiled kernel:
    # padding up to full (8,128) grid tiles 2.5x slower, and running the
    # tiled kernel as one whole-array (nbp<8, 128) program ~30% slower
    # (tiny second-minor dims starve the VPU) — the untiled layout's
    # sublane-slice relayouts are the cheaper evil below ~1024 patches.
    tiled_ok = ps is not None and (-(-n0 // 128) >= ps)
    if tiled_ok:
        return _gn_search_tiled(
            win, T, DX, DY, hes3, ptref, p_init, by, bx,
            psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
            cfg=cfg, camlr=camlr, ps=ps, band_select=band_select,
        )
    # Tile no larger than the level needs (lane-padding waste dominates tiny
    # levels otherwise).
    tn = min(_gn_tile_n(sy, sx, psz, c, wb), max(128, -(-n0 // 128) * 128))
    # Pad the patch (lane) axis to a tile multiple: full VPU lanes per
    # program, and Mosaic miscompiles some (1, n<128) broadcasts.
    n = max(tn, -(-n0 // tn) * tn)
    if n != n0:
        padn = n - n0
        win = jnp.pad(win, ((0, 0), (0, 0), (0, 0), (0, padn)))
        T = jnp.pad(T, ((0, 0), (0, 0), (0, 0), (0, padn)))
        DX = jnp.pad(DX, ((0, 0), (0, 0), (0, 0), (0, padn)))
        DY = jnp.pad(DY, ((0, 0), (0, 0), (0, 0), (0, padn)))
        # identity Hessian on padded lanes keeps the solve finite
        hes3 = jnp.concatenate(
            [hes3, jnp.tile(jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32), (1, padn))],
            axis=1,
        )
        # far-out-of-bounds centers: padded lanes converge at trip 0
        ptref = jnp.concatenate(
            [ptref, jnp.full((2, padn), -1e6, jnp.float32)], axis=1
        )
        p_init = jnp.pad(p_init, ((0, 0), (0, padn)))
        by = jnp.pad(by, ((0, 0), (0, padn)))
        bx = jnp.pad(bx, ((0, 0), (0, padn)))
    stereo_clamp = -1 if cfg.mode != "stereo" else int(camlr)
    kernel = functools.partial(
        _gn_kernel,
        psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
        max_iter=int(cfg.max_iter), min_iter=int(cfg.min_iter),
        cost=int(cfg.cost), patch_norm=bool(cfg.patch_norm),
        normoutlier=float(cfg.normoutlier),
        dp_thresh_sq=float(cfg.dp_thresh) ** 2, dr_thresh=float(cfg.dr_thresh),
        res_thresh=float(cfg.res_thresh),
        outlier_sq=float(cfg.outlier_thresh) ** 2,
        stereo_clamp=stereo_clamp,
        band_select=band_select,
    )

    def lane_spec(*lead):
        return pl.BlockSpec(
            tuple(lead) + (tn,),
            lambda i: tuple(0 for _ in lead) + (i,),
            memory_space=pltpu.VMEM,
        )

    p, pt, pw, conv = pl.pallas_call(
        kernel,
        grid=(n // tn,),
        out_shape=(
            jax.ShapeDtypeStruct((nop, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
            jax.ShapeDtypeStruct((psz, c, psz, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        in_specs=[
            lane_spec(wb, c, sy),        # win (or 64-wide band)
            lane_spec(psz, c, psz),      # T
            lane_spec(psz, c, psz),      # DX
            lane_spec(psz, c, psz),      # DY
            lane_spec(3),                # hes3
            lane_spec(2),                # ptref
            lane_spec(nop),              # p_init
            lane_spec(1),                # by
            lane_spec(1),                # bx
        ],
        out_specs=(
            lane_spec(nop),
            lane_spec(2),
            lane_spec(psz, c, psz),
            lane_spec(1),
        ),
        interpret=_interpret(),
    )(win, T, DX, DY, hes3, ptref, p_init, by, bx)
    return (
        p[:, :n0],
        pt[:, :n0],
        pw[..., :n0],
        conv[0, :n0].astype(jnp.bool_),
    )


def _gn_search_tiled(
    win, T, DX, DY, hes3, ptref, p_init, by, bx, *,
    psz, sy, sx, nop, c, pad, w, h, cfg, camlr, ps, band_select=False,
):
    """Big-N GN search: patch axis reshaped (nb, 128), gridded in (ps, 128)
    patch tiles (_gn_kernel_tiled)."""
    wb = win.shape[0]
    n0 = ptref.shape[1]
    nbp = -(-(-(-n0 // 128)) // ps) * ps
    n = nbp * 128
    if n != n0:
        padn = n - n0
        win = jnp.pad(win, ((0, 0), (0, 0), (0, 0), (0, padn)))
        T = jnp.pad(T, ((0, 0), (0, 0), (0, 0), (0, padn)))
        DX = jnp.pad(DX, ((0, 0), (0, 0), (0, 0), (0, padn)))
        DY = jnp.pad(DY, ((0, 0), (0, 0), (0, 0), (0, padn)))
        hes3 = jnp.concatenate(
            [hes3, jnp.tile(jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32), (1, padn))],
            axis=1,
        )
        ptref = jnp.concatenate(
            [ptref, jnp.full((2, padn), -1e6, jnp.float32)], axis=1
        )
        p_init = jnp.pad(p_init, ((0, 0), (0, padn)))
        by = jnp.pad(by, ((0, 0), (0, padn)))
        bx = jnp.pad(bx, ((0, 0), (0, padn)))

    def fold(x):
        return x.reshape(x.shape[:-1] + (nbp, 128))

    stereo_clamp = -1 if cfg.mode != "stereo" else int(camlr)
    kernel = functools.partial(
        _gn_kernel_tiled,
        psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
        max_iter=int(cfg.max_iter), min_iter=int(cfg.min_iter),
        cost=int(cfg.cost), patch_norm=bool(cfg.patch_norm),
        normoutlier=float(cfg.normoutlier),
        dp_thresh_sq=float(cfg.dp_thresh) ** 2, dr_thresh=float(cfg.dr_thresh),
        res_thresh=float(cfg.res_thresh),
        outlier_sq=float(cfg.outlier_thresh) ** 2,
        stereo_clamp=stereo_clamp,
        band_select=band_select,
    )

    def tile_spec(*lead):
        return pl.BlockSpec(
            tuple(lead) + (ps, 128),
            lambda i: tuple(0 for _ in lead) + (i, 0),
            memory_space=pltpu.VMEM,
        )

    p, pt, pw, conv = pl.pallas_call(
        kernel,
        grid=(nbp // ps,),
        out_shape=(
            jax.ShapeDtypeStruct((nop, nbp, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, nbp, 128), jnp.float32),
            jax.ShapeDtypeStruct((psz, c, psz, nbp, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, nbp, 128), jnp.int32),
        ),
        in_specs=[
            tile_spec(wb, c, sy),        # win (or 64-wide band)
            tile_spec(psz, c, psz),      # T
            tile_spec(psz, c, psz),      # DX
            tile_spec(psz, c, psz),      # DY
            tile_spec(3),                # hes3
            tile_spec(2),                # ptref
            tile_spec(nop),              # p_init
            tile_spec(1),                # by
            tile_spec(1),                # bx
        ],
        out_specs=(
            tile_spec(nop),
            tile_spec(2),
            tile_spec(psz, c, psz),
            tile_spec(1),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_GN_TILED_VMEM_BUDGET + 8 * 2**20,
        ),
        interpret=_interpret(),
    )(
        fold(win), fold(T), fold(DX), fold(DY), fold(hes3), fold(ptref),
        fold(p_init), fold(by), fold(bx),
    )
    return (
        p.reshape(nop, n)[:, :n0],
        pt.reshape(2, n)[:, :n0],
        pw.reshape(psz, c, psz, n)[..., :n0],
        conv.reshape(n)[:n0].astype(jnp.bool_),
    )


# ---------------------------------------------------------------------------
# Whole-level fused search: in-kernel window build + GN machine
# ---------------------------------------------------------------------------
#
# At op1/op2 the coarse pyramid levels are tiny (<= 144x72 padded, <= ~400
# patches) and the XLA window chain there is pure overhead: ~10 HLOs per
# level whose ~5 us launch gaps plus HBM round-trips for the one-hot band
# matmul cost ~700 us/call at B=16 (profile r3).  This kernel builds the
# per-patch windows INSIDE the GN kernel: one MXU one-hot row fetch
# (Wp, Hp) @ (Hp, sy*N) straight from the VMEM-resident level image, then a
# hierarchical block-select over column offsets (32-aligned -> 8-aligned ->
# fine, ~16 select iterations instead of Wp-sx) — then runs the shared
# _gn_machine on the windows without them ever touching HBM.

def _fetch_windows(img_ref, R2, bx, *, ny, nx, hp, wp, n, c):
    """Fetch per-patch (nx, ny) windows from a VMEM-resident (C, Hp, Wp)
    image: one MXU one-hot row matmul per channel (R2 prebuilt (Hp, ny*N)),
    then a hierarchical column block-select (32-aligned -> 8-aligned ->
    fine; ~16 select iterations instead of Wp-nx).  bx (1, N) int32 in
    [0, wp-nx].  Returns (nx, C, ny, N)."""
    f32 = jnp.float32
    if wp > 64:
        nk = (wp - nx) // 32 + 1     # coarse 32-aligned positions
        # Band must cover bxr (< 32) + nx window columns; 64 suffices only
        # for nx <= 33 (psz <= 15).  Round up so wide windows stay correct.
        w1 = 32 + -(-nx // 32) * 32  # band width after coarse select
        r1 = 32                      # bxr range after coarse select
    else:
        nk = 0
        w1 = wp
        r1 = wp - nx + 1
    b8m = (r1 - 1) // 8
    w2 = nx + 8                      # band width after mid select
    w1p = max(w1, 8 * b8m + w2)

    chans = []
    for ch in range(c):
        imT = jnp.transpose(img_ref[ch], (1, 0))             # (Wp, Hp)
        rows = jnp.dot(imT, R2, preferred_element_type=f32)  # (Wp, ny*N)
        rows3 = rows.reshape(wp, ny, n)
        if nk:
            rows3 = jnp.pad(rows3, ((0, max(0, 32 * (nk - 1) + w1 - wp)), (0, 0), (0, 0)))
            b32 = bx // 32           # (1, N), in [0, nk-1] since bx <= wp-nx
            band = jnp.zeros((w1, ny, n), f32)
            for k in range(nk):
                m = (b32 == k).astype(f32)[None]
                band = band + m * rows3[32 * k : 32 * k + w1]
            bxr = bx - 32 * b32      # [0, 32)
        else:
            band = rows3
            bxr = bx
        if w1p > w1:
            band = jnp.pad(band, ((0, w1p - w1), (0, 0), (0, 0)))
        b8 = bxr // 8                # [0, b8m]
        bandm = jnp.zeros((w2, ny, n), f32)
        for k in range(b8m + 1):
            m = (b8 == k).astype(f32)[None]
            bandm = bandm + m * band[8 * k : 8 * k + w2]
        bxf = bxr - 8 * b8           # [0, 8)
        win_c = jnp.zeros((nx, ny, n), f32)
        for f in range(8):
            m = (bxf == f).astype(f32)[None]
            win_c = win_c + m * bandm[f : f + nx]
        chans.append(win_c)
    return jnp.stack(chans, axis=1)  # (nx, C, ny, N)


def _row_onehot(by, ny, hp, n):
    """(Hp, ny*N) one-hot R[y, s*N+n] = 1[y == by_n + s] (tile-preserving
    reshape: N is a multiple of 128)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (hp, ny, n), 0)
    ss = jax.lax.broadcasted_iota(jnp.int32, (hp, ny, n), 1)
    return (ys == by[None] + ss).astype(jnp.float32).reshape(hp, ny * n)


def _level_kernel(
    *refs,
    inline_templates: bool,
    hp: int, wp: int, minerrval: float, patch_norm: bool,
    psz: int, sy: int, sx: int, nop: int, c: int, pad: int,
    **consts,
):
    """Whole-level fused search.  Two input forms:

    inline_templates=True:  (ima, dxa, dya, imb, ptref, pinit | outs) —
      template extraction + Hessians happen in-kernel too (integer windows
      at the static patch centers, patch.cpp:57-88).
    inline_templates=False: (imb, T, DX, DY, hes3, ptref, pinit | outs) —
      templates precomputed by XLA (spatial-shard callers).
    """
    f32 = jnp.float32
    if inline_templates:
        (ima_ref, dxa_ref, dya_ref, imb_ref, ptref_ref, pinit_ref,
         p_out, pt_out, aw_out, conv_out) = refs
    else:
        (imb_ref, t_ref, dx_ref, dy_ref, hes_ref, ptref_ref, pinit_ref,
         p_out, pt_out, aw_out, conv_out) = refs
    n = ptref_ref.shape[1]
    lb = -(psz // 2)
    novals = float(c * psz * psz)

    ptref = ptref_ref[:]
    p_in = pinit_ref[:]

    if inline_templates:
        # Integer template windows at the static centers (patch.cpp:286-332
        # semantics): cy/cx = floor(pt + 0.5) + pad + lb, in-bounds for the
        # static grid.
        cy = jnp.floor(ptref[1:2] + 0.5).astype(jnp.int32) + pad + lb
        cx = jnp.floor(ptref[0:1] + 0.5).astype(jnp.int32) + pad + lb
        cy = jnp.clip(cy, 0, hp - psz)   # pad lanes (-1e6 centers) clip in
        cx = jnp.clip(cx, 0, wp - psz)
        Rt = _row_onehot(cy, psz, hp, n)
        T = _fetch_windows(ima_ref, Rt, cx, ny=psz, nx=psz, hp=hp, wp=wp, n=n, c=c)
        DX = _fetch_windows(dxa_ref, Rt, cx, ny=psz, nx=psz, hp=hp, wp=wp, n=n, c=c)
        DY = _fetch_windows(dya_ref, Rt, cx, ny=psz, nx=psz, hp=hp, wp=wp, n=n, c=c)

        def csum(x):
            return jnp.sum(x.reshape(psz * c * psz, n), axis=0, keepdims=True)

        if patch_norm:
            T = T - (csum(T) / novals)[None, None]
        h00 = csum(DX * DX)
        if nop == 2:
            h01 = csum(DX * DY)
            h11 = csum(DY * DY)
            det = h00 * h11 - h01 * h01
            bump = jnp.where(det == 0.0, 1e-10, 0.0)  # patch.cpp:78-82
            hes3 = jnp.concatenate([h00 + bump, h01, h11 + bump], axis=0)
        else:
            bump = jnp.where(h00 == 0.0, 1e-10, 0.0)
            hes3 = jnp.concatenate([h00 + bump, h00 * 0.0, h00 * 0.0], axis=0)
    else:
        T = t_ref[:]
        DX = dx_ref[:]
        DY = dy_ref[:]
        hes3 = hes_ref[:]

    if nop == 2:
        pt_st = ptref + p_in
    else:
        pt_st = jnp.concatenate([ptref[0:1] + p_in[0:1], ptref[1:2]], axis=0)
    # Window bases — identical formulas to optimize_level's XLA path.
    by = jnp.clip(
        jnp.floor(pt_st[1:2]).astype(jnp.int32) + lb - psz // 2 + pad, 0, hp - sy
    )
    bx = jnp.clip(
        jnp.floor(pt_st[0:1]).astype(jnp.int32) + lb - psz // 2 + pad, 0, wp - sx
    )
    win = _fetch_windows(
        imb_ref, _row_onehot(by, sy, hp, n), bx,
        ny=sy, nx=sx, hp=hp, wp=wp, n=n, c=c,
    )

    p, pt, pw, conv = _gn_machine(
        win, T, DX, DY, hes3, ptref, p_in, by, bx,
        psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad,
        patch_norm=patch_norm, **consts,
    )
    # Densification weights in-kernel (patchgrid.cpp:253-260): absw[k, n],
    # k = j*psz + i row-major, = 1 / sum_c max(minerrval, |pdiff|).
    pwc = jnp.sum(jnp.maximum(minerrval, pw), axis=1)  # (psz_i, psz_j, N)
    aw = 1.0 / jnp.transpose(pwc, (1, 0, 2)).reshape(psz * psz, n)
    p_out[:] = p
    pt_out[:] = pt
    aw_out[:] = aw
    conv_out[:] = conv


# VMEM word estimate for _level_kernel (same scoped-stack budgeting approach
# as the tiled GN kernel; factor measured there).
_LEVEL_VMEM_BUDGET = 80 * 2**20


def _level_words(hp, wp, c, np_, psz, sy, sx):
    return (
        2 * hp * wp * c                  # image + transpose
        + hp * sy * np_                  # one-hot R
        + (wp + 32 + -(-sx // 32) * 32) * sy * np_ * c  # rows + coarse/mid bands, per ch
        + 2 * sx * c * sy * np_          # win + rolled copy
        + 10 * c * psz * psz * np_       # machine state
        + 64
    )


LEVEL_PALLAS = os.environ.get("OF_DIS_LEVEL_PALLAS", "1") != "0"


def _level_shape_ok(hp: int, wp: int, c: int, n: int, psz: int,
                    sy: int, sx: int) -> bool:
    """Pure-shape half of level_gn_applicable (shared with gn_route)."""
    if not (sy > psz and sx > psz):
        return False
    np_ = -(-n // 128) * 128
    if np_ > 512 or hp * wp > 12288:
        return False
    return _level_words(hp, wp, c, np_, psz, sy, sx) * _GN_TILED_STACK_FACTOR * 4 \
        <= _LEVEL_VMEM_BUDGET


def level_gn_applicable(hp: int, wp: int, c: int, n: int, psz: int,
                        sy: int, sx: int) -> bool:
    """Whole-level fused search: small levels only (image + all patches in
    one VMEM-resident program; larger levels use gn_search_pallas whose
    windows XLA gathers with the segment row take)."""
    if not LEVEL_PALLAS or not GN_PALLAS or (_interpret() and not GN_PALLAS_CPU):
        return False
    return _level_shape_ok(hp, wp, c, n, psz, sy, sx)


def gn_route(hp: int, wp: int, c: int, n: int, psz: int, sy: int, sx: int) -> str:
    """Which search realization a level's SHAPE routes to on TPU defaults,
    ignoring environment/backend gates (OF_DIS_GN_PALLAS, interpret mode).

    Returns "level" (whole-level fused kernel), "tiled<ps>" ((ps, 128)
    patch-tiled GN kernel), "untiled" (single-program GN kernel) or "xla"
    (the two-hot XLA loop).  This is the diagnostic surface
    tests/test_applicability.py pins: the gates budget VMEM with a measured
    Mosaic stack factor (_GN_TILED_STACK_FACTOR), so a toolchain update that
    shifts the estimate would silently reroute hot levels — the pinned table
    turns that into a loud test failure."""
    if _level_shape_ok(hp, wp, c, n, psz, sy, sx):
        return "level"
    if not (sy > psz and sx > psz):
        return "xla"
    ps = _gn_tiled_ps(sy, sx, psz, c)
    if ps is not None and (-(-n // 128) >= ps):
        return f"tiled{ps}"
    return "untiled"


def level_search_pallas(
    imgs, tmpl_args, ptref, p_init, *,
    psz, sy, sx, nop, c, pad, w, h, hp, wp, cfg, camlr,
):
    """Run the whole-level fused kernel.

    imgs: (ima, dxa, dya, imb) each (C, Hp, Wp) with tmpl_args=None
    (in-kernel template build), or (imb,) with tmpl_args = (T, DX, DY
    (psz_i, C, psz_j, N), hes3 (3, N)) precomputed.  ptref (2, N); p_init
    (nop, N).  Returns (p (nop,N), pt (2,N), absw (psz²,N), conv (N,)).
    """
    inline = tmpl_args is None
    n0 = ptref.shape[1]
    n = -(-n0 // 128) * 128
    if n != n0:
        padn = n - n0
        if not inline:
            T, DX, DY, hes3 = tmpl_args
            T = jnp.pad(T, ((0, 0), (0, 0), (0, 0), (0, padn)))
            DX = jnp.pad(DX, ((0, 0), (0, 0), (0, 0), (0, padn)))
            DY = jnp.pad(DY, ((0, 0), (0, 0), (0, 0), (0, padn)))
            hes3 = jnp.concatenate(
                [hes3, jnp.tile(jnp.asarray([[1.0], [0.0], [1.0]], jnp.float32), (1, padn))],
                axis=1,
            )
            tmpl_args = (T, DX, DY, hes3)
        # Far-out-of-bounds centers: padded lanes converge at trip 0 (with
        # inline templates their clipped-garbage templates are inert).
        ptref = jnp.concatenate(
            [ptref, jnp.full((2, padn), -1e6, jnp.float32)], axis=1
        )
        p_init = jnp.pad(p_init, ((0, 0), (0, padn)))
    stereo_clamp = -1 if cfg.mode != "stereo" else int(camlr)
    kernel = functools.partial(
        _level_kernel,
        inline_templates=inline,
        hp=hp, wp=wp, minerrval=float(cfg.minerrval),
        psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
        max_iter=int(cfg.max_iter), min_iter=int(cfg.min_iter),
        cost=int(cfg.cost), patch_norm=bool(cfg.patch_norm),
        normoutlier=float(cfg.normoutlier),
        dp_thresh_sq=float(cfg.dp_thresh) ** 2, dr_thresh=float(cfg.dr_thresh),
        res_thresh=float(cfg.res_thresh),
        outlier_sq=float(cfg.outlier_thresh) ** 2,
        stereo_clamp=stereo_clamp,
    )
    operands = tuple(imgs) + (tuple(tmpl_args) if not inline else ()) + (ptref, p_init)
    p, pt, aw, conv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nop, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
            jax.ShapeDtypeStruct((psz * psz, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_LEVEL_VMEM_BUDGET + 20 * 2**20,
        ),
        interpret=_interpret(),
    )(*operands)
    return (
        p[:, :n0],
        pt[:, :n0],
        aw[:, :n0],
        conv[0, :n0].astype(jnp.bool_),
    )


def _sor_scalar_kernel(du_ref, a11_ref, b1_ref, wh_ref, wv_ref, duo_ref,
                       *, iterations: int, omega: float):
    h, w = du_ref.shape
    up, down, left, right, red = _shifts(h, w)
    wh = wh_ref[:]
    wv = wv_ref[:]
    b1 = b1_ref[:]
    A11 = a11_ref[:] + up(wv) + left(wh) + wv + wh
    invA = omega / A11

    def nb(x):
        return up(wv * x) + left(wh * x) + wv * down(x) + wh * right(x)

    def half(color, du):
        B1 = b1 + nb(du)
        return jnp.where(color, (1.0 - omega) * du + invA * B1, du)

    def body(_, du):
        du = half(red, du)
        du = half(~red, du)
        return du

    duo_ref[:] = jax.lax.fori_loop(0, iterations, body, du_ref[:])


def sor_scalar_rb_pallas(du, a11, b1, wh, wv, iterations: int, omega: float):
    h, w = du.shape
    kernel = functools.partial(
        _sor_scalar_kernel, iterations=iterations, omega=float(omega)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_SOR_VMEM_LIMIT,
        interpret=_interpret(),
    )(du, a11, b1, wh, wv)
