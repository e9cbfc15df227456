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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 9 (h, w) f32 operands + working copies must fit in VMEM (~16 MB/core).
SOR_PALLAS_MAX_PIXELS = 200_000


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
        interpret=_interpret(),
    )(wx, wy, mask, *dv)


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
        interpret=_interpret(),
    )(du, a11, b1, wh, wv)
