"""Patch-window gather + bilinear interpolation primitives.

The reference extracts patches with pointer walks (patch.cpp:286-402).  The
TPU-native formulation treats all N patches of a level as one batch and
issues a single flat gather per extraction:

  - integer windows for the template (getPatchStaticNNGrad, patch.cpp:286-332)
  - a (psz+1)^2 window + constant 4-tap bilinear weights for the query patch
    (getPatchStaticBil, patch.cpp:334-402).  The reference computes the taps
    from ceil(x + 1e-5)/floor(x); since ceil(x+eps) == floor(x)+1 for all
    inputs the optimizer produces, we use cx = floor(x)+1 directly.

Images are padded by `pad` on each side; the optimizer's bounds checks
(patch.cpp:198-208) guarantee every window stays inside the padded array, so
index clipping below only protects lanes that are already converged/masked.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def window_offsets(win: int, wp: int) -> jnp.ndarray:
    """Static (win, win) flat offsets into a row-major (Hp, Wp) image."""
    oy = np.arange(win, dtype=np.int64)[:, None]
    ox = np.arange(win, dtype=np.int64)[None, :]
    return jnp.asarray(oy * wp + ox, dtype=jnp.int32)


def window_offsets_rect(wy: int, wx: int, wp: int) -> jnp.ndarray:
    """Static (wy, wx) flat offsets into a row-major (Hp, Wp) image."""
    oy = np.arange(wy, dtype=np.int64)[:, None]
    ox = np.arange(wx, dtype=np.int64)[None, :]
    return jnp.asarray(oy * wp + ox, dtype=jnp.int32)


def gather_windows(
    img_flat: jnp.ndarray,  # (Hp*Wp, C)
    base_y: jnp.ndarray,    # (N,) int32, top row of window (padded coords)
    base_x: jnp.ndarray,    # (N,) int32
    offsets: jnp.ndarray,   # (win, win) flat offsets from window_offsets()
    wp: int,
) -> jnp.ndarray:
    """Gather (N, win, win, C) windows from a flat padded image."""
    base = base_y * wp + base_x  # (N,)
    idx = base[:, None, None] + offsets[None]  # (N, win, win)
    idx = jnp.clip(idx, 0, img_flat.shape[0] - 1)
    return jnp.take(img_flat, idx, axis=0)


def extract_int_windows(
    img_flat: jnp.ndarray,
    pt: jnp.ndarray,       # (N, 2) float (x, y) in unpadded coords
    psz: int,
    pad: int,
    wp: int,
    offsets: jnp.ndarray,
) -> jnp.ndarray:
    """Template-style extraction at round(pt) (patch.cpp:286-332).

    Window spans offsets lb..ub = -psz/2..psz/2-1 around the rounded center.
    """
    lb = -(psz // 2)
    # C's round() rounds half away from zero; grid centers are integers so
    # floor(x + 0.5) is identical for all values that occur.
    cy = jnp.floor(pt[:, 1] + 0.5).astype(jnp.int32) + pad + lb
    cx = jnp.floor(pt[:, 0] + 0.5).astype(jnp.int32) + pad + lb
    return gather_windows(img_flat, cy, cx, offsets, wp)


def extract_bilinear_matmul(
    img: jnp.ndarray,      # (Hp, Wp, C) padded level image
    pt: jnp.ndarray,       # (N, 2) float query positions (unpadded coords)
    psz: int,
    pad: int,
) -> jnp.ndarray:
    """Bilinear patch extraction as two MXU matmuls (gather-free).

    Bilinear interpolation with a constant per-patch weight vector is
    separable: patch[p] = RY[p] @ img @ CX[p] where RY (psz x Hp) holds
    (1-ry, ry) at rows fy+lb+j / +1 and CX (Wp x psz) holds (1-rx, rx) at
    cols fx+lb+i / +1.  Equals the reference's 4-tap formula
    (patch.cpp:334-402) up to float reassociation.  On TPU this replaces a
    latency-bound element gather with dense matmuls — the MXU-native
    formulation for small pyramid levels (use `extract_bilinear_windows`
    for large ones, where one-hot FLOPs would dominate).
    """
    hp, wp, c = img.shape
    n = pt.shape[0]
    lb = -(psz // 2)
    fx = jnp.floor(pt[:, 0])
    fy = jnp.floor(pt[:, 1])
    rx = (pt[:, 0] - fx).astype(img.dtype)
    ry = (pt[:, 1] - fy).astype(img.dtype)
    base_y = fy.astype(jnp.int32) + lb + pad  # row of the (1-ry) tap for j=0
    base_x = fx.astype(jnp.int32) + lb + pad

    y_ids = jnp.arange(hp, dtype=jnp.int32)[None, None, :]           # (1,1,Hp)
    rows = base_y[:, None, None] + jnp.arange(psz, dtype=jnp.int32)[None, :, None]
    ry3 = ry[:, None, None]
    RY = jnp.where(y_ids == rows, 1.0 - ry3, 0.0) + jnp.where(
        y_ids == rows + 1, ry3, 0.0
    )  # (N, psz, Hp)

    x_ids = jnp.arange(wp, dtype=jnp.int32)[None, :, None]           # (1,Wp,1)
    cols = base_x[:, None, None] + jnp.arange(psz, dtype=jnp.int32)[None, None, :]
    rx3 = rx[:, None, None]
    CX = jnp.where(x_ids == cols, 1.0 - rx3, 0.0) + jnp.where(
        x_ids == cols + 1, rx3, 0.0
    )  # (N, Wp, psz)

    # (N*psz, Hp) @ (Hp, Wp*C) -> (N, psz, Wp, C)
    m1 = jnp.dot(
        RY.reshape(n * psz, hp),
        img.reshape(hp, wp * c),
        preferred_element_type=jnp.float32,
    ).reshape(n, psz, wp, c)
    # contract x per patch: (p, j, x, c) x (p, x, i) -> (p, j, c, i)
    out = jax.lax.dot_general(
        m1,
        CX,
        dimension_numbers=((( 2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, psz, C, psz)
    return jnp.transpose(out, (0, 1, 3, 2))  # (N, psz, psz, C)


def extract_int_matmul(
    img: jnp.ndarray,      # (Hp, Wp, C)
    pt: jnp.ndarray,       # (N, 2) integer-valued positions
    psz: int,
    pad: int,
) -> jnp.ndarray:
    """Integer (template) window extraction as one-hot matmuls — the
    gather-free counterpart of extract_int_windows."""
    hp, wp, c = img.shape
    n = pt.shape[0]
    lb = -(psz // 2)
    cy = jnp.floor(pt[:, 1] + 0.5).astype(jnp.int32) + pad + lb
    cx = jnp.floor(pt[:, 0] + 0.5).astype(jnp.int32) + pad + lb
    y_ids = jnp.arange(hp, dtype=jnp.int32)[None, None, :]
    rows = cy[:, None, None] + jnp.arange(psz, dtype=jnp.int32)[None, :, None]
    RY = jnp.where(y_ids == rows, 1.0, 0.0)
    x_ids = jnp.arange(wp, dtype=jnp.int32)[None, :, None]
    cols = cx[:, None, None] + jnp.arange(psz, dtype=jnp.int32)[None, None, :]
    CX = jnp.where(x_ids == cols, 1.0, 0.0)
    m1 = jnp.dot(
        RY.reshape(n * psz, hp), img.reshape(hp, wp * c),
        preferred_element_type=jnp.float32,
    ).reshape(n, psz, wp, c)
    out = jax.lax.dot_general(
        m1, CX, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(out, (0, 1, 3, 2))


# Max patches whose full-width row band is materialized at once; larger
# grids (op3/op4 fine levels: 10k-50k patches) are built in lax.map chunks
# to bound the band at chunk*sy*Wp*C floats per (vmapped-batch) step.
GATHER_CHUNK = int(os.environ.get("OF_DIS_GATHER_CHUNK", 1024))


def gather_windows_rows(
    img: jnp.ndarray,    # (Hp, Wp, C) padded level image
    by: jnp.ndarray,     # (N,) int32 top row per window, in [0, Hp-sy]
    bx: jnp.ndarray,     # (N,) int32 left col per window, in [0, Wp-sx]
    sy: int,
    sx: int,
) -> jnp.ndarray:
    """Gather per-patch (sy, sx) windows, returned patches-last (sx, C, sy, N).

    Element gathers are pathological on TPU (~10 ns/element); whole-ROW
    gathers (or, for small levels, a one-hot MXU matmul) fetch the sy
    full-width rows of every window at once, then a fused one-hot reduce
    over Wp selects the sx columns (VPU, patches on lanes).
    """
    n = by.shape[0]
    if n > GATHER_CHUNK:
        c = img.shape[2]
        npad = (-n) % GATHER_CHUNK
        k = (n + npad) // GATHER_CHUNK
        byp = jnp.pad(by, (0, npad)).reshape(k, GATHER_CHUNK)
        bxp = jnp.pad(bx, (0, npad)).reshape(k, GATHER_CHUNK)
        outs = jax.lax.map(
            lambda ab: _gather_windows_rows(img, ab[0], ab[1], sy, sx),
            (byp, bxp),
        )  # (k, sx, C, sy, chunk)
        out = jnp.moveaxis(outs, 0, 3).reshape(sx, c, sy, k * GATHER_CHUNK)
        return out[..., :n]
    return _gather_windows_rows(img, by, bx, sy, sx)


def _gather_windows_rows(img, by, bx, sy: int, sx: int) -> jnp.ndarray:
    hp, wp, c = img.shape
    n = by.shape[0]
    if n * sy * hp * wp * c * 2 <= 20_000_000_000 // 32:
        # Small level: one-hot MXU matmul beats the row gather (element and
        # even row gathers are latency-bound at ~8 ns/row on TPU), and the
        # transposed product (Wp*C, Hp) @ (Hp, sy*N) lands the band in the
        # patches-last layout DIRECTLY — no 4-D transpose copies.
        ks = jnp.arange(hp, dtype=jnp.int32)[:, None, None]
        rows = by[None, None, :] + jnp.arange(sy, dtype=jnp.int32)[None, :, None]
        R = (ks == rows).astype(img.dtype).reshape(hp, sy * n)  # (Hp, sy*N)
        band = jnp.dot(
            img.reshape(hp, wp * c).T, R, preferred_element_type=jnp.float32
        ).reshape(wp, c, sy, n)  # (Wp, C, sy, N)
    else:
        rows = by[:, None] + jnp.arange(sy, dtype=jnp.int32)[None, :]  # (N, sy)
        band = jnp.take(img.reshape(hp, wp * c), rows.reshape(-1), axis=0)
        band = band.reshape(n, sy, wp, c).transpose(2, 3, 1, 0)  # (Wp, C, sy, N)

    if sx <= 31 and wp > 64:
        # Two-stage column select: pick the 2 covering 32-wide segments with
        # a coarse one-hot (cost nseg*64 per value), then the sx columns
        # inside the 64 (cost 64*sx) — (nseg + sx)*64 vs Wp*sx work, ~5x
        # less at op3/op4 band widths.
        nseg = -(-wp // 32)
        if nseg * 32 != wp:
            band = jnp.pad(band, ((0, nseg * 32 - wp), (0, 0), (0, 0), (0, 0)))
        seg0 = bx // 32
        segs = jnp.arange(nseg, dtype=jnp.int32)[:, None, None]
        tseg = seg0[None, None, :] + jnp.arange(2, dtype=jnp.int32)[None, :, None]
        sel1 = (segs == tseg).astype(img.dtype)  # (nseg, 2, N)
        bs = band.reshape(nseg, 32, c, sy, n)
        # (nseg,1,32,C,sy,N) * (nseg,2,1,1,1,N) -> sum ax 0 -> (2,32,C,sy,N)
        band = jnp.sum(
            bs[:, None] * sel1[:, :, None, None, None, :], axis=0
        ).reshape(64, c, sy, n)
        bx = bx - seg0 * 32  # in [0, 32)
        wp = 64

    kx = jnp.arange(wp, dtype=jnp.int32)[:, None, None]
    tx = bx[None, None, :] + jnp.arange(sx, dtype=jnp.int32)[None, :, None]
    sel = (kx == tx).astype(img.dtype)  # (Wp, sx, N)
    # (Wp, sx, 1, 1, N) * (Wp, 1, C, sy, N) -> sum ax 0 -> (sx, C, sy, N)
    return jnp.sum(sel[:, :, None, None, :] * band[:, None, :, :, :], axis=0)


def extract_bilinear_windows(
    img_flat: jnp.ndarray,
    pt: jnp.ndarray,       # (N, 2) float query positions (unpadded coords)
    psz: int,
    pad: int,
    wp: int,
    offsets_p1: jnp.ndarray,  # (psz+1, psz+1) offsets
) -> jnp.ndarray:
    """Bilinear patch extraction (getPatchStaticBil, patch.cpp:334-402).

    Returns (N, psz, psz, C).  Weight vector is constant per patch:
      we0 = rx*ry       at (cy+j,   cx+i)
      we1 = (1-rx)*ry   at (cy+j,   cx+i-1)
      we2 = rx*(1-ry)   at (cy+j-1, cx+i)
      we3 = (1-rx)(1-ry) at (cy+j-1, cx+i-1)
    with cx = floor(x)+1 (== ceil(x+1e-5)), rx = x - floor(x).
    """
    lb = -(psz // 2)
    fx = jnp.floor(pt[:, 0])
    fy = jnp.floor(pt[:, 1])
    rx = (pt[:, 0] - fx)[:, None, None, None]
    ry = (pt[:, 1] - fy)[:, None, None, None]
    base_x = fx.astype(jnp.int32) + 1 + lb - 1 + pad
    base_y = fy.astype(jnp.int32) + 1 + lb - 1 + pad
    w = gather_windows(img_flat, base_y, base_x, offsets_p1, wp)  # (N, psz+1, psz+1, C)
    w00 = rx * ry
    w01 = (1.0 - rx) * ry
    w10 = rx * (1.0 - ry)
    w11 = (1.0 - rx) * (1.0 - ry)
    return (
        w00 * w[:, 1:, 1:]
        + w01 * w[:, 1:, :-1]
        + w10 * w[:, :-1, 1:]
        + w11 * w[:, :-1, :-1]
    )
