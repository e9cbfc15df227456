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

from functools import partial

import jax.numpy as jnp
import numpy as np


def window_offsets(win: int, wp: int) -> jnp.ndarray:
    """Static (win, win) flat offsets into a row-major (Hp, Wp) image."""
    oy = np.arange(win, dtype=np.int64)[:, None]
    ox = np.arange(win, dtype=np.int64)[None, :]
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
