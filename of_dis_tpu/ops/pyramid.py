"""Image pyramid, gradients, resize, and padding ops.

TPU-native equivalent of the reference pyramid builder
(ConstructImgPyramide, run_dense.cpp:130-178) with exact OpenCV semantics for
the operations that shape the numerics:

  - 0.5x downscale = cv::resize(..., 0.5, 0.5, INTER_LINEAR).  For an exact
    half-scale, INTER_LINEAR's source coordinate (dst+0.5)*2-0.5 = 2*dst+0.5
    gives constant 0.5/0.5 taps, i.e. a 2x2 box average (run_dense.cpp:150).
  - Gradients = 3x3 cv::Sobel, scale 1/8, BORDER_DEFAULT (= reflect-101)
    (run_dense.cpp:156-157).
  - Per-level padding by `pad` pixels: replicate for images, zero for
    gradients (run_dense.cpp:163-177).
  - Input divisibility padding: replicate, floor(pad/2) before / ceil after
    (run_dense.cpp:298-311).
  - Final flow upscale = cv::resize INTER_LINEAR with half-pixel centers
    (run_dense.cpp:406-411).

All functions take channels-last float32 arrays (H, W, C) and are jit-safe
(static shapes only).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def downsample_half(img: jnp.ndarray) -> jnp.ndarray:
    """Exact cv::resize(0.5, INTER_LINEAR): 2x2 box average. Needs even H, W.

    Implemented as a 2x2/stride-2 reduce_window (average pool) — the
    factor-2 reshape formulation produces pathological TPU layouts.
    """
    h, w, c = img.shape
    if h % 2 or w % 2:
        raise ValueError(f"downsample_half needs even dims, got {h}x{w}")
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID"
    )
    return 0.25 * s


def _reflect101_pad(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 (gfedcb|abcdefgh|gfedcba), OpenCV's BORDER_DEFAULT."""
    return jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")


def sobel(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel dx, dy with scale 1/8 and reflect-101 borders.

    Matches cv::Sobel(src, CV_32F, 1, 0, 3, 1/8.0, 0, BORDER_DEFAULT)
    (run_dense.cpp:156-157).  Separable: smooth [1,2,1] x diff [-1,0,1].
    """
    p = _reflect101_pad(img, 1)
    # Horizontal passes
    diff_x = p[:, 2:] - p[:, :-2]          # (H+2, W, C)
    smooth_x = p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]
    # Vertical passes
    dx = (diff_x[:-2] + 2.0 * diff_x[1:-1] + diff_x[2:]) * 0.125
    dy = (smooth_x[2:] - smooth_x[:-2]) * 0.125
    return dx, dy


def gradient_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient-magnitude input image (reference SELECTCHANNEL==2,
    run_dense.cpp:138-147): sqrt(sobel_dx^2 + sobel_dy^2)."""
    dx, dy = sobel(img)
    return jnp.sqrt(dx * dx + dy * dy)


def pad_replicate(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")


def pad_zero(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="constant")


def divisibility_padding(h: int, w: int, divisor: int) -> Tuple[int, int, int, int]:
    """(top, bottom, left, right) replicate-padding so divisor | H and W
    (run_dense.cpp:298-311): floor(pad/2) before, ceil(pad/2) after."""
    padw = (-w) % divisor
    padh = (-h) % divisor
    return (padh // 2, padh - padh // 2, padw // 2, padw - padw // 2)


def pad_to_divisible(img: jnp.ndarray, divisor: int) -> jnp.ndarray:
    t, b, l, r = divisibility_padding(img.shape[0], img.shape[1], divisor)
    if t or b or l or r:
        img = jnp.pad(img, ((t, b), (l, r), (0, 0)), mode="edge")
    return img


def build_pyramid(
    img: jnp.ndarray, n_levels: int, pad: int, gradmag_input: bool = False,
    first_level: int = 0,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], List[jnp.ndarray]]:
    """Per-level (padded image, padded dx, padded dy), index 0 = finest.

    Level 0 is the input (or its gradient magnitude); level i is the 0.5x
    downscale of level i-1.  Images are replicate-padded by `pad`, gradients
    zero-padded (ConstructImgPyramide, run_dense.cpp:130-178).

    Levels finer than `first_level` (unused when the finest computed scale
    is sc_l > 0, e.g. op1/op2 never touch levels 0-2) are NOT materialized:
    their list slots are None and the downsample chain 0 -> first_level
    collapses into ONE 2^k-box average — iterated non-overlapping 2x2 box
    averages compose to exactly the 2^k uniform box (equal up to float
    reassociation), and the single reduce_window writes ~1/4^k of the
    intermediate HBM traffic and drops ~8 HLOs per skipped level.
    """
    levels = []
    cur = gradient_magnitude(img) if gradmag_input else img
    for i in range(n_levels):
        if i < first_level:
            levels.append(None)
            continue
        if i == first_level and i > 0:
            k = 1 << i
            if cur.shape[0] % k or cur.shape[1] % k:
                raise ValueError(f"dims {cur.shape[:2]} not divisible by 2^{i}")
            s = jax.lax.reduce_window(
                cur, 0.0, jax.lax.add, (k, k, 1), (k, k, 1), "VALID"
            )
            cur = s * (1.0 / (k * k))
        elif i > 0:
            cur = downsample_half(cur)
        levels.append(cur)
    imgs, dxs, dys = [], [], []
    for lv in levels:
        if lv is None:
            imgs.append(None)
            dxs.append(None)
            dys.append(None)
            continue
        dx, dy = sobel(lv)
        imgs.append(pad_replicate(lv, pad))
        dxs.append(pad_zero(dx, pad))
        dys.append(pad_zero(dy, pad))
    return imgs, dxs, dys


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::resize INTER_LINEAR with half-pixel centers (float path).

    src = (dst + 0.5) * (in/out) - 0.5, taps clamped to the image
    (run_dense.cpp:406-411 uses this for the final flow upscale).
    """
    in_h, in_w, c = img.shape
    sy = in_h / out_h
    sx = in_w / out_w
    fy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    fx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, in_h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, in_w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    wy = jnp.clip(fy - y0.astype(jnp.float32), 0.0, 1.0)[:, None, None]
    wx = jnp.clip(fx - x0.astype(jnp.float32), 0.0, 1.0)[None, :, None]
    r0 = img[y0]
    r1 = img[y1]
    top = r0[:, x0] * (1 - wx) + r0[:, x1] * wx
    bot = r1[:, x0] * (1 - wx) + r1[:, x1] * wx
    return top * (1 - wy) + bot * wy
