"""Flow visualization (Middlebury color wheel).

Replaces the reference's commented-out DISVISUAL debug display
(oflow.cpp:307-335, patchgrid.cpp:143-193) with the standard flow-to-color
encoding, so flow fields can be inspected as PNGs.
"""

from __future__ import annotations

import numpy as np


def _color_wheel() -> np.ndarray:
    """Standard Middlebury 55-color wheel."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    n = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((n, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = _color_wheel()


def flow_to_color(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 Middlebury color coding."""
    u = np.asarray(flow[..., 0], np.float64)
    v = np.asarray(flow[..., 1], np.float64)
    rad = np.sqrt(u * u + v * v)
    if max_flow is None:
        max_flow = max(rad.max(), 1e-9)
    u, v = u / max_flow, v / max_flow
    rad = np.sqrt(u * u + v * v)
    a = np.arctan2(-v, -u) / np.pi
    n = _WHEEL.shape[0]
    fk = (a + 1.0) / 2.0 * (n - 1)
    k0 = np.floor(fk).astype(int) % n
    k1 = (k0 + 1) % n
    f = (fk - np.floor(fk))[..., None]
    col = (1 - f) * _WHEEL[k0] / 255.0 + f * _WHEEL[k1] / 255.0
    small = rad[..., None] <= 1
    col = np.where(small, 1 - rad[..., None] * (1 - col), col * 0.75)
    return (col * 255).astype(np.uint8)


def disparity_to_gray(disp: np.ndarray) -> np.ndarray:
    """(H, W) disparity -> uint8 grayscale, scaled to |disp| range."""
    d = np.abs(np.asarray(disp, np.float64))
    m = max(d.max(), 1e-9)
    return (d / m * 255).astype(np.uint8)
