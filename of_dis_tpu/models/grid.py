"""Static per-level patch-grid geometry.

The reference builds this geometry inside PatGridClass
(patchgrid.cpp:31-76): patch centers on a regular grid with spacing
`steps`, centered offsets, index i = x*noph + y.  All of it depends only on
(level width, level height, config), so the TPU build precomputes it in
numpy once per level shape and bakes it into the jitted program as
constants: patch centers, the densification footprint index map, and the
coarser-flow init gather indices.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import numpy as np

from ..config import DISConfig


class LevelGeometry(NamedTuple):
    w: int
    h: int
    nopw: int
    noph: int
    n_patches: int
    pt_ref: np.ndarray        # (N, 2) float32 patch centers (x, y)
    coarse_idx: np.ndarray    # (N,) int32 flat index into the (h//2, w//2) coarser flow


def _grid_centers(w: int, h: int, steps: int) -> tuple[int, int, np.ndarray]:
    """Patch centers (patchgrid.cpp:42-75): nop* = ceil(dim/steps), offsets
    center the grid, and index i = x*noph + y (column-major over x)."""
    nopw = int(math.ceil(w / steps))
    noph = int(math.ceil(h / steps))
    offsetw = int(math.floor((w - (nopw - 1) * steps) / 2))
    offseth = int(math.floor((h - (noph - 1) * steps) / 2))
    xs = np.arange(nopw) * steps + offsetw
    ys = np.arange(noph) * steps + offseth
    # i = x * noph + y ordering
    px = np.repeat(xs, noph)
    py = np.tile(ys, nopw)
    return nopw, noph, np.stack([px, py], axis=1).astype(np.float32)


@lru_cache(maxsize=64)
def _level_geometry_cached(w: int, h: int, steps: int, psz: int) -> LevelGeometry:
    nopw, noph, pt_ref = _grid_centers(w, h, steps)
    n = pt_ref.shape[0]
    # Coarser-init lookup (InitializeFromCoarserOF, patchgrid.cpp:195-211):
    # p_init = 2 * flow_prev[floor(y/2) * (w//2) + floor(x/2)].  When a level
    # dimension is odd (possible at the coarsest level, whose init-flow grid
    # is floor-halved — oflow.cpp:32-35 only guarantees divisibility by
    # 2^sc_f), floor(x/2) can equal w//2 and must clamp to the last column
    # instead of silently wrapping into the next row.
    cw, ch = max(w // 2, 1), max(h // 2, 1)
    cx = np.minimum((pt_ref[:, 0] // 2).astype(np.int64), cw - 1)
    cy = np.minimum((pt_ref[:, 1] // 2).astype(np.int64), ch - 1)
    coarse_idx = cy * cw + cx
    return LevelGeometry(
        w=w,
        h=h,
        nopw=nopw,
        noph=noph,
        n_patches=n,
        pt_ref=pt_ref,
        coarse_idx=coarse_idx.astype(np.int32),
    )


def level_geometry(w: int, h: int, cfg: DISConfig) -> LevelGeometry:
    return _level_geometry_cached(w, h, cfg.steps, cfg.patch_size)
