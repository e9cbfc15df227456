"""Batched inverse-compositional Gauss-Newton patch search (DIS step 3).

TPU-native redesign of the reference per-patch optimizer
(PatClass, patch.cpp:57-402) and its OpenMP dispatch loop
(PatGridClass::Optimize, patchgrid.cpp:134-141):

  - Patches are a BATCH AXIS, not objects.  All N patches of a pyramid level
    live in (N, ...) tensors; the per-patch while-loop becomes a fixed-trip
    `lax.fori_loop(max_iter)` whose updates are masked by a per-patch
    convergence flag.  This reproduces the reference's per-patch early-exit
    state machine exactly (patch.cpp:158-284) while keeping control flow
    static for XLA.
  - The hot bilinear patch extraction exploits the outlier reset rule
    (patch.cpp:198-208): a patch never moves more than psz/2 from its START
    position, so its entire search is confined to a static (2psz+2)^2 window
    around pt_st.  The windows are gathered from HBM ONCE per level; every
    GN iteration then samples inside its window with a separable two-hot
    row/column reduction laid out patches-last — (C, psz, psz, N) tensors with
    the patch axis on VPU lanes — so the per-iteration cost is
    O(N*psz*S^2*C) fused VPU FMAs, independent of the image size.
  - The 2x2 Hessian solve (patch.cpp:176-184, Eigen LLT) becomes the
    closed-form inverse; for stereo it is a scalar divide.

Deviation from the reference (documented): when a patch's *initial* position
is already out of bounds, the reference sets pdiff = template but leaves
pweight uninitialized heap memory (patch.cpp:135-141), which feeds garbage
weights into densification.  We define pweight = |loss(template)| instead —
deterministic and consistent with the loss.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..config import DISConfig
from ..ops.interp import (
    extract_grid_patches,
    extract_int_matmul,
    gather_windows_rows,
)

# Below this many padded pixels per level, patch extraction runs as MXU
# matmuls (ops/interp.py: extract_*_matmul) instead of an element gather —
# the gather is latency-bound on TPU (~0.3 ms regardless of size) while the
# one-hot matmul costs FLOPs proportional to N*psz*Hp*Wp.  The crossover on
# v5e sits around 40k pixels (levels up to ~256 px wide at Sintel aspect).
MATMUL_EXTRACT_MAX_PIXELS = int(os.environ.get("OF_DIS_MATMUL_EXTRACT_MAX_PIXELS", 40000))


class PatchTemplates(NamedTuple):
    """Per-patch template data computed once per level (patch.cpp:57-88).

    When `hes` is None (deferred mode — levels the fused whole-level kernel
    handles), tmp/dx/dy hold the PADDED LEVEL IMAGES instead: the kernel
    extracts templates and Hessians itself, in VMEM, with zero XLA-side
    extraction or relayout work (measured: the XLA template pipeline cost
    ~0.4 ms/call at op1 B=32).  The sentinel is `hes is None` rather than a
    bool field because a None subtree survives jit boundaries (a bool
    NamedTuple field is a pytree LEAF and would come back traced)."""

    tmp: jnp.ndarray     # (N, psz, psz, C) templates, or (Hp, Wp, C) im_a
    dx: jnp.ndarray      # (N, psz, psz, C) x-gradients, or (Hp, Wp, C) dx_a
    dy: jnp.ndarray      # (N, psz, psz, C) y-gradients, or (Hp, Wp, C) dy_a
    hes: jnp.ndarray     # (N, 3|1) [H00, H01, H11] / [H00]; None if deferred


class SearchResult(NamedTuple):
    p: jnp.ndarray        # (N, nop) final displacement parameters
    pt: jnp.ndarray       # (N, 2) final query position (pt_ref + displacement)
    pweight: jnp.ndarray  # (N, psz, psz, C) absolute residual image, or None
                          # when absw was produced in-kernel (fused level path)
    converged: jnp.ndarray  # (N,) bool
    absw: jnp.ndarray = None  # (N, psz*psz) densification weights
                              # 1/sum_c max(minerrval, |pdiff|), or None


def _mean_normalize(patch: jnp.ndarray, enabled: bool) -> jnp.ndarray:
    """Subtract the patch mean over all values (patch.cpp:330-331, 400-401)."""
    if not enabled:
        return patch
    return patch - jnp.mean(patch, axis=(1, 2, 3), keepdims=True)


def _loss(diff: jnp.ndarray, cfg: DISConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual transform + weight image (LossComputeErrorImage, patch.cpp:223-262).

    Returns (pdiff, pweight); pweight = |pdiff| in all cases.
    """
    if cfg.cost == 0:  # L2
        pd = diff
    elif cfg.cost == 1:  # L1: sign(d) * sqrt(|d|)  (v1.0.1-fixed formula)
        pd = jnp.sign(diff) * jnp.sqrt(jnp.abs(diff))
    elif cfg.cost == 2:  # pseudo-Huber, b = normoutlier (oflow.h:63)
        bsq = cfg.normoutlier * cfg.normoutlier
        pd = jnp.sign(diff) * jnp.sqrt(
            2.0 * bsq * (jnp.sqrt(1.0 + diff * diff / bsq) - 1.0)
        )
    else:
        raise ValueError(f"unhandled cost {cfg.cost}")
    return pd, jnp.abs(pd)


def _use_matmul_extract(img: jnp.ndarray) -> bool:
    return img.shape[0] * img.shape[1] <= MATMUL_EXTRACT_MAX_PIXELS


def build_templates(
    im_a: jnp.ndarray,     # (Hp, Wp, C) padded reference image (or local tile)
    dx_a: jnp.ndarray,
    dy_a: jnp.ndarray,
    pt_ref: jnp.ndarray,
    cfg: DISConfig,
    pad: int,
    tile_origin=None,      # (oy, ox): im_a is a tile whose row/col 0 sits at
                           # this offset of the global padded image (spatial
                           # 2-D tiling; parallel/spatial.py)
) -> PatchTemplates:
    """Template extraction + Hessian, once per level (InitializePatch,
    patch.cpp:57-88).  Gradients are NOT mean-normalized; the Hessian uses
    raw template gradients only."""
    psz = cfg.patch_size
    if tile_origin is not None:
        # Work in tile-local coordinates: pt stays global; shift the frame.
        oy, ox = tile_origin
        pt_loc = pt_ref - jnp.stack(
            [jnp.asarray(ox, jnp.float32), jnp.asarray(oy, jnp.float32)]
        )[None, :]
        tmp = extract_int_matmul(im_a, pt_loc, psz, pad)
        dx = extract_int_matmul(dx_a, pt_loc, psz, pad)
        dy = extract_int_matmul(dy_a, pt_loc, psz, pad)
    elif _use_matmul_extract(im_a):
        tmp = extract_int_matmul(im_a, pt_ref, psz, pad)
        dx = extract_int_matmul(dx_a, pt_ref, psz, pad)
        dy = extract_int_matmul(dy_a, pt_ref, psz, pad)
    else:
        # Large level.  Template positions are the STATIC patch grid
        # (patchgrid.cpp:42-75: offset + steps*i), so when pt_ref is the
        # full grid (callers like parallel/spatial.py pass patch SUBSETS —
        # detected by the static count mismatch) the extraction is one
        # identity-filter conv HLO with no gathers at all.
        from .grid import level_geometry

        hp, wp = im_a.shape[:2]
        geo = level_geometry(wp - 2 * pad, hp - 2 * pad, cfg)
        lb = -(psz // 2)
        if geo.n_patches == pt_ref.shape[0]:
            y0 = int(geo.pt_ref[0, 1]) + pad + lb
            x0 = int(geo.pt_ref[0, 0]) + pad + lb

            def ext(img):
                return extract_grid_patches(
                    img, y0, x0, cfg.steps, geo.noph, geo.nopw, psz
                )
        else:
            # Chunked row-gather fallback (sy = sx = psz, integer bases) —
            # element gathers at 10 ns/element would dominate here.
            # (Channel-stacking im/dx/dy into one C=3 gather measures 2x
            # SLOWER than three C=1 gathers on v5e.)
            cy = jnp.floor(pt_ref[:, 1] + 0.5).astype(jnp.int32) + pad + lb
            cx = jnp.floor(pt_ref[:, 0] + 0.5).astype(jnp.int32) + pad + lb

            def ext(img):
                wnd = gather_windows_rows(img, cy, cx, psz, psz)  # (i, C, j, N)
                return jnp.transpose(wnd, (3, 2, 0, 1))  # (N, j, i, C)

        tmp = ext(im_a)
        dx = ext(dx_a)
        dy = ext(dy_a)
    tmp = _mean_normalize(tmp, cfg.patch_norm)
    h00 = jnp.sum(dx * dx, axis=(1, 2, 3))
    if cfg.nop == 2:
        h01 = jnp.sum(dx * dy, axis=(1, 2, 3))
        h11 = jnp.sum(dy * dy, axis=(1, 2, 3))
        # Singular guard: if det == 0, bump the diagonal (patch.cpp:78-82).
        det = h00 * h11 - h01 * h01
        bump = jnp.where(det == 0.0, 1e-10, 0.0)
        hes = jnp.stack([h00 + bump, h01, h11 + bump], axis=1)
    else:
        bump = jnp.where(h00 == 0.0, 1e-10, 0.0)
        hes = (h00 + bump)[:, None]
    return PatchTemplates(tmp=tmp, dx=dx, dy=dy, hes=hes)


def _param_to_pt(pt_ref: jnp.ndarray, p: jnp.ndarray, nop: int) -> jnp.ndarray:
    """paramtopt (patch.cpp:214-221): flow moves (x, y); stereo moves x only."""
    if nop == 2:
        return pt_ref + p
    return jnp.stack([pt_ref[:, 0] + p[:, 0], pt_ref[:, 1]], axis=1)


def _out_of_bounds(pt: jnp.ndarray, w: int, h: int, psz: int) -> jnp.ndarray:
    """Valid-region check with bounds tmp_lb = -psz/2, tmp_ub* = dim+psz/2-2
    (oflow.cpp:147-149, patch.cpp:135-136, 199-202)."""
    lb = -float(psz) / 2.0
    ubw = float(w + psz // 2 - 2)
    ubh = float(h + psz // 2 - 2)
    return (pt[:, 0] < lb) | (pt[:, 1] < lb) | (pt[:, 0] > ubw) | (pt[:, 1] > ubh)


def optimize_level(
    im_b: jnp.ndarray,     # (Hp, Wp, C) padded target image
    tmpl: PatchTemplates,
    pt_ref: jnp.ndarray,   # (N, 2)
    p_init: jnp.ndarray,   # (N, nop)
    cfg: DISConfig,
    w: int,
    h: int,
    pad: int,
    camlr: int | None = None,
    tile=None,  # (oy, ox, hp_g, wp_g): im_b is a local tile whose row/col 0
                # sits at (oy, ox) of the (hp_g, wp_g) global padded image
                # (spatial 2-D tiling; parallel/spatial.py).  All window
                # bases/clips follow GLOBAL semantics; only the gather is
                # offset into the tile.
) -> SearchResult:
    """Run all patches of one level to convergence (PatClass::OptimizeIter +
    OptimizeStart + OptimizeComputeErrImg, patch.cpp:119-284), as a fixed
    `max_iter`-trip loop with per-patch masking.

    The whole search runs inside per-patch local windows (module docstring):
    every position a patch can reach satisfies |pt - pt_st| <= psz/2
    componentwise (outlier reset, patch.cpp:198-208) and bilinear taps span
    psz+1 px, so a window of S = 2*psz+2 rows/cols around pt_st covers every
    extraction exactly.  Windows are gathered once; iterations never touch
    the full image again.

    camlr overrides cfg.camlr for the stereo sign clamp — the backward grid
    of the fb-merge pass sees the flipped camera (cpr.camlr = 1,
    oflow.cpp:154-157)."""
    if camlr is None:
        camlr = cfg.camlr
    psz = cfg.patch_size
    nop = cfg.nop
    novals = float(cfg.novals)
    n = pt_ref.shape[0]
    c = im_b.shape[2]
    if tile is None:
        hp, wp = im_b.shape[:2]
    else:
        hp, wp = tile[2], tile[3]
    lb = -(psz // 2)
    sy = min(2 * psz + 2, hp)
    sx = min(2 * psz + 2, wp)

    from ..ops import pallas_kernels as pk
    from ..ops.pallas_kernels import (
        gn_pallas_applicable,
        gn_search_pallas,
        level_gn_applicable,
        level_search_pallas,
    )

    if tile is None and level_gn_applicable(hp, wp, c, n, psz, sy, sx):
        # Whole-level fused kernel: template build (when deferred), window
        # bases, window build (MXU one-hot row fetch + hierarchical column
        # block-select) and the GN state machine in ONE program — the level
        # images never re-enter HBM and the ~10-HLO window chain disappears
        # (its launch gaps were ~45% of op1 device wall).  Densification
        # weights also come back directly.
        if tmpl.hes is None:
            imgs = (
                jnp.transpose(tmpl.tmp, (2, 0, 1)),
                jnp.transpose(tmpl.dx, (2, 0, 1)),
                jnp.transpose(tmpl.dy, (2, 0, 1)),
                jnp.transpose(im_b, (2, 0, 1)),
            )
            tmpl_args = None
        else:
            imgs = (jnp.transpose(im_b, (2, 0, 1)),)
            tmpl_args = (
                jnp.transpose(tmpl.tmp, (2, 3, 1, 0)),
                jnp.transpose(tmpl.dx, (2, 3, 1, 0)),
                jnp.transpose(tmpl.dy, (2, 3, 1, 0)),
                tmpl.hes.T if nop == 2 else jnp.concatenate(
                    [tmpl.hes.T, jnp.zeros((2, n), jnp.float32)], axis=0
                ),
            )
        p_t, pt_t, aw_t, conv = level_search_pallas(
            imgs, tmpl_args, pt_ref.T, p_init.T,
            psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
            hp=hp, wp=wp, cfg=cfg, camlr=camlr,
        )
        return SearchResult(
            p=p_t.T, pt=pt_t.T, pweight=None, converged=conv, absw=aw_t.T
        )

    # ---- OptimizeStart (patch.cpp:120-156) ----
    p_in = p_init
    p_iter = p_init
    pt_iter = _param_to_pt(pt_ref, p_iter, nop)
    pt_st = pt_iter
    oob0 = _out_of_bounds(pt_iter, w, h, psz)

    # Per-patch window bases (padded coords).  Clamping keeps the gather in
    # range; for in-bounds lanes every needed tap still lands inside the
    # clamped window (needed rows span at most hp and sit within S of base).
    by = jnp.clip(
        jnp.floor(pt_st[:, 1]).astype(jnp.int32) + lb - psz // 2 + pad, 0, hp - sy
    )
    bx = jnp.clip(
        jnp.floor(pt_st[:, 0]).astype(jnp.int32) + lb - psz // 2 + pad, 0, wp - sx
    )
    if tile is None:
        by_g, bx_g = by, bx
    else:
        # Gather from the local tile; extraction offsets keep the global
        # frame (by/bx feed `oy = floor(pt) + lb + pad - by`, which is
        # origin-invariant as long as by and pt share a frame).
        by_g = jnp.clip(by - tile[0], 0, im_b.shape[0] - sy)
        bx_g = jnp.clip(bx - tile[1], 0, im_b.shape[1] - sx)
        by = by_g + tile[0]
        bx = bx_g + tile[1]
    use_gn = gn_pallas_applicable(sy, sx, psz, c, n)
    # Band mode: hand the kernel the coarse 64-wide column band and let it
    # run the fine select in VMEM (tile path excluded: local tiles can be
    # narrower than one band).  Requires band-local offsets == bx % 32,
    # which only holds in the global frame.
    band = use_gn and tile is None and pk.gn_band_applicable(sx, im_b.shape[1])
    win = gather_windows_rows(
        im_b, by_g, bx_g, sy, sx, return_band=band
    )  # (sx|64, C, sy, N) — patches on lanes

    if use_gn:
        # Fused Pallas kernel: the whole state machine in VMEM, tiled over
        # the patch axis.  Patch-pixel tensors go in (psz_i, C, psz_j, N)
        # layout (the kernel's horizontal block-select lands there).
        Tp = jnp.transpose(tmpl.tmp, (2, 3, 1, 0))
        DXp = jnp.transpose(tmpl.dx, (2, 3, 1, 0))
        DYp = jnp.transpose(tmpl.dy, (2, 3, 1, 0))
        if nop == 2:
            hes3 = tmpl.hes.T
        else:
            hes3 = jnp.concatenate(
                [tmpl.hes.T, jnp.zeros((2, n), jnp.float32)], axis=0
            )
        p_t, pt_t, pw_t, conv = gn_search_pallas(
            win, Tp, DXp, DYp, hes3, pt_ref.T, p_init.T,
            by[None, :], bx[None, :],
            psz=psz, sy=sy, sx=sx, nop=nop, c=c, pad=pad, w=w, h=h,
            cfg=cfg, camlr=camlr, band_select=band,
        )
        return SearchResult(
            p=p_t.T,
            pt=pt_t.T,
            pweight=jnp.transpose(pw_t, (3, 2, 0, 1)),
            converged=conv,
        )

    # Templates in patches-last layout (transpose once per level).
    T = jnp.transpose(tmpl.tmp, (3, 1, 2, 0))   # (C, psz_j, psz_i, N)
    DX = jnp.transpose(tmpl.dx, (3, 1, 2, 0))
    DY = jnp.transpose(tmpl.dy, (3, 1, 2, 0))

    if nop == 2:
        h00, h01, h11 = tmpl.hes[:, 0], tmpl.hes[:, 1], tmpl.hes[:, 2]
        det = h00 * h11 - h01 * h01
    else:
        h00 = tmpl.hes[:, 0]

    jj = jnp.arange(psz, dtype=jnp.int32)
    ky = jnp.arange(sy, dtype=jnp.int32)
    kx = jnp.arange(sx, dtype=jnp.int32)

    def extract(pt):
        """Bilinear patch at pt from the per-patch windows: separable two-hot
        row/col reduction (getPatchStaticBil semantics, patch.cpp:334-402).
        Returns (C, psz_j, psz_i, N)."""
        fy = jnp.floor(pt[:, 1])
        fx = jnp.floor(pt[:, 0])
        ry = (pt[:, 1] - fy)[None, None, :]
        rx = (pt[:, 0] - fx)[None, None, :]
        oy = fy.astype(jnp.int32) + lb + pad - by  # (N,) in [0, sy-psz-1]
        ox = fx.astype(jnp.int32) + lb + pad - bx
        ty = oy[None, None, :] + jj[None, :, None]             # (1, psz, N)
        RY = jnp.where(ky[:, None, None] == ty, 1.0 - ry, 0.0) + jnp.where(
            ky[:, None, None] == ty + 1, ry, 0.0
        )  # (sy, psz_j, N)
        tx = ox[None, None, :] + jj[None, :, None]
        CX = jnp.where(kx[:, None, None] == tx, 1.0 - rx, 0.0) + jnp.where(
            kx[:, None, None] == tx + 1, rx, 0.0
        )  # (sx, psz_i, N)
        # rows: (sx,C,sy,1,N)*(1,1,sy,psz_j,N) -> sum ax 2 -> (sx, C, psz_j, N)
        rows = jnp.sum(win[:, :, :, None, :] * RY[None, None, :, :, :], axis=2)
        # cols: (sx,C,psz_j,1,N)*(sx,1,1,psz_i,N) -> sum ax 0 -> (C, psz_j, psz_i, N)
        return jnp.sum(rows[:, :, :, None, :] * CX[:, None, None, :, :], axis=0)

    def residual(pt):
        raw = extract(pt)
        if cfg.patch_norm:
            raw = raw - jnp.mean(raw, axis=(0, 1, 2), keepdims=True)
        if cfg.cost == 10:
            # Real NCC-style cost (README's costfct 10 — silent no-op in the
            # reference, patch.cpp:230-262; intentional fidelity-plus).
            tn = jnp.sqrt(jnp.sum(T * T, axis=(0, 1, 2), keepdims=True))
            rn = jnp.sqrt(jnp.sum(raw * raw, axis=(0, 1, 2), keepdims=True))
            diff = raw * (tn / jnp.maximum(rn, 1e-10)) - T
            return diff, jnp.abs(diff)
        return _loss(raw - T, cfg)

    # Invalid-start lanes: pdiff = template (patch.cpp:139); pweight defined
    # as |loss(template)| (see module docstring).
    tmpl_pd, tmpl_pw = (T, jnp.abs(T)) if cfg.cost == 10 else _loss(T, cfg)

    dp_thresh_sq = cfg.dp_thresh * cfg.dp_thresh  # squared once (oflow.cpp:88)
    outlier_sq = cfg.outlier_thresh * cfg.outlier_thresh

    # The loop runs max_iter+1 trips; trip 0 IS OptimizeStart
    # (patch.cpp:120-156) — delta_p forced to 0, no clamp/reset, start-rule
    # convergence — so XLA compiles exactly ONE extraction for the whole
    # state machine instead of a separate out-of-loop copy.
    pdiff = jnp.zeros((c, psz, psz, n), jnp.float32)
    pweight = jnp.zeros((c, psz, psz, n), jnp.float32)
    mares = jnp.full((n,), 1e5, dtype=jnp.float32)
    mares_old = jnp.full((n,), 1e5, dtype=jnp.float32)
    dpsq = jnp.full((n,), 1e-10, dtype=jnp.float32)
    dpsq_init = jnp.full((n,), 1e-10, dtype=jnp.float32)
    cnt = jnp.zeros((n,), dtype=jnp.int32)
    converged = jnp.zeros((n,), dtype=bool)

    state = (p_iter, pt_iter, pdiff, pweight, mares, mares_old, dpsq, dpsq_init, cnt, converged)

    def body(i, state):
        (p_iter, pt_iter, pdiff, pweight, mares, mares_old, dpsq, dpsq_init, cnt, converged) = state
        first = i == 0
        active = ~converged
        cnt_n = jnp.where(first, 0, cnt + 1)

        # delta_p = H^-1 (J^T pdiff) (patch.cpp:176-184).
        b0 = jnp.sum(DX * pdiff, axis=(0, 1, 2))
        if nop == 2:
            b1 = jnp.sum(DY * pdiff, axis=(0, 1, 2))
            du = (h11 * b0 - h01 * b1) / det
            dv = (h00 * b1 - h01 * b0) / det
            delta_p = jnp.stack([du, dv], axis=1)
        else:
            delta_p = (b0 / h00)[:, None]
        delta_p = jnp.where(first, 0.0, delta_p)
        p_new = p_iter - delta_p
        if cfg.mode == "stereo":
            # Disparity sign clamp by camera (patch.cpp:188-193); the start
            # trip leaves p_init unclamped like OptimizeStart.
            clamped = jnp.minimum(p_new, 0.0) if camlr == 0 else jnp.maximum(p_new, 0.0)
            p_new = jnp.where(first, p_new, clamped)
        pt_new = _param_to_pt(pt_ref, p_new, nop)

        # Outlier / bounds reset (patch.cpp:198-208).
        moved = jnp.sum((pt_st - pt_new) ** 2, axis=1) > outlier_sq
        reset = ~first & (moved | _out_of_bounds(pt_new, w, h, psz))
        p_new = jnp.where(reset[:, None], p_in, p_new)
        pt_new = _param_to_pt(pt_ref, p_new, nop)

        # OptimizeComputeErrImg (patch.cpp:264-284) — runs even after a reset.
        pd_new, pw_new = residual(pt_new)
        oob_start = first & oob0
        m0 = oob_start[None, None, None, :]
        pd_new = jnp.where(m0, tmpl_pd, pd_new)
        pw_new = jnp.where(m0, tmpl_pw, pw_new)
        dpsq_n = jnp.where(first, 1e-10, jnp.sum(delta_p * delta_p, axis=1))
        dpsq_init_n = jnp.where(cnt_n == 1, dpsq_n, dpsq_init)
        mares_old_n = jnp.where(first, 1e5, mares)
        mares_n = jnp.sum(pw_new, axis=(0, 1, 2)) / novals
        mares_n = jnp.where(oob_start, 1e5, mares_n)

        keep_going = (
            (cnt_n < cfg.max_iter)
            & (mares_n > cfg.res_thresh)
            & ((cnt_n < cfg.min_iter) | (dpsq_n / dpsq_init_n >= dp_thresh_sq))
            & ((cnt_n < cfg.min_iter) | (mares_n / mares_old_n <= cfg.dr_thresh))
        )
        conv_n = converged | reset | ~keep_going | oob_start

        am = active[:, None]
        am4 = active[None, None, None, :]
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

    state = jax.lax.fori_loop(0, cfg.max_iter + 1, body, state)
    p_iter, pt_iter, _, pweight, _, _, _, _, _, converged = state
    pweight = jnp.transpose(pweight, (3, 1, 2, 0))  # back to (N, psz_j, psz_i, C)
    return SearchResult(p=p_iter, pt=pt_iter, pweight=pweight, converged=converged)
