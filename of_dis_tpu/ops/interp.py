"""Patch-window gather + bilinear interpolation primitives.

The reference extracts patches with pointer walks (patch.cpp:286-402).  The
TPU-native formulation treats all N patches of a level as one batch and
fetches their windows gather-free where possible:

  - extract_int_matmul: integer template windows as one-hot MXU matmuls
    (getPatchStaticNNGrad, patch.cpp:286-332), for small levels.
  - gather_windows_rows: per-patch (sy, sx) search windows, patches-last.
    Whole-row fetch (one-hot matmul on small levels / chunked row gather on
    large ones) + two-stage one-hot column select.  Per-iteration bilinear
    sampling inside these windows lives in models/inverse_search.py; the
    reference computes taps from ceil(x + 1e-5)/floor(x), and since
    ceil(x+eps) == floor(x)+1 for all inputs the optimizer produces, the
    two-hot weights use cx = floor(x)+1 directly.

Images are padded by `pad` on each side; the optimizer's bounds checks
(patch.cpp:198-208) keep every window inside the padded array.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


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


def extract_grid_patches(
    img: jnp.ndarray,   # (Hp, Wp, C) padded level image
    y0: int,            # static top-left row of patch (i=0, j=0), padded coords
    x0: int,
    steps: int,
    noph: int,
    nopw: int,
    psz: int,
) -> jnp.ndarray:
    """Static regular-grid patch extraction: (N, psz, psz, C), N x-major
    (n = i*noph + j, matching models/grid.py).

    Template positions are data-INDEPENDENT (the patch grid of
    patchgrid.cpp:42-75 is offset + steps*i), so on large levels the
    row-gather can be replaced by ONE conv_general_dilated_patches HLO: an
    identity-filter convolution the MXU executes directly.  With HIGHEST
    precision the 0/1 filter makes it bit-exact (each output sums exactly
    one unscaled input; verified on-device vs the gather path).  Measured
    (v5e, op3 finest level, 12825 patches x 3 arrays, B=4): 8.3 ms/call of
    chunked row takes -> ~0.4 ms.
    """
    c = img.shape[2]
    # Space-to-depth: split the subimage into (steps x steps) cells; patch
    # inner offset j factors as dj*steps + a, so every patch is the (d x d)
    # cell neighborhood of its grid point and the whole extraction is d^2
    # STATIC outer-dim slices of the cell grid — no conv (an identity-
    # filter conv starves the MXU at C=1: 18.5 ms/call for op3's three
    # template arrays), no gather (the chunked row take it replaced was
    # 8.3 ms/call).  One relayout in (cell split), one out (patches-last).
    d = -(-psz // steps)
    gj, gi = noph + d - 1, nopw + d - 1
    sub = jax.lax.slice(
        img, (y0, x0, 0), (y0 + gj * steps, x0 + gi * steps, c)
    )
    cells = sub.reshape(gj, steps, gi, steps, c)
    out = jnp.stack(
        [
            cells[dj : dj + noph, :, di : di + nopw]
            for dj in range(d)
            for di in range(d)
        ],
        axis=0,
    )  # (d*d, noph, a, nopw, b, C)
    out = out.reshape(d, d, noph, steps, nopw, steps, c)
    # (nopw, noph, j=(dj,a), i=(di,b), C)
    out = jnp.transpose(out, (4, 2, 0, 3, 1, 5, 6))
    out = out.reshape(noph * nopw, d * steps, d * steps, c)
    return out[:, :psz, :psz]


# Max patches whose full-width row band is materialized at once; larger
# grids (op3/op4 fine levels: 10k-50k patches) are built in lax.map chunks
# to bound the band at chunk*sy*Wp*C floats per (vmapped-batch) step.
GATHER_CHUNK = int(os.environ.get("OF_DIS_GATHER_CHUNK", 1024))

# FLOP ceiling for the one-hot-matmul band fetch.  Measured: raising it to
# cover the op1 finest level (1.4 GFLOP) made op1 13x SLOWER — the one-hot
# R matrix (Hp x sy*N, 86 MB at B=16) is bandwidth-heavy and the f32 MXU
# product loses badly to the segmented row take despite the saved transpose.
BAND_MATMUL_MAX_FLOPS = int(
    os.environ.get("OF_DIS_BAND_MATMUL_MAX_FLOPS", 20_000_000_000 // 32)
)

# Row-BLOCK take granularity for the wide-level window fetch: >1 fetches
# blk-row blocks (ceil((blk-1+sy-1)/blk)+1 takes per window instead of sy —
# the take is latency-bound per row) and selects the sy rows at offset
# by%blk in-register.  0/1 = per-row take.  Default 4 = the measured v5e
# optimum at op3 (67.5 Hz vs 60.0 per-row, 64.0 @2, 64.8 @8, 63.3 @16:
# fewer takes vs deeper where-chains + fetch inflation).
ROWBLOCK_TAKE = int(os.environ.get("OF_DIS_ROWBLOCK", 4))


def gather_windows_rows(
    img: jnp.ndarray,    # (Hp, Wp, C) padded level image
    by: jnp.ndarray,     # (N,) int32 top row per window, in [0, Hp-sy]
    bx: jnp.ndarray,     # (N,) int32 left col per window, in [0, Wp-sx]
    sy: int,
    sx: int,
    return_band: bool = False,
) -> jnp.ndarray:
    """Gather per-patch (sy, sx) windows, returned patches-last (sx, C, sy, N).

    Element gathers are pathological on TPU (~10 ns/element); whole-ROW
    gathers (or, for small levels, a one-hot MXU matmul) fetch the sy
    full-width rows of every window at once, then a fused one-hot reduce
    over Wp selects the sx columns (VPU, patches on lanes).

    return_band=True (requires sx <= 31 and Wp > 64) stops after the row
    take and returns the (64, C, sy, N) band instead: window n occupies
    band columns [bx_n % 32, bx_n % 32 + sx) (the 32-px segment stride
    makes this hold directly).  The fused GN kernel consumes this and runs
    the fine column select in VMEM (pallas_kernels.py band_select),
    skipping the one-hot multiply-reduce that was the largest XLA op left
    at op1's finest level (~10% device time, profile r3).
    """
    if return_band:
        assert sx <= 31 and img.shape[1] > 64
    n = by.shape[0]
    ow = 64 if return_band else sx
    hp, wp, c = img.shape
    # The segmented-image build for the wide branch is chunk-invariant:
    # construct it ONCE here so the lax.map below captures it as a loop
    # constant instead of re-deriving it inside every chunk iteration.
    nc = min(n, GATHER_CHUNK)
    use_wide = (sx <= 31 and wp > 96) and (
        return_band or nc * sy * hp * wp * c * 2 > BAND_MATMUL_MAX_FLOPS
    )
    wide_seg = _wide_seg(img, sy) if use_wide else None
    if n > GATHER_CHUNK:
        npad = (-n) % GATHER_CHUNK
        k = (n + npad) // GATHER_CHUNK
        byp = jnp.pad(by, (0, npad)).reshape(k, GATHER_CHUNK)
        bxp = jnp.pad(bx, (0, npad)).reshape(k, GATHER_CHUNK)
        outs = jax.lax.map(
            lambda ab: _gather_windows_rows(
                img, ab[0], ab[1], sy, sx, return_band, wide_seg
            ),
            (byp, bxp),
        )  # (k, ow, C, sy, chunk)
        out = jnp.moveaxis(outs, 0, 3).reshape(ow, c, sy, k * GATHER_CHUNK)
        return out[..., :n]
    return _gather_windows_rows(img, by, bx, sy, sx, return_band, wide_seg)


def _wide_seg(img, sy: int):
    """Chunk-invariant prep of the wide branch: the 64-px overlapping
    segment view (32-px stride), in row-BLOCK form when ROWBLOCK_TAKE>1.

    32-px stride means any window with sx <= 31 (the branch gate) fits ONE
    64-px segment at offset bx % 32 — which is ALREADY the band contract
    the fine select / fused kernel expects, so the former 128-px-segment
    coarse 32-align select (a where + two relayout fusions, ~3 ms/call at
    op3's finest level) disappears and the take moves half the bytes."""
    hp, wp, c = img.shape
    stride, segw = 32, 64
    ns = -(-wp // stride) + 1
    imgp = jnp.pad(img, ((0, 0), (0, ns * stride - wp), (0, 0)))
    v = imgp.reshape(hp, ns, stride * c)
    segv = jnp.concatenate(
        [v, jnp.roll(v, -1, axis=1)], axis=-1
    )  # (hp, ns, 64c): row (y, k) = img[y, 32k : 32k+64]
    if ROWBLOCK_TAKE > 1:
        blk = ROWBLOCK_TAKE
        nblk = (blk - 1 + sy - 1) // blk + 1
        hpb = -(-hp // blk) + nblk  # tail blocks so byB+nblk-1 stays valid
        segvb = jnp.pad(segv, ((0, hpb * blk - hp), (0, 0), (0, 0)))
        return (
            segvb.reshape(hpb, blk, ns, segw * c)
            .transpose(0, 2, 1, 3)
            .reshape(hpb * ns, blk * segw * c)
        )
    return segv.reshape(hp * ns, segw * c)


def _gather_windows_rows(img, by, bx, sy: int, sx: int,
                         return_band: bool = False, wide_seg=None) -> jnp.ndarray:
    hp, wp, c = img.shape
    n = by.shape[0]
    if wide_seg is None and not return_band and (
            n * sy * hp * wp * c * 2 <= BAND_MATMUL_MAX_FLOPS):
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
    elif wide_seg is not None or (sx <= 31 and wp > 96):
        # Wide level: ONE covering 64-px overlapping segment per window row
        # (32-px stride, so any <=31-px window fits a single segment) —
        # Wp/64x less data than full rows, and the take lands the window in
        # a 64-px band at offset bx % 32, which is exactly the band layout
        # the fine select (and the fused kernel's band_select) consumes.
        # Gate at wp > 96: below that the align-32 branch moves the same
        # bytes per row without the segment-view build.
        stride, segw = 32, 64
        ns = -(-wp // stride) + 1
        if wide_seg is None:
            wide_seg = _wide_seg(img, sy)
        seg0 = bx // stride
        if ROWBLOCK_TAKE > 1:
            # Row-BLOCK take: the per-row take is latency-bound (~8 ns/row
            # regardless of width), so fetch blk-row blocks — sy/blk + 1
            # takes per window instead of sy — then pick the sy rows at
            # offset by%blk with a where-chain over the blk static shifts
            # (selects are exact; no one-hot multiply needed).
            blk = ROWBLOCK_TAKE
            nblk = (blk - 1 + sy - 1) // blk + 1
            byb, r0 = by // blk, by % blk
            idx = (
                byb[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
            ) * ns + seg0[:, None]
            rows = jnp.take(wide_seg, idx.reshape(-1), axis=0).reshape(
                n, nblk * blk, segw * c
            )
            bsel = rows[:, 0:sy]
            for r in range(1, blk):
                bsel = jnp.where(
                    (r0 == r)[:, None, None], rows[:, r : r + sy], bsel
                )
            band = bsel.reshape(n, sy, segw, c)
        else:
            idx = (by[:, None] + jnp.arange(sy, dtype=jnp.int32)[None, :]) * ns + seg0[:, None]
            band = jnp.take(wide_seg, idx.reshape(-1), axis=0)  # (N*sy, 64c)
            band = band.reshape(n, sy, segw, c)
        band = band.transpose(2, 3, 1, 0)  # (64, C, sy, N)
        if return_band:
            return band
        bx = bx - seg0 * stride  # in [0, 32)
        wp = 64
    else:
        rows = by[:, None] + jnp.arange(sy, dtype=jnp.int32)[None, :]  # (N, sy)
        if sx <= 31 and wp > 64:
            # Coarse segment select BEFORE the patches-last transpose: the
            # transpose then moves 64/Wp of the bytes (the full-band copy
            # dominated the op3/op4 window build).  Align-32 padding happens
            # on the IMAGE before the row take, not on the (N, sy, Wp, C)
            # band after it — Wp/(N*sy/Hp) times fewer bytes copied (the
            # band pad was 113 us of op1's finest-level chain, profile r3).
            nseg = -(-wp // 32)
            if nseg * 32 != wp:
                img = jnp.pad(img, ((0, 0), (0, nseg * 32 - wp), (0, 0)))
            band = jnp.take(img.reshape(hp, nseg * 32 * c), rows.reshape(-1), axis=0)
            bv = band.reshape(n, sy, nseg, 32 * c)
            seg0 = bx // 32
            segs = jnp.arange(nseg, dtype=jnp.int32)[None, :, None]
            tseg = seg0[:, None, None] + jnp.arange(2, dtype=jnp.int32)[None, None, :]
            sel1 = (segs == tseg).astype(img.dtype)  # (N, nseg, 2)
            # (N, sy, nseg, 1, 32C) * (N, 1, nseg, 2, 1) -> sum ax 2
            coarse = jnp.sum(
                bv[:, :, :, None, :] * sel1[:, None, :, :, None], axis=2
            )  # (N, sy, 2, 32C)
            band = coarse.reshape(n, sy, 64, c).transpose(2, 3, 1, 0)  # (64, C, sy, N)
            if return_band:
                return band
            bx = bx - seg0 * 32  # in [0, 32)
            wp = 64
        else:
            band = jnp.take(img.reshape(hp, wp * c), rows.reshape(-1), axis=0)
            band = band.reshape(n, sy, wp, c).transpose(2, 3, 1, 0)  # (Wp, C, sy, N)

    # (No further pre-select here: after GATHER_CHUNK chunking n <= 1024,
    # where the direct one-hot select below is a single fused
    # multiply-reduce — a two-stage segment select measured +0.7 ms/call
    # of relayout copies at these sizes and was removed.)
    kx = jnp.arange(wp, dtype=jnp.int32)[:, None, None]
    tx = bx[None, None, :] + jnp.arange(sx, dtype=jnp.int32)[None, :, None]
    sel = (kx == tx).astype(img.dtype)  # (Wp, sx, N)
    # (Wp, sx, 1, 1, N) * (Wp, 1, C, sy, N) -> sum ax 0 -> (sx, C, sy, N)
    return jnp.sum(sel[:, :, None, None, :] * band[:, None, :, :, :], axis=0)
