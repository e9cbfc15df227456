"""Densification: weighted patch-to-pixel flow aggregation (DIS step 4).

TPU-native redesign of AggregateFlowDense (patchgrid.cpp:213-397).  The
reference's optional OpenMP path is documented as racy
(CMakeLists.txt:18-19, patchgrid.cpp:220-222); here the aggregation is a
deterministic XLA scatter-add — bit-reproducible by construction.

Forward splat: each patch adds its (uniform) flow over its psz x psz
footprint clipped to the image, per-pixel weight 1/max(minerrval, err)
(single channel) or 1/sum_c max(minerrval, err_c) (RGB)
(patchgrid.cpp:241-275).  Footprint indices are static (grid geometry), so
only the weights are runtime values.

Forward-backward merge: the complementary grid's patches splat their
NEGATED flow at their *converged query position* with bilinear distribution
over 4 cells (patchgrid.cpp:277-375).  Those indices are runtime values.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DISConfig
from .grid import LevelGeometry
from .inverse_search import SearchResult


def _abs_weights(pweight: jnp.ndarray, cfg: DISConfig) -> jnp.ndarray:
    """absw per footprint pixel: (N, psz*psz) (patchgrid.cpp:253-260)."""
    n, psz = pweight.shape[0], pweight.shape[1]
    pw = jnp.maximum(cfg.minerrval, pweight)  # (N, psz, psz, C)
    return (1.0 / jnp.sum(pw, axis=3)).reshape(n, psz * psz)


def result_absw(res: SearchResult, cfg: DISConfig) -> jnp.ndarray:
    """Densification weights of a SearchResult: the fused level kernel
    returns them directly (res.absw); the XLA path derives them from the
    residual image."""
    if res.absw is not None:
        return res.absw
    return _abs_weights(res.pweight, cfg)


def _col2im_accumulate(
    vals: jnp.ndarray,  # (N, psz*psz, K) per-patch per-footprint-pixel values
    geo: LevelGeometry,
    cfg: DISConfig,
) -> jnp.ndarray:
    """Overlap-add of patch footprints onto the (h, w, K) image — the
    densification splat (patchgrid.cpp:241-273) as a strided transposed
    convolution (col2im) instead of a scatter.

    The patch grid is regular (centers at p*steps + offset), so the splat is
    exactly col2im: a conv_general_dilated with lhs_dilation = steps and a
    flipped-delta kernel.  Dense, deterministic, MXU-friendly — no
    scatter-add latency.  Out-of-image footprint pixels are dropped by the
    final slice, matching the reference's bounds check.
    """
    psz = cfg.patch_size
    steps = cfg.steps
    n, pp, k = vals.shape
    noph, nopw = geo.noph, geo.nopw
    # Patch index order is i = x*noph + y (patchgrid.cpp:61-75).
    grid = vals.reshape(nopw, noph, psz, psz, k).transpose(1, 0, 2, 3, 4)

    # The grid is regular, so col2im decomposes into d^2 STATIC shifted
    # adds (d = ceil(psz/steps)): inner offset j splits as dj*steps + a,
    # and every (dj, di) block lands on the same steps-phase lattice.  The
    # earlier formulation — conv_general_dilated with a psz^2-channel
    # flipped-delta kernel — made XLA do Cin=psz^2 dense MACs per output
    # pixel in bf16 (~5 GFLOP and 5.3 ms/call at op3's finest level);
    # these shifted adds do the same overlap-add exactly, in f32, for
    # psz^2/d^2 times less work, deterministically (fixed add order).
    d = -(-psz // steps)
    pin = d * steps
    if pin != psz:
        grid = jnp.pad(
            grid, ((0, 0), (0, 0), (0, pin - psz), (0, pin - psz), (0, 0))
        )
    # inner (j, i) -> (dj, a, di, b); K-major so the overlap-add runs with
    # the wide spatial axis on lanes.  Each (dj, di) term is PADDED into
    # frame and the d^2 terms are summed — pads+adds fuse into one
    # elementwise pass with no dynamic-update-slice chain (a .at[].add
    # loop lowered to 16 sequential full-buffer DUS ops, ~8 ms/call at
    # op3's finest level).
    v = grid.reshape(noph, nopw, d, steps, d, steps, k)
    v = v.transpose(6, 0, 3, 1, 5, 2, 4)  # (k, noph, a, nopw, b, dj, di)
    fj, fi = noph + d - 1, nopw + d - 1
    acc = None
    for dj in range(d):
        for di in range(d):
            t = jnp.pad(
                v[..., dj, di],
                ((0, 0), (dj, d - 1 - dj), (0, 0), (di, d - 1 - di), (0, 0)),
            )
            acc = t if acc is None else acc + t
    full = acc.reshape(k, fj * steps, fi * steps)
    # crop the (d*steps - psz) zero-pad tail back off
    full = full[:, : (noph - 1) * steps + psz, : (nopw - 1) * steps + psz]

    # full row r corresponds to image row r + offh + lb (same for cols).
    lb = -(psz // 2)
    offh = int(geo.pt_ref[:, 1].min()) if geo.n_patches else 0
    offw = int(geo.pt_ref[:, 0].min()) if geo.n_patches else 0
    oy = offh + lb
    ox = offw + lb
    h, w = geo.h, geo.w
    fh, fw = full.shape[1], full.shape[2]
    # shift into image frame with zero padding, then crop to (h, w)
    pad_top = max(oy, 0)
    pad_left = max(ox, 0)
    crop_top = max(-oy, 0)
    crop_left = max(-ox, 0)
    out = jnp.pad(
        full[:, crop_top:, crop_left:],
        ((0, 0), (pad_top, max(h - (fh - crop_top) - pad_top, 0)),
         (pad_left, max(w - (fw - crop_left) - pad_left, 0))),
    )[:, :h, :w]
    return out.transpose(1, 2, 0)  # (h, w, K)


def splat_forward_scatter(
    p: jnp.ndarray,        # (N, nop) per-patch displacement
    absw_in: jnp.ndarray,  # (N, psz*psz) densification weights (result_absw)
    pt: jnp.ndarray,       # (N, 2) patch centers (may include far-OOB pad lanes)
    w: int,
    h: int,
    cfg: DISConfig,
):
    """Forward splat as a scatter-add: returns (we (w*h,), flow (w*h, nop))
    accumulators.  Same numerics as the col2im path of aggregate_flow_dense
    (footprint offsets, bounds check, 1/sum_c max(minerrval, err) weights —
    patchgrid.cpp:241-275) but supports an ARBITRARY patch subset, which the
    spatially-sharded pipeline needs (each device splats its patch shard and
    psums; parallel/spatial.py)."""
    psz = cfg.patch_size
    lb = -(psz // 2)
    offs = jnp.arange(lb, lb + psz, dtype=jnp.int32)
    oy = jnp.repeat(offs, psz)
    ox = jnp.tile(offs, psz)
    yt = pt[:, 1].astype(jnp.int32)[:, None] + oy[None, :]
    xt = pt[:, 0].astype(jnp.int32)[:, None] + ox[None, :]
    valid = ((xt >= 0) & (yt >= 0) & (xt < w) & (yt < h)).astype(jnp.float32)
    idxm = jnp.clip(yt, 0, h - 1) * w + jnp.clip(xt, 0, w - 1)
    absw = absw_in * valid
    we = jnp.zeros((w * h,), jnp.float32).at[idxm.ravel()].add(absw.ravel())
    contrib = absw[:, :, None] * p[:, None, :]
    flow = jnp.zeros((w * h, p.shape[1]), jnp.float32).at[idxm.ravel()].add(
        contrib.reshape(-1, p.shape[1])
    )
    return we, flow


def aggregate_flow_dense(
    result: SearchResult,
    geo: LevelGeometry,
    cfg: DISConfig,
    bw_result: Optional[SearchResult] = None,
) -> jnp.ndarray:
    """Densify per-patch flow into an (h, w, nop) field.

    `bw_result` (query positions in THIS grid's frame) enables the
    forward-backward merge; pass the backward grid's SearchResult.
    """
    w, h = geo.w, geo.h
    nop = cfg.nop
    npx = w * h

    absw = result_absw(result, cfg)  # (N, psz²)
    # stack [w, w*u, w*v] and overlap-add in one col2im pass
    contrib = absw[:, :, None] * result.p[:, None, :]  # (N, psz², nop)
    vals = jnp.concatenate([absw[:, :, None], contrib], axis=2)
    acc = _col2im_accumulate(vals, geo, cfg)  # (h, w, 1+nop)
    we = acc[..., 0].reshape(npx)
    flow = acc[..., 1:].reshape(npx, nop)

    if bw_result is not None:
        we, flow = merge_backward(we, flow, bw_result, w, h, cfg)

    # Normalize (patchgrid.cpp:377-394); untouched pixels stay 0.
    safe = jnp.where(we > 0.0, we, 1.0)
    flow = jnp.where((we > 0.0)[:, None], flow / safe[:, None], 0.0)
    return flow.reshape(h, w, nop)


def merge_backward(we, flow, bw: SearchResult, w: int, h: int, cfg: DISConfig,
                   origin=None, acc_shape=None):
    """Splat negated backward flow with bilinear weights at the converged
    backward query position (patchgrid.cpp:277-375).  `bw` may be any patch
    subset (the spatially-sharded path merges per-device shards, then psums).

    With `origin`=(oy, ox) and `acc_shape`=(acc_h, acc_w), the accumulators
    are a LOCAL TILE whose row/col 0 sits at (oy, ox) of the global (h, w)
    level: bounds checks keep GLOBAL semantics (interior-only, like the
    reference), only the scatter indices shift into the tile (the 2-D tiled
    path's halo'd accumulator; contributions beyond the tile are bounded by
    its halo under the max_disp contract)."""
    psz = cfg.patch_size
    lb = -(psz // 2)
    if acc_shape is None:
        acc_h, acc_w = h, w
    else:
        acc_h, acc_w = acc_shape
    npx = acc_w * acc_h

    fx = jnp.floor(bw.pt[:, 0])
    fy = jnp.floor(bw.pt[:, 1])
    posx = fx.astype(jnp.int32) + 1  # == ceil(x + 1e-5)
    posy = fy.astype(jnp.int32) + 1
    rx = bw.pt[:, 0] - fx
    ry = bw.pt[:, 1] - fy
    wbil = jnp.stack(
        [rx * ry, (1 - rx) * ry, rx * (1 - ry), (1 - rx) * (1 - ry)], axis=1
    )  # (N, 4)

    offs = jnp.arange(lb, lb + psz, dtype=jnp.int32)
    oy = jnp.repeat(offs, psz)  # row-major (j, i) to match pweight layout
    ox = jnp.tile(offs, psz)
    yt = posy[:, None] + oy[None, :]  # (N, psz²), global coords
    xt = posx[:, None] + ox[None, :]
    valid = ((xt >= 1) & (yt >= 1) & (xt < w - 1) & (yt < h - 1)).astype(jnp.float32)

    if origin is not None:
        yt = yt - origin[0]
        xt = xt - origin[1]
        # Under the max_disp contract every globally-valid contribution
        # lands inside the halo'd tile, so this mask is a no-op today — but
        # if outlier_thresh / halo sizing / max_disp ever drift, out-of-tile
        # contributions must be DROPPED, not clip-aliased into edge cells.
        valid = valid * (
            (yt >= 1) & (yt <= acc_h - 1) & (xt >= 1) & (xt <= acc_w - 1)
        ).astype(jnp.float32)
        yt = jnp.clip(yt, 1, acc_h - 1)
        xt = jnp.clip(xt, 1, acc_w - 1)

    absw = result_absw(bw, cfg) * valid  # (N, psz²)
    idxcc = jnp.clip(yt * acc_w + xt, 0, npx - 1)
    # The 4 bilinear cells — cc, (x-1)c, c(y-1), (x-1)(y-1) — folded into
    # ONE scatter-add each for we/flow instead of 8 serialized ones
    # (scatter latency dominates; the data is only 4x psz² per patch).
    cells = jnp.clip(
        jnp.stack([idxcc, idxcc - 1, idxcc - acc_w, idxcc - acc_w - 1], axis=-1),
        0, npx - 1,
    )  # (N, psz², 4)
    cw = wbil[:, None, :] * absw[:, :, None]  # (N, psz², 4)
    we = we.at[cells.ravel()].add(cw.ravel())
    contrib = (-cw)[..., None] * bw.p[:, None, None, :]  # (N, psz², 4, nop)
    flow = flow.at[cells.ravel()].add(contrib.reshape(-1, flow.shape[1]))
    return we, flow
