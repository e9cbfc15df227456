"""Pure-NumPy scalar oracle of the reference per-patch optimizer.

Independent loop-level reimplementation of the numeric spec in
patch.cpp:57-402 / patchgrid.cpp:195-397 (NOT a copy — written from the
behavioral description in SURVEY.md §2).  Used to validate the batched JAX
engine patch-by-patch.
"""

from __future__ import annotations

import math

import numpy as np


def extract_nn(img, pt, psz, pad):
    """Integer-position window, offsets -psz/2..psz/2-1 around round(pt).
    img: (Hp, Wp, C) padded; pt unpadded (x, y)."""
    px = int(np.floor(pt[0] + 0.5)) + pad
    py = int(np.floor(pt[1] + 0.5)) + pad
    lb = -(psz // 2)
    return img[py + lb : py + lb + psz, px + lb : px + lb + psz, :].astype(np.float64)


def extract_bil(img, pt, psz, pad):
    """Bilinear extraction with the constant 4-tap weight vector."""
    fx, fy = math.floor(pt[0]), math.floor(pt[1])
    cx, cy = fx + 1, fy + 1  # == ceil(pt + 1e-5)
    rx, ry = pt[0] - fx, pt[1] - fy
    w00, w01 = rx * ry, (1 - rx) * ry
    w10, w11 = rx * (1 - ry), (1 - rx) * (1 - ry)
    lb = -(psz // 2)
    bx, by = cx + lb - 1 + pad, cy + lb - 1 + pad
    win = img[by : by + psz + 1, bx : bx + psz + 1, :].astype(np.float64)
    return (
        w00 * win[1:, 1:] + w01 * win[1:, :-1] + w10 * win[:-1, 1:] + w11 * win[:-1, :-1]
    )


def loss(diff, cost, normoutlier=5.0):
    if cost == 0:
        pd = diff
    elif cost == 1:
        pd = np.sign(diff) * np.sqrt(np.abs(diff))
    elif cost == 2:
        bsq = normoutlier**2
        pd = np.sign(diff) * np.sqrt(2 * bsq * (np.sqrt(1 + diff * diff / bsq) - 1))
    else:
        raise ValueError(cost)
    return pd, np.abs(pd)


def optimize_patch_oracle(
    im_a, dx_a, dy_a, im_b, pt_ref, p_init, *, psz, pad, w, h,
    mode="flow", camlr=0, cost=0, patnorm=True,
    max_iter=12, min_iter=12, dp_thresh=0.05, dr_thresh=0.95, res_thresh=0.0,
):
    """Full single-patch state machine.  Returns (p, pt, pweight, converged)."""
    nop = 2 if mode == "flow" else 1
    novals = im_a.shape[2] * psz * psz
    lbnd = -psz / 2.0
    ubw, ubh = w + psz // 2 - 2.0, h + psz // 2 - 2.0
    outlier2 = (psz / 2.0) ** 2
    dp_t2 = dp_thresh * dp_thresh

    def norm_patch(p):
        return p - p.sum() / novals if patnorm else p

    def to_pt(p):
        if mode == "flow":
            return np.array([pt_ref[0] + p[0], pt_ref[1] + p[1]])
        return np.array([pt_ref[0] + p[0], pt_ref[1]])

    def oob(pt):
        return pt[0] < lbnd or pt[1] < lbnd or pt[0] > ubw or pt[1] > ubh

    tmp = norm_patch(extract_nn(im_a, pt_ref, psz, pad))
    gx = extract_nn(dx_a, pt_ref, psz, pad)
    gy = extract_nn(dy_a, pt_ref, psz, pad)
    h00 = (gx * gx).sum()
    if nop == 2:
        h01 = (gx * gy).sum()
        h11 = (gy * gy).sum()
        if h00 * h11 - h01 * h01 == 0:
            h00 += 1e-10
            h11 += 1e-10
    else:
        if h00 == 0:
            h00 += 1e-10

    p_in = np.array(p_init, dtype=np.float64)
    p = p_in.copy()
    pt = to_pt(p)
    pt_st = pt.copy()

    def residual(pt):
        raw = norm_patch(extract_bil(im_b, pt, psz, pad))
        return loss(raw - tmp, cost)

    if oob(pt):
        pd, pw = loss(tmp, cost)
        return p, pt, pw, True

    pdiff, pweight = residual(pt)
    mares_old = 1e5
    mares = pweight.sum() / novals
    converged = not ((0 < max_iter) and (mares > res_thresh) and (0 < min_iter or True))
    if min_iter <= 0:
        converged = True  # dpsq=0/1e-10 term fails (see OptimizeStart semantics)
    dpsq = dpsq_init = 1e-10
    cnt = 0

    while not converged:
        cnt += 1
        b0 = (gx * pdiff).sum()
        if nop == 2:
            b1 = (gy * pdiff).sum()
            det = h00 * h11 - h01 * h01
            dp = np.array([(h11 * b0 - h01 * b1) / det, (h00 * b1 - h01 * b0) / det])
        else:
            dp = np.array([b0 / h00])
        p = p - dp
        if mode == "stereo":
            p[0] = min(p[0], 0.0) if camlr == 0 else max(p[0], 0.0)
        pt = to_pt(p)
        if ((pt_st - pt) ** 2).sum() > outlier2 or oob(pt):
            p = p_in.copy()
            pt = to_pt(p)
            converged = True
        pdiff, pweight = residual(pt)
        dpsq = (dp * dp).sum()
        if cnt == 1:
            dpsq_init = dpsq
        mares_old, mares = mares, pweight.sum() / novals
        keep = (
            (cnt < max_iter)
            and (mares > res_thresh)
            and ((cnt < min_iter) or (dpsq / dpsq_init >= dp_t2))
            and ((cnt < min_iter) or (mares / mares_old <= dr_thresh))
        )
        converged = converged or not keep

    return p, pt, pweight, converged


def aggregate_oracle(pt_refs, ps, pweights, w, h, psz, nop, minerrval=2.0):
    """Forward densification oracle (AggregateFlowDense, patchgrid.cpp:213-275)."""
    flow = np.zeros((h * w, nop))
    we = np.zeros(h * w)
    lb = -(psz // 2)
    for pr, p, pw in zip(pt_refs, ps, pweights):
        for jy in range(psz):
            for jx in range(psz):
                yt = int(pr[1]) + lb + jy
                xt = int(pr[0]) + lb + jx
                if 0 <= xt < w and 0 <= yt < h:
                    absw = 1.0 / np.maximum(minerrval, pw[jy, jx]).sum()
                    i = yt * w + xt
                    we[i] += absw
                    flow[i] += absw * p
    nz = we > 0
    flow[nz] /= we[nz, None]
    return flow.reshape(h, w, nop)
