"""Variational refinement components vs NumPy oracles
(opticalflow_aux.c / solver.c spec)."""

import numpy as np
import jax.numpy as jnp
import pytest

from of_dis_tpu.config import DISConfig
from of_dis_tpu.models import refine as rf


rng = np.random.RandomState(11)


def test_deriv5_coefficients():
    """The 5-tap filter from convolution_new(2, {0,-8/12,1/12}, 0) must be
    {1,-8,0,8,-1}/12 applied as dst[x] = sum c[k] src[x+k-2]."""
    x = rng.randn(4, 16, 1).astype(np.float32)
    out = np.asarray(rf._conv_h(x, rf.DERIV5))
    # interior: (src[x-2] - 8 src[x-1] + 8 src[x+1] - src[x+2]) / 12
    i = 7
    expect = (x[:, i - 2] - 8 * x[:, i - 1] + 8 * x[:, i + 1] - x[:, i + 2]) / 12.0
    np.testing.assert_allclose(out[:, i], expect, rtol=1e-5, atol=1e-6)


def test_conv_replicate_borders():
    """Border handling folds out-of-range taps onto the edge sample
    (convolve_*_fast accumulated coefficients, image.c:376-618)."""
    x = rng.randn(3, 10, 1).astype(np.float32)
    out = np.asarray(rf._conv_h(x, rf.DERIV3))
    # x=0: c0*src[-1->0] + c2*src[1] = -0.5 src[0] + 0.5 src[1]
    np.testing.assert_allclose(
        out[:, 0], -0.5 * x[:, 0] + 0.5 * x[:, 1], rtol=1e-5, atol=1e-6
    )
    out_v = np.asarray(rf._conv_v(x, rf.DERIV3))
    np.testing.assert_allclose(
        out_v[0], -0.5 * x[0] + 0.5 * x[1], rtol=1e-5, atol=1e-6
    )


def test_warp_oracle():
    """image_warp (opticalflow_aux.c:16-60): clamp-to-edge taps, mask from
    un-clamped coordinates."""
    h, w = 12, 17
    src = rng.randn(h, w, 1).astype(np.float32)
    wx = (rng.randn(h, w) * 3).astype(np.float32)
    wy = (rng.randn(h, w) * 3).astype(np.float32)
    dst, mask = rf.image_warp(jnp.asarray(src), jnp.asarray(wx), jnp.asarray(wy))
    dst, mask = np.asarray(dst), np.asarray(mask)
    for j in range(h):
        for i in range(w):
            xx, yy = i + wx[j, i], j + wy[j, i]
            x, y = np.floor(xx), np.floor(yy)
            dx, dy = xx - x, yy - y
            m = float(0 <= xx <= w - 1 and 0 <= yy <= h - 1)
            x1 = int(np.clip(x, 0, w - 1)); x2 = int(np.clip(x + 1, 0, w - 1))
            y1 = int(np.clip(y, 0, h - 1)); y2 = int(np.clip(y + 1, 0, h - 1))
            v = (src[y1, x1, 0] * (1 - dx) * (1 - dy) + src[y1, x2, 0] * dx * (1 - dy)
                 + src[y2, x1, 0] * (1 - dx) * dy + src[y2, x2, 0] * dx * dy)
            assert mask[j, i] == m
            np.testing.assert_allclose(dst[j, i, 0], v, rtol=1e-4, atol=1e-4)


def test_smoothness_oracle():
    h, w = 10, 14
    uu = rng.randn(h, w).astype(np.float32)
    vv = rng.randn(h, w).astype(np.float32)
    qa = 2.5
    wh, wv = rf.compute_smoothness(jnp.asarray(uu), jnp.asarray(vv), qa)
    wh, wv = np.asarray(wh), np.asarray(wv)

    def d3h(a):
        p = np.pad(a, ((0, 0), (1, 1)), mode="edge")
        return -0.5 * p[:, :-2] + 0.5 * p[:, 2:]

    def d3v(a):
        p = np.pad(a, ((1, 1), (0, 0)), mode="edge")
        return -0.5 * p[:-2] + 0.5 * p[2:]

    ux, uy, vx, vy = d3h(uu), d3v(uu), d3h(vv), d3v(vv)
    s = qa / np.sqrt(ux**2 + uy**2 + vx**2 + vy**2 + rf.EPS_SMOOTH)
    eh = s.copy(); eh[:, :-1] += s[:, 1:]; eh[:, -1] = 0
    ev = s.copy(); ev[:-1] += s[1:]; ev[-1] = 0
    np.testing.assert_allclose(wh, eh, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(wv, ev, rtol=1e-5, atol=1e-5)


def test_sub_laplacian_oracle():
    h, w = 9, 13
    b = rng.randn(h, w).astype(np.float32)
    src = rng.randn(h, w).astype(np.float32)
    wh = np.abs(rng.randn(h, w)).astype(np.float32); wh[:, -1] = 0
    wv = np.abs(rng.randn(h, w)).astype(np.float32); wv[-1] = 0
    out = np.asarray(rf.sub_laplacian(jnp.asarray(b), jnp.asarray(src), jnp.asarray(wh), jnp.asarray(wv)))
    ref = b.copy()
    for j in range(h):
        for i in range(w - 1):
            t = wh[j, i] * (src[j, i + 1] - src[j, i])
            ref[j, i] += t; ref[j, i + 1] -= t
    for j in range(h - 1):
        for i in range(w):
            t = wv[j, i] * (src[j + 1, i] - src[j, i])
            ref[j, i] += t; ref[j + 1, i] -= t
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _system(h, w, seed=0):
    r = np.random.RandomState(seed)
    a11 = 3 + np.abs(r.randn(h, w)).astype(np.float32)
    a12 = (0.1 * r.randn(h, w)).astype(np.float32)
    a22 = 3 + np.abs(r.randn(h, w)).astype(np.float32)
    b1 = r.randn(h, w).astype(np.float32)
    b2 = r.randn(h, w).astype(np.float32)
    wh = np.abs(r.randn(h, w)).astype(np.float32); wh[:, -1] = 0
    wv = np.abs(r.randn(h, w)).astype(np.float32); wv[-1] = 0
    return a11, a12, a22, b1, b2, wh, wv


def _gs_sequential(du, dv, a11, a12, a22, b1, b2, wh, wv, iters, omega):
    """Sequential coupled SOR oracle (sor_coupled_slow_but_readable,
    solver.c:19-72)."""
    h, w = du.shape
    du, dv = du.copy(), dv.copy()
    for _ in range(iters):
        for j in range(h):
            for i in range(w):
                sig_u = sig_v = sdp = 0.0
                if j > 0:
                    sig_u -= wv[j-1, i] * du[j-1, i]; sig_v -= wv[j-1, i] * dv[j-1, i]; sdp += wv[j-1, i]
                if i > 0:
                    sig_u -= wh[j, i-1] * du[j, i-1]; sig_v -= wh[j, i-1] * dv[j, i-1]; sdp += wh[j, i-1]
                if j < h - 1:
                    sig_u -= wv[j, i] * du[j+1, i]; sig_v -= wv[j, i] * dv[j+1, i]; sdp += wv[j, i]
                if i < w - 1:
                    sig_u -= wh[j, i] * du[j, i+1]; sig_v -= wh[j, i] * dv[j, i+1]; sdp += wh[j, i]
                A11, A22 = a11[j, i] + sdp, a22[j, i] + sdp
                B1, B2 = b1[j, i] - sig_u, b2[j, i] - sig_v
                du[j, i] = (1 - omega) * du[j, i] + omega / A11 * (B1 - a12[j, i] * dv[j, i])
                dv[j, i] = (1 - omega) * dv[j, i] + omega / A22 * (B2 - a12[j, i] * du[j, i])
    return du, dv


def test_sor_rb_converges_to_same_fixed_point():
    """Red-black and the reference's sequential sweep solve the same linear
    system; with enough iterations both reach the same fixed point."""
    h, w = 10, 12
    a11, a12, a22, b1, b2, wh, wv = _system(h, w)
    du0 = np.zeros((h, w), np.float32)
    dv0 = np.zeros((h, w), np.float32)
    du_rb, dv_rb = rf.sor_coupled_rb(
        jnp.asarray(du0), jnp.asarray(dv0), jnp.asarray(a11), jnp.asarray(a12),
        jnp.asarray(a22), jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(wh),
        jnp.asarray(wv), 400, 1.6,
    )
    du_gs, dv_gs = _gs_sequential(du0, dv0, a11, a12, a22, b1, b2, wh, wv, 400, 1.6)
    np.testing.assert_allclose(np.asarray(du_rb), du_gs, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dv_rb), dv_gs, rtol=1e-3, atol=1e-3)


def test_sor_rb_few_iters_close_to_sequential():
    """At the production 3 iterations the two sweeps differ only by a small
    ordering effect (the reference accepts sweep-order nondeterminism,
    solver.c:24)."""
    h, w = 10, 12
    a11, a12, a22, b1, b2, wh, wv = _system(h, w, seed=4)
    du0 = np.zeros((h, w), np.float32); dv0 = np.zeros((h, w), np.float32)
    du_rb, dv_rb = rf.sor_coupled_rb(
        jnp.asarray(du0), jnp.asarray(dv0), jnp.asarray(a11), jnp.asarray(a12),
        jnp.asarray(a22), jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(wh),
        jnp.asarray(wv), 3, 1.6,
    )
    du_gs, dv_gs = _gs_sequential(du0, dv0, a11, a12, a22, b1, b2, wh, wv, 3, 1.6)
    assert np.max(np.abs(np.asarray(du_rb) - du_gs)) < 0.2
    assert np.max(np.abs(np.asarray(dv_rb) - dv_gs)) < 0.2


def test_refine_level_zero_flow_static_scene():
    """Identical images + zero flow must stay (near) zero after refinement."""
    h, w = 24, 32
    img = np.abs(rng.randn(h, w, 1)).astype(np.float32) * 100
    flow = np.zeros((h, w, 2), np.float32)
    cfg = DISConfig(mode="flow", channels=1, sc_f=0, sc_l=0)
    out = np.asarray(rf.refine_level(jnp.asarray(flow), jnp.asarray(img), jnp.asarray(img), 2, cfg))
    assert np.max(np.abs(out)) < 1e-3


def test_refine_level_de_sign_clamp():
    h, w = 24, 32
    img = np.abs(rng.randn(h, w, 1)).astype(np.float32) * 100
    flow = -np.abs(rng.randn(h, w, 1)).astype(np.float32)
    cfg = DISConfig(mode="stereo", channels=1, sc_f=0, sc_l=0)
    out = np.asarray(rf.refine_level(jnp.asarray(flow), jnp.asarray(img), jnp.asarray(img), 1, cfg, camlr=0))
    assert np.all(out <= 0.0)  # left camera clamp (refine_variational.cpp:299-306)


def test_pallas_sor_matches_xla():
    """Fused Pallas SOR kernel == XLA red-black implementation."""
    import jax.numpy as jnp
    from of_dis_tpu.ops.pallas_kernels import (
        sor_coupled_rb_pallas,
        sor_scalar_rb_pallas,
    )

    h, w = 16, 24
    a11, a12, a22, b1, b2, wh, wv = _system(h, w, seed=8)
    du0 = np.zeros((h, w), np.float32)
    dv0 = np.zeros((h, w), np.float32)
    du_x, dv_x = rf.sor_coupled_rb(
        jnp.asarray(du0), jnp.asarray(dv0), jnp.asarray(a11), jnp.asarray(a12),
        jnp.asarray(a22), jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(wh),
        jnp.asarray(wv), 5, 1.6,
    )
    du_p, dv_p = sor_coupled_rb_pallas(
        jnp.asarray(du0), jnp.asarray(dv0), jnp.asarray(a11), jnp.asarray(a12),
        jnp.asarray(a22), jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(wh),
        jnp.asarray(wv), 5, 1.6,
    )
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_x), rtol=1e-5, atol=1e-5)

    du_xs = rf.sor_scalar_rb(jnp.asarray(du0), jnp.asarray(a11), jnp.asarray(b1),
                             jnp.asarray(wh), jnp.asarray(wv), 5, 1.6)
    du_ps = sor_scalar_rb_pallas(jnp.asarray(du0), jnp.asarray(a11), jnp.asarray(b1),
                                 jnp.asarray(wh), jnp.asarray(wv), 5, 1.6)
    np.testing.assert_allclose(np.asarray(du_ps), np.asarray(du_xs), rtol=1e-5, atol=1e-5)


def test_refine_inner_pallas_matches_xla(smooth_pair):
    """Fused inner-loop Pallas kernel == step-by-step XLA refinement."""
    import of_dis_tpu.models.refine as refine_mod

    img1, img2, _ = smooth_pair
    img1 = img1[:48, :64][..., None]
    img2 = img2[:48, :64][..., None]
    flow = np.random.RandomState(0).randn(48, 64, 2).astype(np.float32) * 0.5
    cfg = DISConfig(mode="flow", channels=1, sc_f=0, sc_l=0)

    out_pallas = np.asarray(
        rf.refine_level(jnp.asarray(flow), jnp.asarray(img1), jnp.asarray(img2), 2, cfg)
    )
    old = refine_mod.PALLAS_SOR_MAX_PIXELS
    try:
        refine_mod.PALLAS_SOR_MAX_PIXELS = 0  # force XLA path
        out_xla = np.asarray(
            rf.refine_level(jnp.asarray(flow), jnp.asarray(img1), jnp.asarray(img2), 2, cfg)
        )
    finally:
        refine_mod.PALLAS_SOR_MAX_PIXELS = old
    np.testing.assert_allclose(out_pallas, out_xla, rtol=1e-4, atol=1e-4)
