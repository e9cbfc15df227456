"""Batched JAX inverse search vs the scalar NumPy oracle (patch.cpp spec)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

from of_dis_tpu.config import DISConfig
from of_dis_tpu.models.grid import level_geometry
from of_dis_tpu.models.inverse_search import build_templates, optimize_level
from of_dis_tpu.ops import pyramid as pyr

from oracle import optimize_patch_oracle


def make_level(seed=0, h=40, w=56, c=1, shift=(2.5, -1.25)):
    rng = np.random.RandomState(seed)
    big = gaussian_filter(rng.rand(h + 32, w + 32, c) * 255, (2.0, 2.0, 0)).astype(
        np.float32
    )
    img1 = big[16 : 16 + h, 16 : 16 + w]
    # fractional shift via bilinear resample of the big image
    sy, sx = shift[1], shift[0]
    ys = np.arange(h) + 16 + sy
    xs = np.arange(w) + 16 + sx
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    img2 = (
        big[y0][:, x0] * (1 - fy) * (1 - fx)
        + big[y0][:, x0 + 1] * (1 - fy) * fx
        + big[y0 + 1][:, x0] * fy * (1 - fx)
        + big[y0 + 1][:, x0 + 1] * fy * fx
    ).astype(np.float32)
    return img1, img2


def setup_level(img1, img2, cfg):
    pad = cfg.patch_size
    im_a = np.asarray(pyr.pad_replicate(img1, pad))
    im_b = np.asarray(pyr.pad_replicate(img2, pad))
    dx, dy = pyr.sobel(img1)
    dx_a = np.asarray(pyr.pad_zero(dx, pad))
    dy_a = np.asarray(pyr.pad_zero(dy, pad))
    return im_a, dx_a, dy_a, im_b


@pytest.mark.parametrize("cost", [0, 1, 2])
@pytest.mark.parametrize("patnorm", [True, False])
def test_flow_matches_oracle(cost, patnorm):
    h, w, c = 40, 56, 1
    cfg = DISConfig(
        mode="flow", channels=c, patch_size=8, overlap=0.4,
        max_iter=8, min_iter=8, cost=cost, patch_norm=patnorm,
        sc_f=0, sc_l=0, use_tv_refine=False,
    )
    img1, img2 = make_level(cost, h, w, c)
    im_a, dx_a, dy_a, im_b = setup_level(img1, img2, cfg)
    pad = cfg.patch_size
    wp = w + 2 * pad

    geo = level_geometry(w, h, cfg)
    rng = np.random.RandomState(42)
    p_init = rng.randn(geo.n_patches, 2).astype(np.float32) * 1.5

    tmpl = build_templates(
        jnp.asarray(im_a), jnp.asarray(dx_a),
        jnp.asarray(dy_a), jnp.asarray(geo.pt_ref),
        cfg, pad,
    )
    res = optimize_level(
        jnp.asarray(im_b), tmpl, jnp.asarray(geo.pt_ref),
        jnp.asarray(p_init), cfg, w, h, pad,
    )
    p_jax = np.asarray(res.p)
    pw_jax = np.asarray(res.pweight)

    n_checked = 0
    for i in range(geo.n_patches):
        p_ref, pt_o, pw_o, _ = optimize_patch_oracle(
            im_a, dx_a, dy_a, im_b, geo.pt_ref[i], p_init[i],
            psz=cfg.patch_size, pad=pad, w=w, h=h, mode="flow",
            cost=cost, patnorm=patnorm,
            max_iter=cfg.max_iter, min_iter=cfg.min_iter,
            dp_thresh=cfg.dp_thresh, dr_thresh=cfg.dr_thresh,
            res_thresh=cfg.res_thresh,
        )
        np.testing.assert_allclose(p_jax[i], p_ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"patch {i} param mismatch")
        np.testing.assert_allclose(
            pw_jax[i], pw_o, rtol=5e-3, atol=5e-2,
            err_msg=f"patch {i} pweight mismatch",
        )
        n_checked += 1
    assert n_checked == geo.n_patches


def test_stereo_matches_oracle():
    h, w, c = 40, 56, 1
    cfg = DISConfig(
        mode="stereo", channels=c, patch_size=8, overlap=0.4,
        max_iter=8, min_iter=8, sc_f=0, sc_l=0, use_tv_refine=False, camlr=0,
    )
    img1, img2 = make_level(9, h, w, c, shift=(1.75, 0.0))
    im_a, dx_a, dy_a, im_b = setup_level(img1, img2, cfg)
    pad = cfg.patch_size
    wp = w + 2 * pad
    geo = level_geometry(w, h, cfg)
    p_init = np.zeros((geo.n_patches, 1), np.float32)

    tmpl = build_templates(
        jnp.asarray(im_a), jnp.asarray(dx_a),
        jnp.asarray(dy_a), jnp.asarray(geo.pt_ref), cfg, pad,
    )
    res = optimize_level(
        jnp.asarray(im_b), tmpl, jnp.asarray(geo.pt_ref),
        jnp.asarray(p_init), cfg, w, h, pad,
    )
    p_jax = np.asarray(res.p)
    for i in range(geo.n_patches):
        p_ref, _, _, _ = optimize_patch_oracle(
            im_a, dx_a, dy_a, im_b, geo.pt_ref[i], p_init[i],
            psz=cfg.patch_size, pad=pad, w=w, h=h, mode="stereo", camlr=0,
            max_iter=cfg.max_iter, min_iter=cfg.min_iter,
            dp_thresh=cfg.dp_thresh, dr_thresh=cfg.dr_thresh,
            res_thresh=cfg.res_thresh,
        )
        np.testing.assert_allclose(p_jax[i], p_ref, rtol=2e-3, atol=2e-3)
        assert p_jax[i][0] <= 0.0  # left-camera clamp (patch.cpp:188-193)


def test_rgb_matches_oracle():
    h, w, c = 32, 48, 3
    cfg = DISConfig(
        mode="flow", channels=c, patch_size=8, overlap=0.4,
        max_iter=6, min_iter=6, sc_f=0, sc_l=0, use_tv_refine=False,
    )
    img1, img2 = make_level(3, h, w, c)
    im_a, dx_a, dy_a, im_b = setup_level(img1, img2, cfg)
    pad = cfg.patch_size
    wp = w + 2 * pad
    geo = level_geometry(w, h, cfg)
    p_init = np.zeros((geo.n_patches, 2), np.float32)
    tmpl = build_templates(
        jnp.asarray(im_a), jnp.asarray(dx_a),
        jnp.asarray(dy_a), jnp.asarray(geo.pt_ref), cfg, pad,
    )
    res = optimize_level(
        jnp.asarray(im_b), tmpl, jnp.asarray(geo.pt_ref),
        jnp.asarray(p_init), cfg, w, h, pad,
    )
    p_jax = np.asarray(res.p)
    for i in range(0, geo.n_patches, 3):
        p_ref, _, _, _ = optimize_patch_oracle(
            im_a, dx_a, dy_a, im_b, geo.pt_ref[i], p_init[i],
            psz=cfg.patch_size, pad=pad, w=w, h=h, mode="flow",
            max_iter=cfg.max_iter, min_iter=cfg.min_iter,
            dp_thresh=cfg.dp_thresh, dr_thresh=cfg.dr_thresh,
            res_thresh=cfg.res_thresh,
        )
        np.testing.assert_allclose(p_jax[i], p_ref, rtol=3e-3, atol=3e-3)


def test_oob_initial_position_converges_immediately():
    h, w, c = 32, 48, 1
    cfg = DISConfig(
        mode="flow", channels=c, patch_size=8, max_iter=6, min_iter=6,
        sc_f=0, sc_l=0, use_tv_refine=False,
    )
    img1, img2 = make_level(5, h, w, c)
    im_a, dx_a, dy_a, im_b = setup_level(img1, img2, cfg)
    pad = cfg.patch_size
    wp = w + 2 * pad
    geo = level_geometry(w, h, cfg)
    p_init = np.zeros((geo.n_patches, 2), np.float32)
    p_init[0] = [1000.0, 1000.0]  # way out of bounds
    tmpl = build_templates(
        jnp.asarray(im_a), jnp.asarray(dx_a),
        jnp.asarray(dy_a), jnp.asarray(geo.pt_ref), cfg, pad,
    )
    res = optimize_level(
        jnp.asarray(im_b), tmpl, jnp.asarray(geo.pt_ref),
        jnp.asarray(p_init), cfg, w, h, pad,
    )
    assert bool(np.asarray(res.converged)[0])
    np.testing.assert_array_equal(np.asarray(res.p)[0], p_init[0])


def test_matmul_and_gather_extraction_agree(monkeypatch):
    """The MXU matmul extraction must match the element-gather path (same
    numerics up to float reassociation)."""
    import of_dis_tpu.models.inverse_search as isearch

    h, w, c = 40, 56, 1
    cfg = DISConfig(
        mode="flow", channels=c, patch_size=8, overlap=0.4,
        max_iter=6, min_iter=6, sc_f=0, sc_l=0, use_tv_refine=False,
    )
    img1, img2 = make_level(11, h, w, c)
    im_a, dx_a, dy_a, im_b = setup_level(img1, img2, cfg)
    pad = cfg.patch_size
    geo = level_geometry(w, h, cfg)
    p_init = np.random.RandomState(1).randn(geo.n_patches, 2).astype(np.float32)

    def run():
        tmpl = build_templates(
            jnp.asarray(im_a), jnp.asarray(dx_a), jnp.asarray(dy_a),
            jnp.asarray(geo.pt_ref), cfg, pad,
        )
        return optimize_level(
            jnp.asarray(im_b), tmpl, jnp.asarray(geo.pt_ref),
            jnp.asarray(p_init), cfg, w, h, pad,
        )

    monkeypatch.setattr(isearch, "MATMUL_EXTRACT_MAX_PIXELS", 10**9)
    res_mm = run()
    monkeypatch.setattr(isearch, "MATMUL_EXTRACT_MAX_PIXELS", 0)
    res_g = run()
    np.testing.assert_allclose(np.asarray(res_mm.p), np.asarray(res_g.p),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_mm.pweight), np.asarray(res_g.pweight),
                               rtol=5e-3, atol=5e-2)


def test_pallas_gn_matches_xla(smooth_pair):
    """The fused Pallas GN kernel (the default search path) is numerically
    equivalent to the XLA fallback up to float reassociation."""
    import jax.numpy as jnp

    import of_dis_tpu.ops.pallas_kernels as pk
    from of_dis_tpu import DISConfig
    from of_dis_tpu.models.grid import level_geometry
    from of_dis_tpu.models.inverse_search import build_templates, optimize_level
    from of_dis_tpu.ops import pyramid as pyr

    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    pad = cfg.patch_size
    im1s, dx1s, dy1s = pyr.build_pyramid(jnp.asarray(img1[..., None]), 2, pad)
    im2s, _, _ = pyr.build_pyramid(jnp.asarray(img2[..., None]), 2, pad)
    sl = 1
    lw, lh = img1.shape[1] >> sl, img1.shape[0] >> sl
    geo = level_geometry(lw, lh, cfg)
    ptr = jnp.asarray(geo.pt_ref)
    tmpl = build_templates(im1s[sl], dx1s[sl], dy1s[sl], ptr, cfg, pad)
    p0 = jnp.zeros((geo.n_patches, 2), jnp.float32)

    old = (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS)
    try:
        pk.GN_PALLAS = pk.GN_PALLAS_CPU = True
        pk.LEVEL_PALLAS = False  # exercise gn_search_pallas, not the level kernel
        r_pl = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
        pk.GN_PALLAS = False
        r_xla = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
    finally:
        pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS = old
    np.testing.assert_allclose(np.asarray(r_pl.p), np.asarray(r_xla.p), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(r_pl.pweight), np.asarray(r_xla.pweight), atol=5e-2
    )
    assert (
        np.asarray(r_pl.converged) == np.asarray(r_xla.converged)
    ).mean() > 0.99


@pytest.mark.parametrize("mode,c", [("flow", 1), ("flow", 3), ("stereo", 1)])
def test_level_kernel_matches_xla(mode, c, smooth_pair):
    """The whole-level fused kernel (in-kernel window build + GN machine +
    absw) is numerically equivalent to the XLA path up to reassociation."""
    import jax.numpy as jnp

    import of_dis_tpu.ops.pallas_kernels as pk
    from of_dis_tpu import DISConfig
    from of_dis_tpu.models.densify import result_absw
    from of_dis_tpu.models.grid import level_geometry
    from of_dis_tpu.models.inverse_search import build_templates, optimize_level
    from of_dis_tpu.ops import pyramid as pyr

    img1, img2, _ = smooth_pair
    if c == 3:
        img1 = np.stack([img1, img1 * 0.8 + 10, img1 * 0.6 + 40], axis=-1)
        img2 = np.stack([img2, img2 * 0.8 + 10, img2 * 0.6 + 40], axis=-1)
    else:
        img1, img2 = img1[..., None], img2[..., None]
    nop = 2 if mode == "flow" else 1
    cfg = DISConfig(
        mode=mode, channels=c, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    pad = cfg.patch_size
    im1s, dx1s, dy1s = pyr.build_pyramid(jnp.asarray(img1), 2, pad)
    im2s, _, _ = pyr.build_pyramid(jnp.asarray(img2), 2, pad)
    sl = 1
    lw, lh = img1.shape[1] >> sl, img1.shape[0] >> sl
    geo = level_geometry(lw, lh, cfg)
    ptr = jnp.asarray(geo.pt_ref)
    tmpl = build_templates(im1s[sl], dx1s[sl], dy1s[sl], ptr, cfg, pad)
    rng = np.random.RandomState(3)
    p0 = jnp.asarray(rng.randn(geo.n_patches, nop).astype(np.float32) * 1.5)

    hp, wp = im2s[sl].shape[:2]
    sy = min(2 * pad + 2, hp)
    sx = min(2 * pad + 2, wp)
    old = (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS)
    try:
        pk.GN_PALLAS = pk.GN_PALLAS_CPU = pk.LEVEL_PALLAS = True
        assert pk.level_gn_applicable(hp, wp, c, geo.n_patches, pad, sy, sx)
        r_lv = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
        assert r_lv.absw is not None and r_lv.pweight is None
        pk.GN_PALLAS = False
        r_xla = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
    finally:
        pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS = old
    np.testing.assert_allclose(np.asarray(r_lv.p), np.asarray(r_xla.p), atol=2e-3)
    np.testing.assert_allclose(np.asarray(r_lv.pt), np.asarray(r_xla.pt), atol=2e-3)
    # Window build + extraction reassociate differently (MXU one-hot vs XLA
    # two-hot); the few-ULP pweight diffs shift absw by <1% on <1% of cells.
    np.testing.assert_allclose(
        np.asarray(r_lv.absw), np.asarray(result_absw(r_xla, cfg)),
        rtol=1e-2, atol=1e-4,
    )
    assert (
        np.asarray(r_lv.converged) == np.asarray(r_xla.converged)
    ).mean() > 0.99


def test_pallas_gn_tiled_matches_untiled(smooth_pair):
    """The big-N (PS, 128) patch-tiled GN kernel variant is numerically
    equivalent to the untiled kernel on identical inputs (padded lanes are
    inert)."""
    import jax.numpy as jnp

    import of_dis_tpu.ops.pallas_kernels as pk
    from of_dis_tpu import DISConfig
    from of_dis_tpu.models.grid import level_geometry
    from of_dis_tpu.models.inverse_search import build_templates
    from of_dis_tpu.ops import pyramid as pyr
    from of_dis_tpu.ops.interp import gather_windows_rows

    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=0, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    pad = psz = cfg.patch_size
    im1s, dx1s, dy1s = pyr.build_pyramid(jnp.asarray(img1[..., None]), 1, pad)
    im2s, _, _ = pyr.build_pyramid(jnp.asarray(img2[..., None]), 1, pad)
    lh, lw = img1.shape
    geo = level_geometry(lw, lh, cfg)
    ptr = jnp.asarray(geo.pt_ref)
    tmpl = build_templates(im1s[0], dx1s[0], dy1s[0], ptr, cfg, pad)
    n = geo.n_patches
    p0 = jnp.zeros((n, 2), jnp.float32)

    hp, wp, c = im2s[0].shape
    lb = -(psz // 2)
    sy = min(2 * psz + 2, hp)
    sx = min(2 * psz + 2, wp)
    by = jnp.clip(jnp.floor(ptr[:, 1]).astype(jnp.int32) + lb - psz // 2 + pad, 0, hp - sy)
    bx = jnp.clip(jnp.floor(ptr[:, 0]).astype(jnp.int32) + lb - psz // 2 + pad, 0, wp - sx)
    win = gather_windows_rows(im2s[0], by, bx, sy, sx)
    Tp = jnp.transpose(tmpl.tmp, (2, 3, 1, 0))
    DXp = jnp.transpose(tmpl.dx, (2, 3, 1, 0))
    DYp = jnp.transpose(tmpl.dy, (2, 3, 1, 0))
    args = (win, Tp, DXp, DYp, tmpl.hes.T, ptr.T, p0.T, by[None, :], bx[None, :])
    kw = dict(psz=psz, sy=sy, sx=sx, nop=2, c=c, pad=pad, w=lw, h=lh, cfg=cfg, camlr=0)

    r_t = pk._gn_search_tiled(*args, ps=8, **kw)
    old = pk._gn_tiled_ps
    try:
        pk._gn_tiled_ps = lambda *a: None  # force the untiled kernel
        r_u = pk.gn_search_pallas(*args, **kw)
    finally:
        pk._gn_tiled_ps = old
    np.testing.assert_allclose(np.asarray(r_t[0]), np.asarray(r_u[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(r_t[2]), np.asarray(r_u[2]), atol=5e-2)
    assert (np.asarray(r_t[3]) == np.asarray(r_u[3])).mean() > 0.99


def test_fetch_windows_wide_window_band_coverage():
    """_fetch_windows' coarse 32-aligned band must cover bxr(<32)+nx columns.

    Regression: with the band hard-coded to 64 wide, any window wider than
    33 columns (patch_size >= 16, so sx = 2*psz+2 >= 34) on a level with
    wp > 64 read zero-padding in its last columns whenever bx % 32 was
    large — silently wrong GN residuals.  The band is now rounded up to
    32 + ceil(nx/32)*32."""
    from of_dis_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(7)
    hp, wp, c, n = 48, 150, 1, 128
    ny = nx = 34  # psz=16 -> sx=34 > 33
    img = jnp.asarray(rng.rand(c, hp, wp).astype(np.float32))
    by = jnp.asarray(rng.randint(0, hp - ny + 1, size=n).astype(np.int32))
    # include the worst case bx % 32 == 31 explicitly
    bx_np = rng.randint(0, wp - nx + 1, size=n).astype(np.int32)
    bx_np[0] = 31
    bx_np[1] = 63
    bx = jnp.asarray(bx_np)

    R2 = pk._row_onehot(by, ny, hp, n)
    win = np.asarray(
        pk._fetch_windows(img, R2, bx[None, :], ny=ny, nx=nx, hp=hp, wp=wp, n=n, c=c)
    )  # (nx, C, ny, N)
    ref = np.asarray(img)
    for i in range(n):
        expect = ref[0, by[i] : by[i] + ny, bx_np[i] : bx_np[i] + nx]  # (ny, nx)
        np.testing.assert_allclose(win[:, 0, :, i].T, expect, atol=1e-6,
                                   err_msg=f"patch {i} bx={bx_np[i]}")


@pytest.mark.parametrize("wp_img", [80, 134, 400])  # align-32 / wide-segment (mid + wide) branches
def test_gather_windows_band_matches_select(wp_img, monkeypatch):
    """gather_windows_rows(return_band=True) returns the coarse 64-wide band
    with window n at columns [bx_n % 32, bx_n % 32 + sx) — the contract the
    GN kernels' band_select prologue relies on — for both coarse-select
    gather branches and through lax.map chunking."""
    from of_dis_tpu.ops import interp

    rng = np.random.RandomState(11)
    hp, c, n = 60, 1, 300
    sy, sx = 18, 18
    img = jnp.asarray(rng.rand(hp, wp_img, c).astype(np.float32))
    by = jnp.asarray(rng.randint(0, hp - sy + 1, size=n).astype(np.int32))
    bx_np = rng.randint(0, wp_img - sx + 1, size=n).astype(np.int32)
    bx_np[:4] = [0, 31, 63, wp_img - sx]  # alignment corners
    bx = jnp.asarray(bx_np)

    monkeypatch.setattr(interp, "GATHER_CHUNK", 128)  # force chunked path too
    win = np.asarray(interp.gather_windows_rows(img, by, bx, sy, sx))
    band = np.asarray(
        interp.gather_windows_rows(img, by, bx, sy, sx, return_band=True)
    )
    assert band.shape == (64, c, sy, n)
    loc = bx_np % 32
    for i in range(n):
        np.testing.assert_array_equal(
            band[loc[i] : loc[i] + sx, :, :, i], win[:, :, :, i],
            err_msg=f"patch {i} bx={bx_np[i]}",
        )


def test_gn_band_select_matches_default(smooth_pair):
    """Feeding the GN kernel the coarse band (fine column select in-kernel)
    is exactly equivalent to feeding XLA-selected windows: the select math
    is 0/1-weighted sums, so every window value is bit-identical."""
    import of_dis_tpu.ops.pallas_kernels as pk

    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    pad = cfg.patch_size
    im1s, dx1s, dy1s = pyr.build_pyramid(jnp.asarray(img1[..., None]), 2, pad)
    im2s, _, _ = pyr.build_pyramid(jnp.asarray(img2[..., None]), 2, pad)
    sl = 1
    lw, lh = img1.shape[1] >> sl, img1.shape[0] >> sl
    geo = level_geometry(lw, lh, cfg)
    ptr = jnp.asarray(geo.pt_ref)
    tmpl = build_templates(im1s[sl], dx1s[sl], dy1s[sl], ptr, cfg, pad)
    rng = np.random.RandomState(5)
    p0 = jnp.asarray(rng.randn(geo.n_patches, 2).astype(np.float32))

    sx = min(2 * pad + 2, im2s[sl].shape[1])
    assert pk.gn_band_applicable(sx, im2s[sl].shape[1]) or not pk.GN_BAND_SELECT
    old = (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS, pk.GN_BAND_SELECT)
    try:
        pk.GN_PALLAS = pk.GN_PALLAS_CPU = True
        pk.LEVEL_PALLAS = False
        pk.GN_BAND_SELECT = True
        r_band = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
        pk.GN_BAND_SELECT = False
        r_win = optimize_level(im2s[sl], tmpl, ptr, p0, cfg, lw, lh, pad)
    finally:
        (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS, pk.GN_BAND_SELECT) = old
    np.testing.assert_array_equal(np.asarray(r_band.p), np.asarray(r_win.p))
    np.testing.assert_array_equal(
        np.asarray(r_band.pweight), np.asarray(r_win.pweight)
    )
    np.testing.assert_array_equal(
        np.asarray(r_band.converged), np.asarray(r_win.converged)
    )


def test_gn_band_select_tiled_matches_untiled(smooth_pair):
    """band_select through the big-N (PS, 128) patch-tiled kernel."""
    from of_dis_tpu.ops.interp import gather_windows_rows

    import of_dis_tpu.ops.pallas_kernels as pk

    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=0, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    pad = psz = cfg.patch_size
    im1s, dx1s, dy1s = pyr.build_pyramid(jnp.asarray(img1[..., None]), 1, pad)
    im2s, _, _ = pyr.build_pyramid(jnp.asarray(img2[..., None]), 1, pad)
    lh, lw = img1.shape
    geo = level_geometry(lw, lh, cfg)
    ptr = jnp.asarray(geo.pt_ref)
    tmpl = build_templates(im1s[0], dx1s[0], dy1s[0], ptr, cfg, pad)
    n = geo.n_patches
    p0 = jnp.zeros((n, 2), jnp.float32)

    hp, wp, c = im2s[0].shape
    lb = -(psz // 2)
    sy = min(2 * psz + 2, hp)
    sx = min(2 * psz + 2, wp)
    by = jnp.clip(jnp.floor(ptr[:, 1]).astype(jnp.int32) + lb - psz // 2 + pad, 0, hp - sy)
    bx = jnp.clip(jnp.floor(ptr[:, 0]).astype(jnp.int32) + lb - psz // 2 + pad, 0, wp - sx)
    band = gather_windows_rows(im2s[0], by, bx, sy, sx, return_band=True)
    win = gather_windows_rows(im2s[0], by, bx, sy, sx)
    Tp = jnp.transpose(tmpl.tmp, (2, 3, 1, 0))
    DXp = jnp.transpose(tmpl.dx, (2, 3, 1, 0))
    DYp = jnp.transpose(tmpl.dy, (2, 3, 1, 0))
    rest = (Tp, DXp, DYp, tmpl.hes.T, ptr.T, p0.T, by[None, :], bx[None, :])
    kw = dict(psz=psz, sy=sy, sx=sx, nop=2, c=c, pad=pad, w=lw, h=lh, cfg=cfg, camlr=0)

    r_band = pk._gn_search_tiled(band, *rest, ps=8, band_select=True, **kw)
    old = pk._gn_tiled_ps
    try:
        pk._gn_tiled_ps = lambda *a: None  # force the untiled kernel
        r_win = pk.gn_search_pallas(win, *rest, **kw)
    finally:
        pk._gn_tiled_ps = old
    np.testing.assert_allclose(np.asarray(r_band[0]), np.asarray(r_win[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(r_band[2]), np.asarray(r_win[2]), atol=5e-2)
    assert (np.asarray(r_band[3]) == np.asarray(r_win[3])).mean() > 0.99
