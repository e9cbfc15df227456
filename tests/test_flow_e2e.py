"""End-to-end coarse-to-fine pipeline tests (small shapes for compile speed)."""

import numpy as np
import pytest

from of_dis_tpu import DISConfig, dis_flow, dis_stereo, auto_first_scale


def small_cfg(**kw):
    base = dict(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=8, min_iter=8,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    )
    base.update(kw)
    return DISConfig(**base).validate()


def test_translation_recovery(smooth_pair):
    img1, img2, (tu, tv) = smooth_pair
    flow = np.asarray(dis_flow(img1, img2, small_cfg()))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.1
    assert abs(np.median(inner[..., 1]) - tv) < 0.1


def test_translation_recovery_tv(smooth_pair):
    img1, img2, (tu, tv) = smooth_pair
    flow = np.asarray(dis_flow(img1, img2, small_cfg(use_tv_refine=True)))
    inner = flow[16:-16, 16:-16]
    epe = np.mean(np.hypot(inner[..., 0] - tu, inner[..., 1] - tv))
    assert epe < 0.25


def test_sc_l_upscale_and_crop(smooth_pair):
    """sc_l > 0: output upscaled x2^sc_l and values scaled (run_dense.cpp:406-414);
    odd input sizes exercise the divisibility padding + crop."""
    img1, img2, (tu, tv) = smooth_pair
    img1 = img1[:91, :121]
    img2 = img2[:91, :121]
    cfg = small_cfg(sc_f=2, sc_l=1)
    flow = np.asarray(dis_flow(img1, img2, cfg))
    assert flow.shape == (91, 121, 2)
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.25
    assert abs(np.median(inner[..., 1]) - tv) < 0.25


def test_fb_merge_e2e(smooth_pair):
    img1, img2, (tu, tv) = smooth_pair
    flow = np.asarray(dis_flow(img1, img2, small_cfg(use_fb_merge=True)))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.1
    assert abs(np.median(inner[..., 1]) - tv) < 0.1


def test_stereo_e2e(smooth_pair):
    imgL, _, _ = smooth_pair
    imgR = np.roll(imgL, -2, axis=1)  # imgR(x) = imgL(x+2) -> disparity -2
    cfg = small_cfg(mode="stereo", use_tv_refine=True)
    disp = np.asarray(dis_stereo(imgL, imgR, cfg))
    assert disp.shape == imgL.shape
    assert abs(np.median(disp[16:-16, 16:-16]) + 2.0) < 0.2
    assert np.all(disp <= 1e-6)  # left-camera sign convention


def test_init_flow_warm_start(smooth_pair):
    """initflow input applied at the coarsest scale (oflow.cpp:217-220)."""
    img1, img2, (tu, tv) = smooth_pair
    cfg = small_cfg(max_iter=2, min_iter=2)
    h2, w2 = img1.shape[0] >> (cfg.sc_f + 1), img1.shape[1] >> (cfg.sc_f + 1)
    good = np.zeros((h2, w2, 2), np.float32)
    good[..., 0] = tu / (1 << (cfg.sc_f + 1))
    good[..., 1] = tv / (1 << (cfg.sc_f + 1))
    from of_dis_tpu.models.dis import dis_raw

    flow = np.asarray(dis_raw(img1, img2, cfg, init_flow=good))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.15
    assert abs(np.median(inner[..., 1]) - tv) < 0.15


def test_auto_first_scale():
    # lv_f = floor(log2(2*1024/(5*8))) = floor(log2(51.2)) = 5
    assert auto_first_scale(1024, 5, 8) == 5
    assert auto_first_scale(1024, 5, 12) == 5  # floor(log2(34.1)) = 5
    assert auto_first_scale(64, 5, 8) == 1
    assert auto_first_scale(20, 5, 8) == 0


def test_determinism(smooth_pair):
    img1, img2, _ = smooth_pair
    cfg = small_cfg(use_tv_refine=True)
    a = np.asarray(dis_flow(img1, img2, cfg))
    b = np.asarray(dis_flow(img1, img2, cfg))
    np.testing.assert_array_equal(a, b)


def test_degenerate_tiny_levels():
    """Coarsest levels smaller than one patch (SURVEY §7 hard part 6) must
    still produce finite flow of the right shape."""
    import numpy as np

    from of_dis_tpu import DISConfig, dis_flow

    rng = np.random.RandomState(0)
    img1 = (rng.rand(16, 24) * 255).astype(np.float32)
    img2 = (rng.rand(16, 24) * 255).astype(np.float32)
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=2, min_iter=2,
        use_tv_refine=True, tv_solverit=1,
    ).validate()  # level 2 is 6x4 — smaller than the 8-px patch
    out = np.asarray(dis_flow(img1, img2, cfg))
    assert out.shape == (16, 24, 2)
    assert np.isfinite(out).all()


def test_odd_size_inputs():
    """Odd input dims exercise the divisibility padding + crop path."""
    import numpy as np

    from of_dis_tpu import DISConfig, dis_flow

    rng = np.random.RandomState(1)
    img1 = (rng.rand(37, 53) * 255).astype(np.float32)
    img2 = (rng.rand(37, 53) * 255).astype(np.float32)
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=1, max_iter=2, min_iter=2,
        use_tv_refine=False,
    ).validate()
    out = np.asarray(dis_flow(img1, img2, cfg))
    assert out.shape == (37, 53, 2)
    assert np.isfinite(out).all()


def test_fused_level_pipeline_matches_default(smooth_pair):
    """Full pipeline with the whole-level fused kernel forced (interpret
    mode) vs the XLA path: exercises the patches-last template build +
    in-kernel window build + absw densify wiring end-to-end."""
    import of_dis_tpu.ops.pallas_kernels as pk

    img1, img2, (tu, tv) = smooth_pair
    cfg = small_cfg(sc_f=1, sc_l=0, max_iter=4, min_iter=4, use_tv_refine=True)
    ref = np.asarray(dis_flow(img1, img2, cfg))
    old = (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS)
    try:
        pk.GN_PALLAS = pk.GN_PALLAS_CPU = pk.LEVEL_PALLAS = True
        from of_dis_tpu.models.dis import dis_padded_jit

        dis_padded_jit.clear_cache()
        fused = np.asarray(dis_flow(img1, img2, cfg))
    finally:
        pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS = old
        dis_padded_jit.clear_cache()
    # Same algorithm, different compilers: only reassociation separates them.
    np.testing.assert_allclose(fused, ref, atol=5e-3)
