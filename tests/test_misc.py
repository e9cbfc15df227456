"""NCC cost, instrumented timing path, viz, eval metrics."""

import numpy as np
import pytest

from of_dis_tpu import DISConfig, dis_flow
from of_dis_tpu.utils.eval import disparity_error_stats, epe, flow_error_stats
from of_dis_tpu.utils.viz import disparity_to_gray, flow_to_color


def test_ncc_cost_recovers_translation_under_gain_change(smooth_pair):
    """Real NCC cost (cost=10): robust to multiplicative brightness change
    that breaks plain L2 matching badly.  (Reference advertises 10/NCC but
    silently no-ops, patch.cpp:223-262 — this is the fidelity-plus path.)"""
    img1, img2, (tu, tv) = smooth_pair
    img2_gain = img2 * 1.5  # strong gain change
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=8, min_iter=8,
        patch_size=8, overlap=0.4, use_tv_refine=False, cost=10,
    ).validate()
    flow = np.asarray(dis_flow(img1, img2_gain, cfg))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.3
    assert abs(np.median(inner[..., 1]) - tv) < 0.3


def test_instrumented_runner_matches_fused(smooth_pair):
    img1, img2, (tu, tv) = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=True,
    ).validate()
    from of_dis_tpu.utils.instrument import dis_flow_timed

    flow_t, stats = dis_flow_timed(img1, img2, cfg)
    assert len(stats) == cfg.n_scales
    assert all(s["total"] > 0 for s in stats)
    from of_dis_tpu.models.dis import dis_padded_jit
    import jax.numpy as jnp

    fused = np.asarray(dis_padded_jit(jnp.asarray(img1[..., None]),
                                      jnp.asarray(img2[..., None]), cfg))
    np.testing.assert_allclose(np.asarray(flow_t), fused, rtol=1e-3, atol=1e-3)


def test_epe_and_stats():
    gt = np.zeros((4, 5, 2))
    fl = np.zeros((4, 5, 2))
    fl[0, 0] = [3, 4]  # error 5 at one pixel
    assert abs(epe(fl, gt) - 0.25) < 1e-9
    st = flow_error_stats(fl, gt)
    assert st["err_gt_3px"] == pytest.approx(1 / 20)
    d = disparity_error_stats(np.ones((3, 3)), np.zeros((3, 3)))
    assert d["avgerr"] == 1.0 and d["bad_0.5"] == 1.0 and d["bad_2.0"] == 0.0


def test_flow_to_color_shapes():
    f = np.random.RandomState(0).randn(8, 9, 2)
    c = flow_to_color(f)
    assert c.shape == (8, 9, 3) and c.dtype == np.uint8
    g = disparity_to_gray(-np.abs(np.random.rand(8, 9)))
    assert g.shape == (8, 9) and g.dtype == np.uint8
