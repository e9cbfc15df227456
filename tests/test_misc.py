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


def test_instrumented_runner_no_retrace_on_second_call(smooth_pair):
    """A second -v 2 invocation (same config/shapes) must pay ZERO trace
    cost: the stage jits are module-cached, so the timing table measures
    steady-state stage work like the reference's (oflow.cpp:296-304), not
    tracing (VERDICT r3 item 10)."""
    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=True,
    ).validate()
    import of_dis_tpu.utils.instrument as inst

    inst.dis_flow_timed(img1, img2, cfg)
    n_jits = len(inst._JIT_CACHE)
    n_traces = sum(f._cache_size() for f in inst._JIT_CACHE.values())
    inst.dis_flow_timed(img1, img2, cfg)
    assert len(inst._JIT_CACHE) == n_jits, "second call created new jit objects"
    assert (
        sum(f._cache_size() for f in inst._JIT_CACHE.values()) == n_traces
    ), "second call retraced a cached stage jit"


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


def test_coarse_idx_odd_level_in_bounds():
    """floor-halved init grids at odd level dims must clamp, not wrap
    (review finding: KITTI-width coarsest levels overflowed the grid)."""
    from of_dis_tpu import DISConfig
    from of_dis_tpu.models.grid import level_geometry

    cfg = DISConfig(mode="flow", channels=1, sc_f=1, sc_l=0).validate()
    geo = level_geometry(39, 19, cfg)  # odd level dims
    assert geo.coarse_idx.max() < (39 // 2) * (19 // 2) + (39 // 2)
    assert geo.coarse_idx.max() < (19 // 2) * (39 // 2)  # cy*cw+cx < ch*cw


def test_pnm_load_roundtrip(tmp_path):
    """P5/P6 loading via the native codec (NumPy fallback included)."""
    import numpy as np

    from of_dis_tpu import io

    rng = np.random.RandomState(0)
    gray = rng.randint(0, 255, (10, 12), np.uint8)
    p5 = tmp_path / "g.pgm"
    p5.write_bytes(b"P5\n# comment\n12 10\n255\n" + gray.tobytes())
    out = io.load_image(p5, 1)
    np.testing.assert_array_equal(out[..., 0].astype(np.uint8), gray)

    rgb = rng.randint(0, 255, (10, 12, 3), np.uint8)
    p6 = tmp_path / "c.ppm"
    p6.write_bytes(b"P6\n12 10\n255\n" + rgb.tobytes())
    out3 = io.load_image(p6, 3)
    np.testing.assert_array_equal(out3.astype(np.uint8), rgb)


def test_video_stereo_resume(tmp_path):
    """Stereo checkpoint/resume must skip completed .pfm outputs
    (review finding: the skip check looked for .flo names)."""
    import numpy as np

    from of_dis_tpu import DISConfig
    from of_dis_tpu.parallel.video import process_video

    rng = np.random.RandomState(0)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.rand(40, 64) * 255, 2.0).astype(np.float32)
    frames = [base[:, 3:-3], base[:, 6:], base[:, :-6]]
    cfg = DISConfig(
        mode="stereo", channels=1, sc_f=1, sc_l=0, max_iter=2, min_iter=2,
        use_tv_refine=False,
    ).validate()
    loader = lambda a: a
    outs1 = list(process_video(frames, tmp_path, cfg, loader=loader, warm_start=False))
    assert all(p.suffix == ".pfm" for _, p in outs1)
    mtimes = {p: p.stat().st_mtime_ns for _, p in outs1}
    outs2 = list(process_video(frames, tmp_path, cfg, loader=loader, warm_start=False))
    for _, p in outs2:
        assert p.stat().st_mtime_ns == mtimes[p], "completed pair was recomputed"


def test_instrumented_runner_with_fused_level_kernel(smooth_pair):
    """Deferred templates (hes=None) must survive the instrument path's jit
    boundaries.

    Regression: PatchTemplates briefly carried a `deferred: bool` field; as
    a NamedTuple leaf it came back from tmpl_jit as a traced bool and
    `if tmpl.deferred:` raised TracerBoolConversionError exactly when the
    whole-level fused kernel was applicable (op1/op2 coarse levels on TPU).
    The sentinel is now `hes is None`, which survives as a pytree None."""
    from of_dis_tpu.ops import pallas_kernels as pk
    from of_dis_tpu.utils.instrument import dis_flow_timed
    from of_dis_tpu.models.dis import dis_padded_jit
    import jax.numpy as jnp

    img1, img2, _ = smooth_pair
    cfg = DISConfig(
        mode="flow", channels=1, sc_f=2, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    old = (pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS)
    try:
        pk.GN_PALLAS = pk.GN_PALLAS_CPU = pk.LEVEL_PALLAS = True
        dis_padded_jit.clear_cache()
        flow_t, stats = dis_flow_timed(img1, img2, cfg)
        fused = np.asarray(dis_padded_jit(jnp.asarray(img1[..., None]),
                                          jnp.asarray(img2[..., None]), cfg))
    finally:
        pk.GN_PALLAS, pk.GN_PALLAS_CPU, pk.LEVEL_PALLAS = old
        dis_padded_jit.clear_cache()
    assert len(stats) == cfg.n_scales
    np.testing.assert_allclose(np.asarray(flow_t), fused, rtol=1e-3, atol=1e-3)
