"""Densification vs NumPy oracle (AggregateFlowDense, patchgrid.cpp:213-397)."""

import numpy as np
import jax.numpy as jnp

from of_dis_tpu.config import DISConfig
from of_dis_tpu.models.densify import aggregate_flow_dense
from of_dis_tpu.models.grid import level_geometry
from of_dis_tpu.models.inverse_search import SearchResult

from oracle import aggregate_oracle


def _fake_result(geo, cfg, seed=0):
    rng = np.random.RandomState(seed)
    n = geo.n_patches
    psz = cfg.patch_size
    p = rng.randn(n, cfg.nop).astype(np.float32) * 2
    pw = np.abs(rng.randn(n, psz, psz, cfg.channels).astype(np.float32)) * 5
    pt = geo.pt_ref + (p if cfg.nop == 2 else np.concatenate([p, np.zeros_like(p)], 1))
    return SearchResult(
        p=jnp.asarray(p),
        pt=jnp.asarray(pt.astype(np.float32)),
        pweight=jnp.asarray(pw),
        converged=jnp.ones((n,), bool),
    )


def test_forward_densify_matches_oracle():
    cfg = DISConfig(mode="flow", channels=1, patch_size=8, overlap=0.4, sc_f=0, sc_l=0)
    w, h = 48, 32
    geo = level_geometry(w, h, cfg)
    res = _fake_result(geo, cfg)
    ours = np.asarray(aggregate_flow_dense(res, geo, cfg))
    ref = aggregate_oracle(
        geo.pt_ref, np.asarray(res.p), np.asarray(res.pweight), w, h,
        cfg.patch_size, cfg.nop, cfg.minerrval,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_forward_densify_rgb_weights():
    """RGB weight = 1/sum_c max(minerrval, err_c) (patchgrid.cpp:256-259)."""
    cfg = DISConfig(mode="flow", channels=3, patch_size=8, overlap=0.4, sc_f=0, sc_l=0)
    w, h = 48, 32
    geo = level_geometry(w, h, cfg)
    res = _fake_result(geo, cfg, seed=3)
    ours = np.asarray(aggregate_flow_dense(res, geo, cfg))
    ref = aggregate_oracle(
        geo.pt_ref, np.asarray(res.p), np.asarray(res.pweight), w, h,
        cfg.patch_size, cfg.nop, cfg.minerrval,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_stereo_densify():
    cfg = DISConfig(mode="stereo", channels=1, patch_size=8, overlap=0.4, sc_f=0, sc_l=0)
    w, h = 48, 32
    geo = level_geometry(w, h, cfg)
    res = _fake_result(geo, cfg, seed=5)
    ours = np.asarray(aggregate_flow_dense(res, geo, cfg))
    assert ours.shape == (h, w, 1)
    ref = aggregate_oracle(
        geo.pt_ref, np.asarray(res.p), np.asarray(res.pweight), w, h,
        cfg.patch_size, cfg.nop, cfg.minerrval,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fb_merge_identical_flows_cancel():
    """If backward flow == -forward flow everywhere with equal weights, the
    merged field equals the forward-only field (negated backward splat)."""
    cfg = DISConfig(mode="flow", channels=1, patch_size=8, overlap=0.4, sc_f=0, sc_l=0)
    w, h = 48, 32
    geo = level_geometry(w, h, cfg)
    n = geo.n_patches
    psz = cfg.patch_size
    p = np.tile(np.array([[1.5, -0.75]], np.float32), (n, 1))
    pw = np.ones((n, psz, psz, 1), np.float32)  # uniform weights
    fw = SearchResult(
        p=jnp.asarray(p), pt=jnp.asarray(geo.pt_ref + p),
        pweight=jnp.asarray(pw), converged=jnp.ones((n,), bool),
    )
    bw = SearchResult(
        p=jnp.asarray(-p), pt=jnp.asarray(geo.pt_ref - p),
        pweight=jnp.asarray(pw), converged=jnp.ones((n,), bool),
    )
    merged = np.asarray(aggregate_flow_dense(fw, geo, cfg, bw_result=bw))
    only_fw = np.asarray(aggregate_flow_dense(fw, geo, cfg))
    # Interior pixels (where both splats land) must agree exactly with the
    # constant flow; border behavior differs (bw splat excludes 1px frame).
    np.testing.assert_allclose(merged[8:-8, 8:-8], only_fw[8:-8, 8:-8], atol=1e-5)
    np.testing.assert_allclose(merged[8:-8, 8:-8, 0], 1.5, atol=1e-5)


def test_densify_deterministic():
    """Bit-identical across runs (the reference's parallel aggregation is
    documented racy, CMakeLists.txt:18-19 — ours must be deterministic)."""
    cfg = DISConfig(mode="flow", channels=1, patch_size=8, overlap=0.4, sc_f=0, sc_l=0)
    geo = level_geometry(48, 32, cfg)
    res = _fake_result(geo, cfg, seed=7)
    a = np.asarray(aggregate_flow_dense(res, geo, cfg))
    b = np.asarray(aggregate_flow_dense(res, geo, cfg))
    np.testing.assert_array_equal(a, b)
