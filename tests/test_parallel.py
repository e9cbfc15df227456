"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4.3).

Invariant: sharded result == single-device result, bit-exact per pair.
"""

import jax
import numpy as np
import pytest

from of_dis_tpu import DISConfig
from of_dis_tpu.parallel.batch import batched_flow, data_mesh


def tiny_cfg():
    return DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=3, min_iter=3,
        patch_size=8, overlap=0.4, use_tv_refine=True, tv_solverit=2,
    ).validate()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    B, H, W = 8, 40, 48
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.rand(B, H + 8, W + 8) * 255, (0, 2, 2)).astype(np.float32)
    return base[:, 4 : 4 + H, 4 : 4 + W], base[:, 2 : 2 + H, 7 : 7 + W]


def test_vmap_matches_loop(batch):
    a, b = batch
    cfg = tiny_cfg()
    batched = np.asarray(batched_flow(a, b, cfg))
    from of_dis_tpu import dis_flow

    single = np.asarray(dis_flow(a[3], b[3], cfg))
    np.testing.assert_allclose(batched[3], single, rtol=1e-3, atol=5e-4)


def test_data_parallel_sharding_matches_single(batch):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    a, b = batch
    cfg = tiny_cfg()
    mesh = data_mesh(8)
    sharded = np.asarray(batched_flow(a, b, cfg, mesh=mesh))
    unsharded = np.asarray(batched_flow(a, b, cfg))
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-3, atol=5e-4)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace-only check (full 1024x436 compile is exercised by bench)
    jax.eval_shape(fn, *args)
    ge.dryrun_multichip(8)


def test_flow_2d_mesh_matches_single(batch):
    """(data, tx) 2-D mesh: batch sharded over data, each pair tiled over tx
    with halo exchange — must match the unsharded pipeline."""
    from of_dis_tpu.parallel.multihost import flow_2d, mesh_2d

    a, b = batch
    cfg = tiny_cfg()
    mesh = mesh_2d(n_data=4, n_tx=2)
    out = np.asarray(flow_2d(a, b, cfg, mesh))
    ref = np.asarray(batched_flow(a, b, cfg))
    # batched_flow upscales to input res when sc_l != 0; here sc_l == 0 so
    # shapes match directly.
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-4)


def test_flow_2d_tiled_3axis_matches_single(batch):
    """(data, ty, tx) 3-axis mesh (SURVEY §5 full composition): batch over
    data, each pair on the tile-LOCAL 2-D path — must match unsharded."""
    from of_dis_tpu.parallel.multihost import flow_2d_tiled, mesh_3d

    a, b = batch
    a, b = a[:4], b[:4]
    cfg = tiny_cfg()
    mesh = mesh_3d(n_data=2, n_ty=2, n_tx=2)
    out, cc = flow_2d_tiled(a, b, cfg, mesh, return_diagnostics=True)
    out = np.asarray(out)
    ref = np.asarray(batched_flow(a, b, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-4)
    # per-pair clamp diagnostics: one count per pair in the batch
    for k, v in cc.items():
        assert np.asarray(v).shape == (4,), (k, np.asarray(v).shape)


def test_init_distributed_single_host_noop():
    from of_dis_tpu.parallel.multihost import init_distributed

    init_distributed()  # must be a no-op without a cluster env
