"""Worker process for the 2-process distributed CPU test.

Joins a real multi-process JAX runtime via jax.distributed.initialize
(SURVEY.md §5: the multi-host bring-up path used on TPU pods, exercised here
with 2 localhost processes x 4 virtual CPU devices), runs batched_flow's
jitted core over the GLOBAL 8-device data mesh with
jax.make_array_from_process_local_data, and checks this process's shards of
the global result against a locally-computed unsharded reference.

Usage: python tests/dist_worker.py <coordinator> <num_processes> <process_id>
Prints "DIST_OK" and exits 0 on success.
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        t for t in flags.split() if "xla_force_host_platform_device_count" not in t
    )
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    from of_dis_tpu.parallel.multihost import init_distributed

    init_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from scipy.ndimage import gaussian_filter

    from of_dis_tpu import DISConfig
    from of_dis_tpu.parallel.batch import _batched_padded

    cfg = DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=True, tv_solverit=2,
    ).validate()
    B, H, W = 8, 64, 96  # divisible by 2^sc_f; one pair per global device
    rng = np.random.RandomState(7)
    base = gaussian_filter(
        rng.rand(B, H + 16, W + 16).astype(np.float32), (0, 2.5, 2.5)
    ) * 255
    a = np.ascontiguousarray(base[:, 8 : 8 + H, 8 : 8 + W][..., None])
    b = np.ascontiguousarray(base[:, 6 : 6 + H, 11 : 11 + W][..., None])

    # Global (data,) mesh over BOTH processes' devices; this process feeds
    # only its local batch rows (the multi-host input pattern).
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    k = B // nproc
    ga = jax.make_array_from_process_local_data(sh, a[pid * k : (pid + 1) * k])
    gb = jax.make_array_from_process_local_data(sh, b[pid * k : (pid + 1) * k])
    # Pin the output sharding to the data mesh (GSPMD otherwise may choose a
    # replicated output layout, hiding the per-process shard structure this
    # test asserts).
    from of_dis_tpu.models.dis import _dis_padded

    fn = jax.jit(
        lambda x, y: jax.vmap(lambda u, v: _dis_padded(u, v, cfg))(x, y),
        out_shardings=sh,
    )
    flow = fn(ga, gb)

    # Unsharded local reference for this process's rows.
    ref = np.asarray(
        _batched_padded(jnp.asarray(a[pid * k : (pid + 1) * k]),
                        jnp.asarray(b[pid * k : (pid + 1) * k]), cfg)
    )
    n_checked = 0
    for shard in flow.addressable_shards:
        lo = shard.index[0].start or 0
        rows = np.asarray(shard.data)
        np.testing.assert_allclose(
            rows, ref[lo - pid * k : lo - pid * k + rows.shape[0]],
            rtol=1e-5, atol=1e-5,
        )
        n_checked += rows.shape[0]
    assert n_checked == k, n_checked

    # --- cross-process SPATIAL phase: one pair tiled over a tx axis that
    # spans BOTH processes (multihost.py's ICI/DCN split claim: the ppermute
    # halo exchange + psum densify here actually crosses the process
    # boundary).  Strips are exact: must match the single-process pipeline.
    import time as _time

    from of_dis_tpu.parallel.spatial import spatial_fn

    def _log(msg):
        print(f"[worker {pid} t={_time.monotonic():.1f}s] {msg}", flush=True)

    mesh_tx = Mesh(np.asarray(jax.devices()), ("tx",))
    rep = NamedSharding(mesh_tx, P())
    ga1 = jax.make_array_from_process_local_data(rep, a[0].astype(np.float32))
    gb1 = jax.make_array_from_process_local_data(rep, b[0].astype(np.float32))
    # AOT-compile BEFORE the first cross-process collective, then barrier:
    # the first Gloo collective initializes its context under a ~30 s
    # timeout, and trace/compile skew between two workers interleaving on
    # this shared, loaded 1-core host routinely exceeds that.  The barrier
    # must therefore NOT itself be a Gloo collective
    # (multihost_utils.sync_global_devices trips the same 30 s window) —
    # use the coordination-service barrier, which takes an explicit timeout.
    _log("compiling spatial program")
    compiled = jax.jit(spatial_fn(cfg, mesh_tx, "tx")).lower(ga1, gb1).compile()
    _log("compiled; entering coordination barrier")
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        "ofdis_spatial_compiled", timeout_in_ms=600_000
    )
    _log("barrier passed; executing")
    sflow = compiled(ga1, gb1)
    got = np.asarray(sflow.addressable_shards[0].data)
    ref1 = np.asarray(
        _batched_padded(jnp.asarray(a[:1]), jnp.asarray(b[:1]), cfg)
    )[0]
    np.testing.assert_allclose(got, ref1, rtol=1e-4, atol=1e-4)
    print("DIST_SPATIAL_OK", flush=True)

    # --- cross-process 2-D TILED phase: (ty, tx) spanning both processes —
    # tile-local level images, window halo exchange and the densify
    # halo-REDUCE (ppermute) all cross the process boundary.
    from of_dis_tpu.parallel.spatial import spatial_tiled_fn

    mesh_t = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("ty", "tx"))
    H_, W_ = a.shape[1], a.shape[2]
    tfn, own = spatial_tiled_fn(cfg, mesh_t, H_, W_)
    assert own, "expected at least one tile-local level in the 2-proc tiled phase"
    sh_t = NamedSharding(mesh_t, P("ty", "tx", None))

    # inputs shard over (ty, tx): feed each process its local rows
    def shard_rows(full):
        # ty axis (2) maps to processes 0/1 here (devices 0-3 = proc 0 row 0)
        k = full.shape[0] // 2
        return jax.make_array_from_process_local_data(
            sh_t, np.ascontiguousarray(full[pid * k : (pid + 1) * k])
        )

    ta = shard_rows(a[0].astype(np.float32))
    tb = shard_rows(b[0].astype(np.float32))
    # ownership tables shard over (ty, tx) as well: feed local ty rows
    own_g = {
        k: (
            jax.make_array_from_process_local_data(
                sh_t, np.asarray(idx)[pid : pid + 1]
            ),
            jax.make_array_from_process_local_data(
                sh_t, np.asarray(valid)[pid : pid + 1]
            ),
        )
        for k, (idx, valid) in own.items()
    }
    tcompiled = jax.jit(tfn).lower(ta, tb, own_g).compile()
    _dist.global_state.client.wait_at_barrier(
        "ofdis_tiled_compiled", timeout_in_ms=600_000
    )
    _log("tiled barrier passed; executing")
    tflow, _cc = tcompiled(ta, tb, own_g)
    got_t = np.asarray(tflow.addressable_shards[0].data)
    np.testing.assert_allclose(got_t, ref1, rtol=1e-3, atol=1e-3)
    print("DIST_TILED_OK", flush=True)

    jax.distributed.shutdown()
    print("DIST_OK", flush=True)


if __name__ == "__main__":
    main()
