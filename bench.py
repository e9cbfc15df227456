#!/usr/bin/env python
"""Headline benchmark: frame-pairs/s at 1024x436 (Sintel resolution),
operating point 2, single chip, batched serving path.

Baseline: the DIS paper's ~300 Hz single-CPU-core claim for op2 at this
resolution, confirmed on this machine by running the rebuilt reference
binary (scripts/build_reference.sh): ~260 Hz (BASELINE.md).
vs_baseline = ours / 300.

Measurement notes:
  - Results are forced with a host fetch (np.asarray) — on the axon remote
    platform only a data dependency is a trustworthy barrier.
  - Batch 16 x 64 queued calls measures SUSTAINED pipelined throughput, the
    production video-serving shape: the queue keeps the chip busy so the
    remote-tunnel dispatch latency (~10 ms/call, not device time) overlaps
    with compute.
  - Best of 3 repetitions: the tunnel shares the chip; single runs have
    up to 2x run-to-run noise.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def _wait_for_device(max_wait_s: float = 3600.0):
    """The axon TPU tunnel flaps occasionally (hours-long outages observed);
    a bench run that starts during a flap should wait (bounded — an hour —
    so a permanently-dead tunnel still surfaces as a failure), not crash
    immediately, so the recorded artifact reflects the code, not the
    tunnel."""
    import subprocess
    import sys

    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180,
            )
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if time.time() - t0 > max_wait_s:
            print("bench.py: device unavailable after retries", file=sys.stderr)
            return  # let the real failure surface below
        print("bench.py: device unavailable, retrying in 60 s", file=sys.stderr)
        time.sleep(60)


def main():
    _wait_for_device()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from of_dis_tpu import io, operating_point
    from of_dis_tpu.ops import pyramid as pyr
    from of_dis_tpu.parallel.batch import _batched_padded

    # B=32 x 128 queued calls: the whole-level fused kernels (r3) moved the
    # bottleneck from VMEM pressure to per-call tunnel overhead, so deeper
    # queues + larger batches now win (B=16/NQ=64 measured 4.3k Hz vs
    # 6.4k Hz here at op2; B>=48 regresses on device).
    H, W, B, NQ, REPS = 436, 1024, 32, 128, 3
    cfg = operating_point(2, W)
    scf = 1 << cfg.sc_f
    # The committed full-res golden pair — the SAME inputs the reference
    # binaries are benchmarked on (timing is content-independent with
    # min_iter == max_iter, but identical inputs foreclose any doubt).
    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "goldens", "fullres")
    img1 = io.load_image(os.path.join(fdir, "of1.png"), 1)
    img2 = io.load_image(os.path.join(fdir, "of2.png"), 1)
    p1 = np.asarray(pyr.pad_to_divisible(jnp.asarray(img1, jnp.float32), scf))
    p2 = np.asarray(pyr.pad_to_divisible(jnp.asarray(img2, jnp.float32), scf))
    a = jax.device_put(jnp.asarray(np.broadcast_to(p1, (B,) + p1.shape)))
    b = jax.device_put(jnp.asarray(np.broadcast_to(p2, (B,) + p2.shape)))

    # Warm up / compile.
    np.asarray(_batched_padded(a, b, cfg))

    fps = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        last = None
        for _ in range(NQ):
            last = _batched_padded(a, b, cfg)
        np.asarray(last)  # data dependency forces completion of the whole queue
        dt = time.perf_counter() - t0
        fps = max(fps, NQ * B / dt)

    print(
        json.dumps(
            {
                "metric": "frame_pairs_per_s_1024x436_op2_sustained",
                "value": round(fps, 2),
                "unit": "Hz",
                "vs_baseline": round(fps / 300.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
