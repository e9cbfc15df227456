#!/usr/bin/env python
"""Headline benchmark: frame-pairs/s at 1024x436 (Sintel resolution),
operating point 2, single chip, batched serving path.

Baseline: the DIS paper's ~300 Hz single-CPU-core claim for op2 at this
resolution (BASELINE.md; the repository itself publishes no numbers).
vs_baseline = ours / 300.

Measurement notes: results are forced with a host fetch (np.asarray) — on
the axon remote platform block_until_ready can return before execution, so
only a data dependency is a trustworthy barrier.  Batch size 32 amortizes
per-dispatch overhead exactly as a production video pipeline would.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from of_dis_tpu import operating_point
    from of_dis_tpu.ops import pyramid as pyr
    from of_dis_tpu.parallel.batch import _batched_padded

    H, W, B = 436, 1024, 32
    rng = np.random.RandomState(0)
    cfg = operating_point(2, W)
    scf = 1 << cfg.sc_f
    Hp = H + (-H) % scf
    a = jax.device_put(jnp.asarray(rng.rand(B, Hp, W, 1).astype(np.float32) * 255))
    b = jax.device_put(jnp.asarray(rng.rand(B, Hp, W, 1).astype(np.float32) * 255))

    # Warm up / compile.
    np.asarray(_batched_padded(a, b, cfg))

    n_iter = 10
    t0 = time.perf_counter()
    last = None
    for _ in range(n_iter):
        last = _batched_padded(a, b, cfg)
    np.asarray(last)  # data dependency forces completion of the whole queue
    dt = time.perf_counter() - t0
    fps = n_iter * B / dt

    print(
        json.dumps(
            {
                "metric": "frame_pairs_per_s_1024x436_op2_batch32",
                "value": round(fps, 2),
                "unit": "Hz",
                "vs_baseline": round(fps / 300.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
