#!/usr/bin/env python
"""Headline benchmark: frame-pairs/s at 1024x436 (Sintel resolution),
operating point 2, single chip.

Baseline: the DIS paper's ~300 Hz single-CPU-core claim for op2 at this
resolution (BASELINE.md; arXiv:1603.03590 — the repository itself publishes
no numbers).  vs_baseline = ours / 300.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax

    from of_dis_tpu import operating_point
    from of_dis_tpu.models.dis import dis_padded_jit
    from of_dis_tpu.ops import pyramid as pyr

    H, W = 436, 1024
    rng = np.random.RandomState(0)
    # Smooth-ish synthetic pair; content does not change the fixed-iteration
    # op-point cost (min_iter == max_iter disables early stopping).
    base = rng.rand(H + 8, W + 8, 1).astype(np.float32) * 255
    img1 = base[4 : 4 + H, 4 : 4 + W]
    img2 = base[2 : 2 + H, 7 : 7 + W]

    cfg = operating_point(2, W)
    scf = 1 << cfg.sc_f
    p1 = pyr.pad_to_divisible(np.asarray(img1), scf)
    p2 = pyr.pad_to_divisible(np.asarray(img2), scf)
    p1 = jax.device_put(p1)
    p2 = jax.device_put(p2)

    # Warm up / compile.
    flow = dis_padded_jit(p1, p2, cfg)
    jax.block_until_ready(flow)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        flow = dis_padded_jit(p1, p2, cfg)
    jax.block_until_ready(flow)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "frame_pairs_per_s_1024x436_op2",
                "value": round(fps, 2),
                "unit": "Hz",
                "vs_baseline": round(fps / 300.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
