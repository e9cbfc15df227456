#!/usr/bin/env python
"""Video-serving throughput: serial per-pair driver vs batched pod driver.

Measures parallel/video.py::process_video (one pair per dispatch, per-pair
warm-start chaining) against process_video_batched (batch_size pairs per jit
call, queue_depth chunks in flight, chunk-level warm start) on a synthetic
drifting sequence at Sintel resolution, writing outputs to a tmpdir like a
real run (file I/O included — this is the serving shape, not a kernel
micro-bench).

Run:  python scripts/bench_video.py [--frames 129] [--batch 32] [--op 2]
Writes bench_video.json at the repo root.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_frames(n, h, w, seed=0):
    """Smooth drifting sequence (2, 1) px/frame, Sintel-sized."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    pad = 2 * n + 8
    base = gaussian_filter(
        rng.rand(h + pad, w + pad).astype(np.float32) * 255, 2.0
    )
    return [
        np.ascontiguousarray(base[4 + i : 4 + i + h, 4 + 2 * i : 4 + 2 * i + w])
        for i in range(n)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=129)  # 128 pairs
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--queue-depth", type=int, default=4)
    ap.add_argument("--op", type=int, default=2)
    ap.add_argument("--serial-pairs", type=int, default=16,
                    help="pairs to time the serial driver on (it is slow)")
    args = ap.parse_args()

    from of_dis_tpu import operating_point
    from of_dis_tpu.parallel.video import process_video, process_video_batched

    H, W = 436, 1024
    cfg = operating_point(args.op, W)
    frames = make_frames(args.frames, H, W)
    loader = lambda x: x
    out = {}

    reps = 3  # CLAUDE.md: the tunnel has up to 2x run-to-run noise; best-of-3

    # --- serial driver (reference shape: one dispatch per pair) ---
    # Warm-up must consume TWO pairs: pair 0 compiles the cold-start program
    # (dis_padded_jit) and pair 1 the warm-started one (dis_padded_init_jit)
    # — a different jitted program; timing from pair 1 would bill its
    # compile to the serial driver.
    best = 0.0
    for _ in range(reps):
        d = tempfile.mkdtemp(prefix="ofdis_vid_serial_")
        try:
            it = process_video(
                frames[: args.serial_pairs + 1], d, cfg, loader=loader
            )
            next(it)
            next(it)
            t0 = time.perf_counter()
            n = sum(1 for _ in it)
            dt = time.perf_counter() - t0
            best = max(best, n / dt)
            out["serial_pairs"] = n
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["serial_hz"] = round(best, 2)

    # --- batched driver (pod serving shape) ---
    # compile outside the timed window with a short prefix run (covers both
    # the chunk program and the warm-start program)
    d = tempfile.mkdtemp(prefix="ofdis_vid_batched_")
    try:
        list(process_video_batched(
            frames[: 2 * args.batch + 1], d, cfg, batch_size=args.batch,
            loader=loader, resume=False,
        ))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    best = 0.0
    for _ in range(reps):
        d = tempfile.mkdtemp(prefix="ofdis_vid_batched_")
        try:
            t0 = time.perf_counter()
            res = list(process_video_batched(
                frames, d, cfg, batch_size=args.batch, loader=loader,
                queue_depth=args.queue_depth, resume=False,
            ))
            dt = time.perf_counter() - t0
            best = max(best, len(res) / dt)
            out["batched_pairs"] = len(res)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["batched_hz"] = round(best, 2)
    out["batch_size"] = args.batch
    out["queue_depth"] = args.queue_depth

    out["speedup_batched_vs_serial"] = round(out["batched_hz"] / out["serial_hz"], 1)
    out["op"] = args.op
    print(json.dumps(out))
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(root, "bench_video.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
