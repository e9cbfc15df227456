#!/usr/bin/env python
"""Full benchmark sweep: our TPU pipeline vs the reference CPU binaries.

Measures sustained frame-pairs/s at Sintel resolution (1024x436) for
operating points 1-4 (optical flow, gray) and op2 stereo, plus accuracy
(mean EPE vs the reference output on the same synthetic pair).

Reference binaries must be built first:  bash scripts/build_reference.sh
Run:  python scripts/bench_sweep.py [refbuild_dir]

Prints a markdown table; also writes bench_sweep.json next to this script.
"""

import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

H, W = 436, 1024


def make_pair(tmp):
    import cv2
    from scipy.ndimage import gaussian_filter, map_coordinates

    rng = np.random.RandomState(3)
    base = gaussian_filter(rng.rand(H + 40, W + 40).astype(np.float32), 2.5)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    img1 = base[20 : 20 + H, 20 : 20 + W]
    u = gaussian_filter(rng.randn(H, W).astype(np.float32), 30)
    u = u / np.abs(u).max() * 8
    v = gaussian_filter(rng.randn(H, W).astype(np.float32), 30)
    v = v / np.abs(v).max() * 6
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img2 = map_coordinates(base, [yy + v + 20, xx + u + 20], order=1)
    p1, p2 = os.path.join(tmp, "a.png"), os.path.join(tmp, "b.png")
    cv2.imwrite(p1, img1.astype(np.uint8))
    cv2.imwrite(p2, img2.astype(np.uint8))
    # stereo: shift left by 4 +- 2 px
    d = 4.0 + gaussian_filter(rng.randn(H, W).astype(np.float32), 30) * 2
    img2s = map_coordinates(base, [yy + 20, xx + d + 20], order=1)
    p2s = os.path.join(tmp, "r.png")
    cv2.imwrite(p2s, img2s.astype(np.uint8))
    return p1, p2, p2s


def run_reference(binpath, a, b, out, op, reps=3):
    best = float("inf")
    for _ in range(reps):
        r = subprocess.run([binpath, a, b, out, str(op)], capture_output=True, text=True)
        m = re.search(r"O.Flow Run-Time.*?:\s*([0-9.e+]+)", r.stdout)
        if r.returncode == 0 and m:
            best = min(best, float(m.group(1)))
    return best if best < float("inf") else None  # ms/pair


def bench_ours(cfg, B=16, nq=32, reps=3):
    import jax
    import jax.numpy as jnp

    from of_dis_tpu.parallel.batch import _batched_padded

    rng = np.random.RandomState(0)
    scf = 1 << cfg.sc_f
    Hp = H + (-H) % scf
    a = jax.device_put(jnp.asarray(rng.rand(B, Hp, W, 1).astype(np.float32) * 255))
    b = jax.device_put(jnp.asarray(rng.rand(B, Hp, W, 1).astype(np.float32) * 255))
    np.asarray(_batched_padded(a, b, cfg))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for _ in range(nq):
            last = _batched_padded(a, b, cfg)
        np.asarray(last)
        best = max(best, nq * B / (time.perf_counter() - t0))
    return best  # Hz


def main():
    refdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from of_dis_tpu import io, operating_point
    from of_dis_tpu.models.dis import dis_raw

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        a, b, r = make_pair(tmp)
        # op3/op4 reach fine levels with 10-50k patches; smaller batches keep
        # the window working set in HBM (reference runtimes there are
        # 200-2700 ms/pair, so queueing matters less).
        # Measured sweet spots: op3 degrades above B=4 (VMEM pressure);
        # op4 gains ~20% at B=4 over B=2 (sublane packing).
        shape = {1: (16, 32, 3), 2: (16, 32, 3), 3: (4, 8, 2), 4: (4, 2, 1)}
        for op in (1, 2, 3, 4):
            B, nq, reps = shape[op]
            cfg = operating_point(op, W)
            ours_hz = bench_ours(cfg, B=B, nq=nq, reps=reps)
            case = dict(case=f"of_op{op}", ours_hz=round(ours_hz, 1))
            refbin = os.path.join(refdir, "run_OF_INT")
            ref_ms = run_reference(refbin, a, b, os.path.join(tmp, "ref.flo"), op) \
                if os.path.exists(refbin) else None
            if ref_ms is not None:
                out = os.path.join(tmp, "ref.flo")
                case["ref_hz"] = round(1000.0 / ref_ms, 2)
                case["speedup"] = round(ours_hz * ref_ms / 1000.0, 1)
                img1 = io.load_image(a, 1)
                img2 = io.load_image(b, 1)
                flow = np.asarray(dis_raw(img1, img2, cfg))
                golden = io.read_flo(out)
                case["epe_vs_ref"] = round(
                    float(np.mean(np.sqrt(np.sum((flow - golden) ** 2, -1)))), 4
                )
            rows.append(case)
        # stereo op2
        cfg = operating_point(2, W, mode="stereo")
        ours_hz = bench_ours(cfg)
        case = dict(case="de_op2", ours_hz=round(ours_hz, 1))
        refbin = os.path.join(refdir, "run_DE_INT")
        ref_ms = run_reference(refbin, a, r, os.path.join(tmp, "ref.pfm"), 2) \
            if os.path.exists(refbin) else None
        if ref_ms is not None:
            out = os.path.join(tmp, "ref.pfm")
            case["ref_hz"] = round(1000.0 / ref_ms, 2)
            case["speedup"] = round(ours_hz * ref_ms / 1000.0, 1)
            img1 = io.load_image(a, 1)
            img2 = io.load_image(r, 1)
            disp = np.asarray(dis_raw(img1, img2, cfg))[..., 0]
            golden = io.read_pfm(out, negate=True)
            case["epe_vs_ref"] = round(float(np.mean(np.abs(disp - golden))), 4)
        rows.append(case)

    print("| case | ours (Hz) | reference (Hz) | speedup | EPE vs ref (px) |")
    print("|---|---|---|---|---|")
    for c in rows:
        print(
            f"| {c['case']} | {c['ours_hz']} | {c.get('ref_hz', '-')} | "
            f"{c.get('speedup', '-')} | {c.get('epe_vs_ref', '-')} |"
        )
    with open(os.path.join(os.path.dirname(__file__), "..", "bench_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
