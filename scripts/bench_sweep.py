#!/usr/bin/env python
"""Noise-robust benchmark sweep vs PINNED reference baselines.

Round-2 verdict: re-measuring the reference per run on this shared 1-core
host made the committed speedup flip around 10x run-to-run.  This version:

  (a) scores against PINNED reference numbers (best sustained measurement
      of the unmodified binaries on THIS machine across rounds 1-3; see
      REF_PINNED below and BASELINE.md).  When the binaries are present the
      reference is re-measured and reported for drift visibility, and the
      sweep scores against max(pinned, fresh) so the comparison can only be
      conservative.
  (b) uses the SAME committed image pair for both sides — the full-res
      golden inputs (tests/goldens/fullres/), real content at 1024x436 —
      instead of per-run random noise.
  (c) reports device-busy ms/pair (xplane trace, scripts/profile_tpu.py
      machinery) alongside wall-clock Hz, so tunnel-dispatch noise is
      visible separately from device regressions.

Reference binaries (optional, for the drift check):
    bash scripts/build_reference.sh
Run:  python scripts/bench_sweep.py [refbuild_dir]

Prints a markdown table; writes bench_sweep.json at the repo root.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")
FDIR = os.path.join(ROOT, "tests", "goldens", "fullres")
H, W = 436, 1024

# Pinned reference throughput (Hz) on this machine: the MAX over all
# recorded measurements (BASELINE.md table 2026-08-16; round-2/3 sweep
# re-measurements, best-of-reps of the "O.Flow Run-Time" algorithm-only
# timer).  Using the max makes every speedup in the artifact a lower bound.
REF_PINNED_HZ = {
    "of_op1": 873.4,   # BASELINE.md 654; r2 sweep best 873.4
    "of_op2": 346.9,   # BASELINE.md 262; r2 sweep best 329.9; stereo-pair 346.9
    "of_op3": 6.12,    # BASELINE.md 5.1; r2 sweep best 6.12
    "of_op4": 0.49,    # BASELINE.md 0.37; r2 sweep best 0.49
    "de_op2": 346.9,   # r2 sweep best
}


def run_reference(binpath, a, b, out, op, reps=5):
    """Best (min) algorithm-only ms over reps; None if unavailable."""
    times = []
    for _ in range(reps):
        r = subprocess.run([binpath, a, b, out, str(op)], capture_output=True, text=True)
        m = re.search(r"O.Flow Run-Time.*?:\s*([0-9.e+]+)", r.stdout)
        if r.returncode == 0 and m:
            times.append(float(m.group(1)))
    if not times:
        return None, None
    return min(times), _median(times)


def load_pair(stereo=False):
    from of_dis_tpu import io

    a = io.load_image(os.path.join(FDIR, "de1.png" if stereo else "of1.png"), 1)
    b = io.load_image(os.path.join(FDIR, "de2.png" if stereo else "of2.png"), 1)
    return a, b


# v5e peak HBM bandwidth (GB/s); the lens that matters here — the DIS
# workload is select/bandwidth-bound, not FLOP-bound (see ARCHITECTURE.md
# "Utilization"), so the sweep reports achieved GB/s vs this peak rather
# than an MFU that would read as ~0% by construction.
V5E_HBM_GBPS = 819.0


def bench_ours(cfg, img1, img2, B=16, nq=32, reps=3, trace_dir=None):
    """Sustained Hz on a deep queue + device-busy ms/pair from a trace."""
    import jax
    import jax.numpy as jnp

    from of_dis_tpu.ops import pyramid as pyr
    from of_dis_tpu.parallel.batch import _batched_padded

    scf = 1 << cfg.sc_f
    p1 = np.asarray(pyr.pad_to_divisible(jnp.asarray(img1, jnp.float32), scf))
    p2 = np.asarray(pyr.pad_to_divisible(jnp.asarray(img2, jnp.float32), scf))
    a = jax.device_put(jnp.asarray(np.broadcast_to(p1, (B,) + p1.shape)))
    b = jax.device_put(jnp.asarray(np.broadcast_to(p2, (B,) + p2.shape)))
    # One AOT compile serves the whole case: cost analysis, warm-up, the
    # bench loop and the trace all use the same executable (a second
    # jit-path compile of the identical program would add minutes per case).
    run = _batched_padded.lower(a, b, cfg).compile()
    flops = acc_bytes = None
    try:
        c = run.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        acc_bytes = float(c.get("bytes accessed", 0.0))
    except Exception as e:
        print(f"  (no cost analysis: {e})", file=sys.stderr)
    np.asarray(run(a, b))  # warm-up / first-dispatch
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for _ in range(nq):
            last = run(a, b)
        np.asarray(last)
        best = max(best, nq * B / (time.perf_counter() - t0))

    device_ms = None
    if trace_dir is not None:
        try:
            import shutil

            sys.path.insert(0, HERE)
            from profile_tpu import parse_trace_busy

            shutil.rmtree(trace_dir, ignore_errors=True)
            ncal = 3
            with jax.profiler.trace(trace_dir):
                last = None
                for _ in range(ncal):
                    last = run(a, b)
                np.asarray(last)
            # union of event intervals, NOT the per-op duration sum: while
            # ops re-emit their body fusions, so the sum double-counts loop
            # bodies (it exceeded wall-clock at op3/op4)
            busy_ps = parse_trace_busy(trace_dir)
            device_ms = busy_ps / 1e9 / ncal / B
        except Exception as e:  # CPU backend / no protoc: wall-clock only
            print(f"  (no device trace: {e})", file=sys.stderr)

    util = {}
    if flops is not None:
        util["flops_pair"] = flops / B
        util["hbm_bytes_pair"] = acc_bytes / B
    if device_ms is not None:
        # busy% = device time per pair over sustained wall per pair; the gap
        # is dispatch idle (the axon tunnel adds ~10 ms/call — CLAUDE.md).
        util["device_busy_pct"] = round(100.0 * device_ms / (1000.0 / best), 1)
        if acc_bytes is not None:
            gbps = (acc_bytes / B) / (device_ms * 1e-3) / 1e9
            util["device_gbps"] = round(gbps, 1)
            util["pct_hbm_peak"] = round(100.0 * gbps / V5E_HBM_GBPS, 1)
        if flops is not None:
            util["device_gflops"] = round(
                (flops / B) / (device_ms * 1e-3) / 1e9, 1
            )
    return best, device_ms, util


def main():
    refdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild"
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from of_dis_tpu import io, operating_point
    from of_dis_tpu.models.dis import dis_raw

    # Measured batch/queue sweet spots per op point (CLAUDE.md perf notes;
    # r3: deep queues amortize the ~2 ms/call tunnel-side execute overhead).
    shape = {1: (32, 128, 3), 2: (32, 128, 3), 3: (4, 16, 2), 4: (4, 4, 1)}
    rows = []

    def one_case(case, op, cfg, img1, img2, golden, refbin, B, nq, reps):
        ours_hz, device_ms, util = bench_ours(
            cfg, img1, img2, B=B, nq=nq, reps=reps, trace_dir=f"/tmp/ofdis_sweep_{case}"
        )
        row = dict(case=case, ours_hz=round(ours_hz, 1))
        if device_ms is not None:
            row["device_ms_pair"] = round(device_ms, 3)
        row.update(util)
        ref_hz = REF_PINNED_HZ[case]
        row["ref_hz_pinned"] = ref_hz
        if refbin and os.path.exists(refbin):
            out = os.path.join("/tmp", f"sweep_ref_{case}" + (".pfm" if case.startswith("de") else ".flo"))
            src = (os.path.join(FDIR, "de1.png"), os.path.join(FDIR, "de2.png")) \
                if case.startswith("de") else \
                (os.path.join(FDIR, "of1.png"), os.path.join(FDIR, "of2.png"))
            best_ms, med_ms = run_reference(refbin, src[0], src[1], out, op)
            if best_ms is not None:
                fresh = 1000.0 / best_ms
                row["ref_hz_fresh"] = round(fresh, 2)
                # median too: drift visibility on this noisy shared host
                row["ref_hz_fresh_median"] = round(1000.0 / med_ms, 2)
                if fresh > ref_hz:  # score conservatively
                    ref_hz = fresh
        row["speedup"] = round(ours_hz / ref_hz, 1)
        # Accuracy on the same pair vs the committed full-res golden.
        ours = np.asarray(dis_raw(img1, img2, cfg))
        if golden.ndim == 2:
            golden = golden[..., None]
        row["epe_vs_ref"] = round(
            float(np.mean(np.sqrt(np.sum((ours - golden.astype(np.float32)) ** 2, -1)))), 4
        )
        rows.append(row)
        print(f"  {case}: {row}", file=sys.stderr)

    of1, of2 = load_pair(False)
    de1, de2 = load_pair(True)
    for op in (1, 2, 3, 4):
        B, nq, reps = shape[op]
        cfg = operating_point(op, W)
        golden = np.load(os.path.join(FDIR, f"of_int_op{op}.npz"))["ref"]
        one_case(f"of_op{op}", op, cfg, of1, of2, golden,
                 os.path.join(refdir, "run_OF_INT"), B, nq, reps)
    cfg = operating_point(2, W, mode="stereo")
    golden = np.load(os.path.join(FDIR, "de_int_op2.npz"))["ref"]
    one_case("de_op2", 2, cfg, de1, de2, golden,
             os.path.join(refdir, "run_DE_INT"), 32, 128, 3)

    print("| case | ours (Hz) | device ms/pair | busy % | dev GB/s (%HBM) | ref pinned (Hz) | ref fresh (Hz) | speedup | EPE vs ref (px) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for c in rows:
        bw = (
            f"{c['device_gbps']} ({c['pct_hbm_peak']}%)"
            if "device_gbps" in c else "-"
        )
        print(
            f"| {c['case']} | {c['ours_hz']} | {c.get('device_ms_pair', '-')} | "
            f"{c.get('device_busy_pct', '-')} | {bw} | "
            f"{c['ref_hz_pinned']} | {c.get('ref_hz_fresh', '-')} | "
            f"{c['speedup']} | {c['epe_vs_ref']} |"
        )
    with open(os.path.join(ROOT, "bench_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
