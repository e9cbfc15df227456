#!/usr/bin/env python
"""Evaluate EPE on MPI-Sintel training data (the reference's quality metric,
checked externally via the Sintel server — SURVEY.md §4).

Usage:
  python scripts/eval_sintel.py /path/to/MPI-Sintel --op 2 [--render final]
                                [--max-pairs 50] [--rgb]

Prints per-sequence and overall average EPE as JSON.
"""

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from of_dis_tpu import io, operating_point
from of_dis_tpu.models.dis import dis_raw
from of_dis_tpu.utils.eval import epe, sintel_pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--op", type=int, default=2)
    ap.add_argument("--render", default="final", choices=["final", "clean"])
    ap.add_argument("--max-pairs", type=int, default=0)
    ap.add_argument("--rgb", action="store_true")
    args = ap.parse_args()

    channels = 3 if args.rgb else 1
    cfg = None
    per_seq = defaultdict(list)
    n = 0
    t0 = time.perf_counter()
    for a, b, gt in sintel_pairs(args.root, "training", args.render):
        if gt is None:
            continue
        img1 = io.load_image(a, channels)
        img2 = io.load_image(b, channels)
        if cfg is None:
            cfg = operating_point(args.op, img1.shape[1], channels=channels)
        flow = np.asarray(dis_raw(img1, img2, cfg))
        e = epe(flow, io.read_flo(gt))
        per_seq[a.parent.name].append(e)
        n += 1
        if args.max_pairs and n >= args.max_pairs:
            break
    dt = time.perf_counter() - t0
    seqs = {k: float(np.mean(v)) for k, v in sorted(per_seq.items())}
    allv = [e for v in per_seq.values() for e in v]
    print(json.dumps({
        "op": args.op,
        "render": args.render,
        "pairs": n,
        "epe_all": float(np.mean(allv)) if allv else None,
        "pairs_per_s": n / dt if dt > 0 else None,
        "per_sequence": seqs,
    }, indent=2))


if __name__ == "__main__":
    main()
