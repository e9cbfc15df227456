#!/usr/bin/env python
"""A/B the in-kernel band column select (OF_DIS_GN_BAND_SELECT) on the
real chip: sustained Hz + device-busy ms/pair at op1 and op3 on the golden
full-res pair.  One subprocess per setting (the flag is baked into the
traced program, so flipping it in-process would hit the jit cache).

Run:  python scripts/ab_band.py          # both settings, op1 + op3
Decision rule (CLAUDE.md: measure before defaulting): flip the default in
of_dis_tpu/ops/pallas_kernels.py only if band=1 wins BOTH wall Hz and
device ms outside tunnel noise (~5%).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))

_CHILD = r"""
import json, sys
sys.path.insert(0, %(root)r)
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from of_dis_tpu import operating_point
from bench_sweep import W, bench_ours, load_pair

of1, of2 = load_pair(False)
res = {}
for op, (B, nq, reps) in ((1, (32, 128, 3)), (3, (4, 16, 2))):
    cfg = operating_point(op, W)
    hz, dms, _util = bench_ours(
        cfg, of1, of2, B=B, nq=nq, reps=reps,
        trace_dir=f"/tmp/ab_band_op{op}",
    )
    res[f"op{op}"] = {
        "hz": round(hz, 1),
        "device_ms": round(dms, 3) if dms is not None else None,
    }
print("ABRESULT " + json.dumps(res))
"""


def main():
    out = {}
    for v in ("0", "1"):
        env = dict(os.environ, OF_DIS_GN_BAND_SELECT=v)
        r = subprocess.run(
            [sys.executable, "-c", _CHILD % {"root": ROOT, "here": HERE}],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = next(
            (ln for ln in r.stdout.splitlines() if ln.startswith("ABRESULT ")), None
        )
        if line is None:
            print(f"band={v} FAILED:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
            sys.exit(1)
        out[f"band{v}"] = json.loads(line[len("ABRESULT "):])
        print(f"band={v}: {out[f'band{v}']}")
    for op in ("op1", "op3"):
        a, b = out["band0"][op], out["band1"][op]
        print(
            f"{op}: band0 {a['hz']} Hz / {a['device_ms']} ms  ->  "
            f"band1 {b['hz']} Hz / {b['device_ms']} ms  "
            f"({(b['hz'] / a['hz'] - 1) * 100:+.1f}% wall)"
        )
    with open("/tmp/ab_band.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
