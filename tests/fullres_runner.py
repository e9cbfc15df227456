"""Subprocess runner for the full-resolution golden tests.

Runs OUTSIDE the conftest's forced-CPU config, on the machine's real
accelerator backend, and writes our pipeline's full-res outputs as .npy.

Also re-runs ONE case (of_int_op2) with the fused Pallas kernels disabled
(pure-XLA numerics) as `of_int_op2__xla.npy` — tests/test_golden_fullres.py
asserts BOTH paths against the golden AND against each other, so the three
copies of the search/refinement numerics (XLA, Pallas untiled, Pallas tiled)
cannot drift silently (SURVEY.md §4 item 2).

Usage:  python tests/fullres_runner.py <goldens/fullres dir> <outdir>
"""

import dataclasses
import json
import os
import sys


def main():
    fdir, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    # Fresh environments may not have the package pip-installed; the repo
    # root (parent of tests/) always works as an import path.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from of_dis_tpu import io, operating_point
    from of_dis_tpu.models import dis, refine
    from of_dis_tpu.models.dis import dis_raw
    from of_dis_tpu.ops import pallas_kernels

    with open(os.path.join(fdir, "manifest.json")) as f:
        manifest = json.load(f)

    def compute(case, suffix=""):
        ch = int(case.get("channels", 1))
        img1 = io.load_image(os.path.join(fdir, case["img1"]), ch)
        img2 = io.load_image(os.path.join(fdir, case["img2"]), ch)
        cfg = operating_point(case["op"], img1.shape[1], mode=case["mode"], channels=ch)
        if case.get("fbcon"):
            cfg = dataclasses.replace(cfg, use_fb_merge=True)
        out = np.asarray(dis_raw(img1, img2, cfg))
        np.save(os.path.join(outdir, case["case"] + suffix + ".npy"), out)
        print("computed", case["case"] + suffix, flush=True)

    for case in manifest["cases"]:
        compute(case)

    # A/B: the same pipeline with every fused Pallas kernel off (the XLA
    # copies of the GN state machine and the TV inner loop take over).
    pallas_kernels.GN_PALLAS = False
    refine.PALLAS_SOR_MAX_PIXELS = 0
    dis.dis_padded_jit.clear_cache()
    dis.dis_padded_init_jit.clear_cache()
    for case in manifest["cases"]:
        if case["case"] == "of_int_op2":
            compute(case, suffix="__xla")


if __name__ == "__main__":
    main()
