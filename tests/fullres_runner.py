"""Subprocess runner for the full-resolution golden tests.

Runs OUTSIDE the conftest's forced-CPU config, on the machine's real
accelerator backend, and writes our pipeline's full-res outputs as .npy.

Usage:  python tests/fullres_runner.py <goldens/fullres dir> <outdir>
"""

import json
import os
import sys


def main():
    fdir, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from of_dis_tpu import io, operating_point
    from of_dis_tpu.models.dis import dis_raw

    with open(os.path.join(fdir, "manifest.json")) as f:
        manifest = json.load(f)

    for case in manifest["cases"]:
        img1 = io.load_image(os.path.join(fdir, case["img1"]), 1)
        img2 = io.load_image(os.path.join(fdir, case["img2"]), 1)
        cfg = operating_point(case["op"], img1.shape[1], mode=case["mode"], channels=1)
        out = np.asarray(dis_raw(img1, img2, cfg))
        np.save(os.path.join(outdir, case["case"] + ".npy"), out)
        print("computed", case["case"], flush=True)


if __name__ == "__main__":
    main()
