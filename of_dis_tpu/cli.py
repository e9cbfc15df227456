"""Command-line drivers mirroring the reference's 4 binaries.

The reference compiles run_OF_INT / run_OF_RGB / run_DE_INT / run_DE_RGB from
a SELECTMODE x SELECTCHANNEL matrix (CMakeLists.txt:24-46); here one CLI
covers all variants with runtime flags.  Argument variants follow
run_dense.cpp:225-294 / README.md:51-88:

  of-dis img1 img2 out.flo                      # operating point 2
  of-dis img1 img2 out.flo --op 3               # operating point 1-4
  of-dis img1 img2 out.flo --params 5 3 12 12 0.05 0.95 0 8 0.4 0 1 0 1 10 10 5 1 3 1.6 2

Mode is inferred from the output extension (.flo -> flow, .pfm -> stereo)
and can be forced with --mode; --rgb selects 3-channel input; --gradmag uses
the gradient-magnitude input image (reference SELECTCHANNEL==2).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from . import io
from .config import DISConfig, auto_first_scale, operating_point
from .models.dis import dis_raw
from .utils.timing import StageTimer


def _cfg_from_params(params, width: int, mode: str, channels: int, camlr: int = 0) -> DISConfig:
    """The 20 explicit positional parameters (run_dense.cpp:269-294)."""
    if len(params) != 20:
        raise SystemExit(f"--params needs exactly 20 values, got {len(params)}")
    p = params
    return DISConfig(
        mode=mode,
        channels=channels,
        camlr=camlr,
        sc_f=int(p[0]),
        sc_l=int(p[1]),
        max_iter=int(p[2]),
        min_iter=int(p[3]),
        dp_thresh=float(p[4]),
        dr_thresh=float(p[5]),
        res_thresh=float(p[6]),
        patch_size=int(p[7]),
        overlap=float(p[8]),
        use_fb_merge=bool(int(p[9])),
        patch_norm=bool(int(p[10])),
        cost=int(p[11]),
        use_tv_refine=bool(int(p[12])),
        tv_alpha=float(p[13]),
        tv_gamma=float(p[14]),
        tv_delta=float(p[15]),
        tv_innerit=int(p[16]),
        tv_solverit=int(p[17]),
        tv_sor=float(p[18]),
        verbosity=int(p[19]),
    ).validate()


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS even under platform plugins that ignore the env
    # var at import time (the axon remote-TPU plugin): the config update
    # still works as long as no backend has been initialized yet.
    import os

    envp = os.environ.get("JAX_PLATFORMS")
    if envp:
        import jax

        try:
            jax.config.update("jax_platforms", envp)
        except Exception as e:
            print(
                f"of-dis: warning: could not honor JAX_PLATFORMS={envp!r} "
                f"({e}); continuing on the default backend",
                file=sys.stderr,
            )

    ap = argparse.ArgumentParser(prog="of-dis", description=__doc__)
    ap.add_argument("img1")
    ap.add_argument("img2")
    ap.add_argument("out")
    ap.add_argument("--op", type=int, default=2, choices=[1, 2, 3, 4])
    ap.add_argument("--params", type=float, nargs="*", default=None,
                    help="20 explicit parameters (reference variant 3)")
    ap.add_argument("--mode", choices=["flow", "stereo"], default=None)
    ap.add_argument("--rgb", action="store_true")
    ap.add_argument("--gradmag", action="store_true",
                    help="gradient-magnitude input image (SELECTCHANNEL==2)")
    ap.add_argument("--camlr", type=int, default=0, choices=[0, 1])
    ap.add_argument("--init-flow", default=None,
                    help=".flo warm start at the coarsest scale (oflow.cpp:217-220)")
    ap.add_argument("--viz", default=None, metavar="IMG",
                    help="also write a visualization image (Middlebury color "
                         "wheel for flow, grayscale ramp for disparity) — the "
                         "reference's DISVISUAL display, live (oflow.cpp:307-335)")
    ap.add_argument("-v", "--verbosity", type=int, default=2)
    args = ap.parse_args(argv)

    mode = args.mode or ("stereo" if args.out.endswith(".pfm") else "flow")
    channels = 3 if args.rgb else 1

    timer = StageTimer(args.verbosity)
    with timer.stage("Image loading"):
        try:
            img1 = io.load_image(args.img1, channels)
            img2 = io.load_image(args.img2, channels)
        except FileNotFoundError as e:
            raise SystemExit(f"of-dis: cannot open input image: {e.filename}")
    if img1.shape != img2.shape:
        raise SystemExit(
            f"of-dis: input images differ in size: {img1.shape[:2]} vs {img2.shape[:2]}"
        )

    if args.params is not None:
        cfg = _cfg_from_params(args.params, img1.shape[1], mode, channels, args.camlr)
    else:
        cfg = operating_point(args.op, img1.shape[1], mode=mode, channels=channels,
                              verbosity=args.verbosity, camlr=args.camlr)

    init_flow = None
    if args.init_flow:
        init = io.read_flo(args.init_flow)
        # resize to scale sc_f+1 like the reference's (disabled) init path
        # (run_dense.cpp:355-378): scale values and area-resample.
        from .ops.pyramid import pad_to_divisible, resize_bilinear
        import jax.numpy as jnp

        scf = 1 << cfg.sc_f
        padded = pad_to_divisible(jnp.asarray(init), scf)
        fct = 2.0 ** (-cfg.sc_f - 1)
        init_flow = resize_bilinear(
            padded * fct, int(padded.shape[0] * fct), int(padded.shape[1] * fct)
        )

    if args.verbosity > 1:
        # Per-scale stage table (oflow.cpp:296-304) — runs the same stage
        # functions as dis_raw, each synced for timing.
        from .utils.instrument import dis_flow_timed

        out, _ = dis_flow_timed(img1, img2, cfg, verbosity=args.verbosity,
                                gradmag_input=args.gradmag, init_flow=init_flow)
        out = np.asarray(out)
    else:
        with timer.stage("O.Flow Run-Time", sync=None):
            out = np.asarray(dis_raw(img1, img2, cfg, init_flow=init_flow,
                                     gradmag_input=args.gradmag))

    with timer.stage("Saving flow file"):
        if mode == "flow":
            io.write_flo(args.out, out)
        else:
            io.write_pfm(args.out, out[..., 0])
    if args.viz:
        from .utils import viz

        if mode == "flow":
            viz.save_image(args.viz, viz.flow_to_color(out))
        else:
            viz.save_image(args.viz, viz.disparity_to_gray(out))
    if args.verbosity <= 1:
        # at verbosity 2 the instrumented path already printed the total
        timer.report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
