#!/usr/bin/env python
"""End-to-end demo: compute flow for an image pair and write a color
visualization PNG (Middlebury color wheel) next to the .flo output.

Usage:  python scripts/demo.py img1 img2 [--op 2] [--out demo]
Writes <out>.flo and <out>.png.  With no inputs, runs on a synthetic pair.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from of_dis_tpu import dis_flow, io, operating_point
from of_dis_tpu.utils.viz import flow_to_color


def synthetic_pair():
    from scipy.ndimage import gaussian_filter, map_coordinates

    rng = np.random.RandomState(5)
    H, W = 256, 384
    base = gaussian_filter(rng.rand(H + 40, W + 40).astype(np.float32), 2.5)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    img1 = base[20 : 20 + H, 20 : 20 + W]
    u = gaussian_filter(rng.randn(H, W).astype(np.float32), 30)
    u = u / np.abs(u).max() * 6
    v = gaussian_filter(rng.randn(H, W).astype(np.float32), 30)
    v = v / np.abs(v).max() * 5
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img2 = map_coordinates(base, [yy + v + 20, xx + u + 20], order=1)
    return img1, img2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img1", nargs="?")
    ap.add_argument("img2", nargs="?")
    ap.add_argument("--op", type=int, default=2, choices=[1, 2, 3, 4])
    ap.add_argument("--out", default="demo")
    args = ap.parse_args()

    if args.img1 and args.img2:
        img1 = io.load_image(args.img1, 1)
        img2 = io.load_image(args.img2, 1)
    else:
        img1, img2 = synthetic_pair()
        print("no inputs given - using a synthetic warped pair")

    cfg = operating_point(args.op, img1.shape[1])
    flow = np.asarray(dis_flow(img1, img2, cfg))
    io.write_flo(f"{args.out}.flo", flow)
    rgb = flow_to_color(flow)
    try:
        from PIL import Image

        Image.fromarray(rgb).save(f"{args.out}.png")
    except ImportError:
        import cv2

        cv2.imwrite(f"{args.out}.png", rgb[..., ::-1])
    mag = np.sqrt((flow**2).sum(-1))
    print(f"wrote {args.out}.flo and {args.out}.png  "
          f"(|flow| mean {mag.mean():.2f} px, max {mag.max():.2f} px)")


if __name__ == "__main__":
    main()
