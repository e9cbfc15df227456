#!/usr/bin/env python
"""Capture golden outputs from the UNMODIFIED reference binaries.

Generates deterministic synthetic image pairs, runs the reference binaries
(built by scripts/build_reference.sh) at the relevant operating points and
explicit-parameter variants, and stores inputs + outputs under tests/goldens/
with a manifest.json describing each case.  tests/test_golden.py then replays
every case through the TPU pipeline and asserts EPE-tolerance agreement
(SURVEY.md §4 item 1).

Run:  bash scripts/build_reference.sh /tmp/refbuild
      python scripts/capture_goldens.py /tmp/refbuild
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np
from scipy.ndimage import gaussian_filter, map_coordinates

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

H, W = 160, 256  # small enough for fast tests, big enough for 4 scales
FH, FW = 436, 1024  # full Sintel resolution (the reference's own QA scale)


def smooth_field(rng, h, w, sigma, amp):
    f = gaussian_filter(rng.randn(h, w).astype(np.float32), sigma)
    return f / (np.abs(f).max() + 1e-9) * amp


def make_of_pair(rng, h=H, w=W):
    """Gray+RGB pair related by a smooth synthetic flow (max ~6 px)."""
    base = gaussian_filter(rng.rand(h + 40, w + 40, 3).astype(np.float32), 2.5)
    base = (base - base.min()) / (base.max() - base.min()) * 255.0
    img1 = base[20 : 20 + h, 20 : 20 + w]
    u = smooth_field(rng, h, w, 24, 6.0)
    v = smooth_field(rng, h, w, 24, 4.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img2 = np.stack(
        [
            map_coordinates(base[..., c], [yy + v + 20, xx + u + 20], order=1)
            for c in range(3)
        ],
        axis=-1,
    )
    return img1.astype(np.uint8), img2.astype(np.uint8)


def make_textured_pair(rng):
    """High-frequency textured pair (checker + noise + edges) under the same
    smooth warp — stresses parity where gradients are sharp, unlike the
    smooth Gaussian fields of the main pair."""
    yy, xx = np.mgrid[0 : H + 40, 0 : W + 40].astype(np.float32)
    checker = (((yy // 9).astype(int) + (xx // 13).astype(int)) % 2) * 120.0
    blobs = gaussian_filter(rng.rand(H + 40, W + 40).astype(np.float32), 6) * 400
    noise = rng.rand(H + 40, W + 40).astype(np.float32) * 40
    base = np.clip(checker + blobs % 130 + noise, 0, 255)
    img1 = base[20 : 20 + H, 20 : 20 + W]
    u = smooth_field(rng, H, W, 20, 5.0)
    v = smooth_field(rng, H, W, 20, 4.0)
    yy2, xx2 = np.mgrid[0:H, 0:W].astype(np.float32)
    img2 = map_coordinates(base, [yy2 + v + 20, xx2 + u + 20], order=1)
    return img1.astype(np.uint8), img2.astype(np.uint8), np.stack([u, v], -1)


def make_rot_pair(rng, h=H, w=W):
    """Rotation + zoom warp (non-translational flow: every direction present,
    magnitude grows radially to ~6 px at the corners) — stresses the
    coarse-to-fine handoff and densify anisotropy that pure-translation
    content never exercises."""
    base = gaussian_filter(rng.rand(h + 40, w + 40, 3).astype(np.float32), 2.5)
    base = (base - base.min()) / (base.max() - base.min()) * 255.0
    img1 = base[20 : 20 + h, 20 : 20 + w]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = np.deg2rad(1.2)
    s = 1.015
    # backward map: position in img2 samples img1 at the inverse transform
    xr = (xx - cx) * np.cos(th) / s - (yy - cy) * np.sin(th) / s + cx
    yr = (xx - cx) * np.sin(th) / s + (yy - cy) * np.cos(th) / s + cy
    img2 = np.stack(
        [
            map_coordinates(base[..., c], [yr + 20, xr + 20], order=1)
            for c in range(3)
        ],
        axis=-1,
    )
    return img1.astype(np.uint8), img2.astype(np.uint8)


def make_bigdisp_pair(rng, h=H, w=W):
    """Large smooth displacement (~12 px max, 1.5x the op2 patch travel per
    level) — exercises the multi-level warm-start chain where a single
    level's search radius cannot reach the match."""
    base = gaussian_filter(rng.rand(h + 60, w + 60, 3).astype(np.float32), 3.0)
    base = (base - base.min()) / (base.max() - base.min()) * 255.0
    img1 = base[30 : 30 + h, 30 : 30 + w]
    u = smooth_field(rng, h, w, 32, 12.0)
    v = smooth_field(rng, h, w, 32, 8.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img2 = np.stack(
        [
            map_coordinates(base[..., c], [yy + v + 30, xx + u + 30], order=1)
            for c in range(3)
        ],
        axis=-1,
    )
    return img1.astype(np.uint8), img2.astype(np.uint8)


def make_de_pair(rng, h=H, w=W):
    """Rectified stereo pair, img1 = left camera: content shifts LEFT going
    left->right image, so the match for img1(x) is img2(x - d) with d in
    2..6 px — internal parameter p = -d <= 0 per the left-camera clamp
    (patch.cpp:188-193)."""
    base = gaussian_filter(rng.rand(h + 40, w + 40, 3).astype(np.float32), 2.5)
    base = (base - base.min()) / (base.max() - base.min()) * 255.0
    img1 = base[20 : 20 + h, 20 : 20 + w]
    d = 4.0 + smooth_field(rng, h, w, 30, 2.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img2 = np.stack(
        [
            map_coordinates(base[..., c], [yy + 20, xx + d + 20], order=1)
            for c in range(3)
        ],
        axis=-1,
    )
    return img1.astype(np.uint8), img2.astype(np.uint8)


def explicit_args(op2_scf, **ov):
    """Variant-3 argv (README.md:66-88) with op2 defaults at this width."""
    p = dict(
        lv_f=op2_scf, lv_l=max(op2_scf - 2, 0), miniter=12, maxiter=12,
        mindprate=0.05, mindrrate=0.95, minimgerr=0.0, patchsz=8, poverl=0.4,
        usefbcon=0, patnorm=1, costfct=0, usetvref=1, tv_alpha=10.0,
        tv_gamma=10.0, tv_delta=5.0, tv_innerit=1, tv_solverit=3, tv_sor=1.6,
        verbosity=0,
    )
    p.update(ov)
    order = [
        "lv_f", "lv_l", "miniter", "maxiter", "mindprate", "mindrrate",
        "minimgerr", "patchsz", "poverl", "usefbcon", "patnorm", "costfct",
        "usetvref", "tv_alpha", "tv_gamma", "tv_delta", "tv_innerit",
        "tv_solverit", "tv_sor", "verbosity",
    ]
    return [str(p[k]) for k in order], p


def main():
    refbin = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild"
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.RandomState(7)
    of1, of2 = make_of_pair(rng)
    de1, de2 = make_de_pair(np.random.RandomState(13))
    tx1, tx2, tx_gt = make_textured_pair(np.random.RandomState(21))
    rot1, rot2 = make_rot_pair(np.random.RandomState(33))
    big1, big2 = make_bigdisp_pair(np.random.RandomState(44))

    # cv2 writes BGR; store PNGs so cv::imread in the reference and our loader
    # see identical bytes.
    for name, img in [("of1.png", of1), ("of2.png", of2), ("de1.png", de1), ("de2.png", de2),
                      ("rot1.png", rot1), ("rot2.png", rot2), ("big1.png", big1), ("big2.png", big2)]:
        cv2.imwrite(os.path.join(GOLD, name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    for name, img in [("tx1.png", tx1), ("tx2.png", tx2)]:
        cv2.imwrite(os.path.join(GOLD, name), img)
    # True flow of the textured pair: high-frequency content makes the raw
    # (op1, no-TV) solution chaotic — equally-valid local minima differ
    # between compilers — so tests score those cases against TRUTH.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from of_dis_tpu import io as of_io

    of_io.write_flo(os.path.join(GOLD, "tx_gt.flo"), tx_gt)

    from of_dis_tpu.config import auto_first_scale

    scf8 = auto_first_scale(W, 5, 8)

    cases = []

    def run(case, binname, in1, in2, ext, args, params=None):
        out = os.path.join(GOLD, case + ext)
        cmd = [os.path.join(refbin, binname), os.path.join(GOLD, in1), os.path.join(GOLD, in2), out] + args
        subprocess.run(cmd, check=True, capture_output=True)
        cases.append(
            dict(case=case, binary=binname, img1=in1, img2=in2, out=case + ext, args=args, params=params)
        )
        print("captured", case)

    # Operating points 1-4, gray OF.
    for op in (1, 2, 3, 4):
        run(f"of_int_op{op}", "run_OF_INT", "of1.png", "of2.png", ".flo", [str(op)])
    # RGB OF, stereo gray/RGB, gradient-channel OF at op2.
    run("of_rgb_op2", "run_OF_RGB", "of1.png", "of2.png", ".flo", ["2"])
    run("de_int_op2", "run_DE_INT", "de1.png", "de2.png", ".pfm", ["2"])
    run("de_rgb_op2", "run_DE_RGB", "de1.png", "de2.png", ".pfm", ["2"])
    run("of_grad_op2", "run_OF_GRAD", "of1.png", "of2.png", ".flo", ["2"])
    # Textured (high-gradient) content, op1 + op2.
    run("of_tex_op1", "run_OF_INT", "tx1.png", "tx2.png", ".flo", ["1"])
    run("of_tex_op2", "run_OF_INT", "tx1.png", "tx2.png", ".flo", ["2"])
    # Rotation+zoom and large-displacement content at op2 (non-translational
    # flow; 12-px displacements that need the full warm-start chain).
    run("of_rot_op2", "run_OF_INT", "rot1.png", "rot2.png", ".flo", ["2"])
    run("of_big_op2", "run_OF_INT", "big1.png", "big2.png", ".flo", ["2"])

    # Variant-3 explicit-parameter cases exercising features op points skip.
    for case, ov in [
        ("of_int_fbcon", dict(usefbcon=1)),
        ("of_int_l1", dict(costfct=1, usetvref=0)),
        ("of_int_huber", dict(costfct=2, usetvref=0)),
        ("of_int_nonorm", dict(patnorm=0)),
        ("of_int_psz12", dict(patchsz=12, poverl=0.75)),
    ]:
        args, params = explicit_args(scf8, **ov)
        run(case, "run_OF_INT", "of1.png", "of2.png", ".flo", args, params)
    # Stereo with explicit params + fb-con.
    args, params = explicit_args(scf8, usefbcon=1)
    run("de_int_fbcon", "run_DE_INT", "de1.png", "de2.png", ".pfm", args, params)
    # RGB + fb-con (combination not covered by the op-point cases).
    args, params = explicit_args(scf8, usefbcon=1)
    run("of_rgb_fbcon", "run_OF_RGB", "of1.png", "of2.png", ".flo", args, params)

    # Pin each case's measured EPE (our pipeline vs the fresh golden, CPU
    # path) into the manifest: tests/test_golden.py asserts
    # EPE <= max(2 x recorded, 0.02) per case, so a capture-time 0.01-px
    # case can't silently drift to 0.07 under a blanket bound.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    from golden_util import epe as _epe, run_case as _run_case

    for c in cases:
        ours, golden = _run_case(c)
        c["epe_captured"] = round(_epe(ours, golden), 5)
        print("  epe", c["case"], c["epe_captured"])

    with open(os.path.join(GOLD, "manifest.json"), "w") as f:
        json.dump(dict(width=W, height=H, cases=cases), f, indent=1)
        f.write("\n")
    print(f"{len(cases)} goldens in {GOLD}")

    capture_fullres(refbin)


def capture_fullres(refbin):
    """Full-resolution (1024x436, the reference's own QA scale) goldens:
    op1-4 gray flow + op2 stereo.  Reference outputs are stored as float16
    .npz (tolerance is 0.08 px mean EPE; f16 resolution at |flow|<=8 is
    ~0.004 px).  Replayed on the real TPU by tests/test_golden_fullres.py."""
    fdir = os.path.join(GOLD, "fullres")
    os.makedirs(fdir, exist_ok=True)
    of1, of2 = make_of_pair(np.random.RandomState(7), FH, FW)
    de1, de2 = make_de_pair(np.random.RandomState(13), FH, FW)
    for name, img in [("of1.png", of1), ("of2.png", of2), ("de1.png", de1), ("de2.png", de2)]:
        cv2.imwrite(os.path.join(fdir, name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from of_dis_tpu import io as of_io

    cases = []

    def run(case, binname, in1, in2, ext, op, extra_args=(), channels=1, fbcon=False):
        out = os.path.join(fdir, case + ext)
        cmd = [
            os.path.join(refbin, binname),
            os.path.join(fdir, in1), os.path.join(fdir, in2), out,
        ] + ([str(op)] if not extra_args else list(extra_args))
        subprocess.run(cmd, check=True, capture_output=True)
        if ext == ".flo":
            ref = of_io.read_flo(out)
        else:  # internal sign convention (left-camera disparity <= 0)
            ref = of_io.read_pfm(out, negate=True)[..., None]
        np.savez_compressed(os.path.join(fdir, case + ".npz"), ref=ref.astype(np.float16))
        os.remove(out)
        cases.append(dict(case=case, img1=in1, img2=in2, out=case + ".npz", op=op,
                          mode="flow" if ext == ".flo" else "stereo",
                          channels=channels, fbcon=fbcon))
        print("captured fullres", case)

    for op in (1, 2, 3, 4):
        run(f"of_int_op{op}", "run_OF_INT", "of1.png", "of2.png", ".flo", op)
    run("de_int_op2", "run_DE_INT", "de1.png", "de2.png", ".pfm", 2)
    # RGB (C=3 kernel layouts) and fb-merge (merge splat) at full res — the
    # two features most entangled with the Pallas kernels' layout handling
    # (VERDICT r2 item 6; reference QA regime /root/reference/README.md:91-95).
    run("of_rgb_op2", "run_OF_RGB", "of1.png", "of2.png", ".flo", 2, channels=3)
    from of_dis_tpu.config import auto_first_scale as afs

    fb_args, _ = explicit_args(afs(FW), usefbcon=1)
    run("of_int_fbcon", "run_OF_INT", "of1.png", "of2.png", ".flo", 2,
        extra_args=fb_args, fbcon=True)

    with open(os.path.join(fdir, "manifest.json"), "w") as f:
        json.dump(dict(width=FW, height=FH, cases=cases), f, indent=1)
    print(f"{len(cases)} fullres goldens in {fdir}")


if __name__ == "__main__":
    main()
