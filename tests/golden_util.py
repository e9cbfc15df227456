"""Shared helpers for golden-file replay (tests/test_golden.py, scripts)."""

import json
import os

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def load_manifest():
    with open(os.path.join(GOLD, "manifest.json")) as f:
        return json.load(f)


def cfg_for_case(case: dict, width: int):
    """Map a manifest case to (DISConfig, channels, gradmag)."""
    from of_dis_tpu.config import DISConfig, operating_point

    mode = "stereo" if case["out"].endswith(".pfm") else "flow"
    channels = 3 if case["binary"].endswith("RGB") else 1
    gradmag = case["binary"].endswith("GRAD")
    p = case.get("params")
    if p is None:
        cfg = operating_point(int(case["args"][0]), width, mode=mode, channels=channels)
    else:
        cfg = DISConfig(
            mode=mode,
            channels=channels,
            sc_f=int(p["lv_f"]),
            sc_l=int(p["lv_l"]),
            max_iter=int(p["maxiter"]),
            min_iter=int(p["miniter"]),
            dp_thresh=float(p["mindprate"]),
            dr_thresh=float(p["mindrrate"]),
            res_thresh=float(p["minimgerr"]),
            patch_size=int(p["patchsz"]),
            overlap=float(p["poverl"]),
            use_fb_merge=bool(p["usefbcon"]),
            patch_norm=bool(p["patnorm"]),
            cost=int(p["costfct"]),
            use_tv_refine=bool(p["usetvref"]),
            tv_alpha=float(p["tv_alpha"]),
            tv_gamma=float(p["tv_gamma"]),
            tv_delta=float(p["tv_delta"]),
            tv_innerit=int(p["tv_innerit"]),
            tv_solverit=int(p["tv_solverit"]),
            tv_sor=float(p["tv_sor"]),
        ).validate()
    return cfg, channels, gradmag


def run_case(case: dict):
    """Replay one golden case through the TPU pipeline.

    Returns (ours, golden) both (H, W, nop) float32 in the reference's
    internal sign convention.
    """
    from of_dis_tpu import io
    from of_dis_tpu.models.dis import dis_raw

    channels = 3 if case["binary"].endswith("RGB") else 1
    img1 = io.load_image(os.path.join(GOLD, case["img1"]), channels)
    img2 = io.load_image(os.path.join(GOLD, case["img2"]), channels)
    cfg, channels, gradmag = cfg_for_case(case, img1.shape[1])
    ours = np.asarray(dis_raw(img1, img2, cfg, gradmag_input=gradmag))
    if case["out"].endswith(".pfm"):
        golden = io.read_pfm(os.path.join(GOLD, case["out"]), negate=True)[..., None]
    else:
        golden = io.read_flo(os.path.join(GOLD, case["out"]))
    return ours, golden


def epe(a: np.ndarray, b: np.ndarray) -> float:
    """Mean endpoint error between two (H, W, nop) fields."""
    return float(np.mean(np.sqrt(np.sum((a - b) ** 2, axis=-1))))
