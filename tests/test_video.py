"""Video pipeline: warm start + checkpoint/resume."""

import json

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from of_dis_tpu import DISConfig
from of_dis_tpu.parallel.video import process_video


@pytest.fixture()
def frame_files(tmp_path):
    rng = np.random.RandomState(0)
    H, W = 48, 64
    base = gaussian_filter(rng.rand(H + 24, W + 24) * 255, 2.0).astype(np.float32)
    paths = []
    for i in range(4):
        f = base[8 + i : 8 + i + H, 8 + 2 * i : 8 + 2 * i + W]  # drift (2,1)/frame
        p = tmp_path / f"frame_{i}.npy"
        np.save(p, f)
        paths.append(p)
    return paths


def cfg():
    return DISConfig(
        mode="flow", channels=1, sc_f=1, sc_l=0, max_iter=4, min_iter=4,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()


def test_video_warm_start_and_checkpoint(frame_files, tmp_path):
    out = tmp_path / "flows"
    results = list(process_video(frame_files, out, cfg()))
    assert len(results) == 3
    ck = json.loads((out / "progress.json").read_text())
    assert ck["last_completed"] == 2
    from of_dis_tpu import io

    flow = io.read_flo(results[1][1])
    inner = flow[12:-12, 12:-12]
    assert abs(np.median(inner[..., 0]) + 2.0) < 0.3   # u = -2 per frame
    assert abs(np.median(inner[..., 1]) + 1.0) < 0.3   # v = -1


def test_video_resume_skips_done(frame_files, tmp_path, monkeypatch):
    out = tmp_path / "flows"
    list(process_video(frame_files, out, cfg()))
    # Resumed run must not recompute: poison dis_raw to detect calls.
    import of_dis_tpu.parallel.video as vid

    def boom(*a, **k):
        raise RuntimeError("should not recompute completed pairs")

    monkeypatch.setattr(vid, "dis_raw", boom)
    results = list(process_video(frame_files, out, cfg()))
    assert len(results) == 3
