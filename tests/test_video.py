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


@pytest.fixture()
def frame_seq():
    """6 in-memory frames with constant drift (2, 1) px/frame."""
    rng = np.random.RandomState(0)
    H, W = 48, 64
    base = gaussian_filter(rng.rand(H + 32, W + 32) * 255, 2.0).astype(np.float32)
    return [
        base[8 + i : 8 + i + H, 8 + 2 * i : 8 + 2 * i + W] for i in range(6)
    ]


def test_video_batched_serving(frame_seq, tmp_path):
    """Batched driver: N pairs per jit call, chunk-level checkpointing, and
    flow quality on a constant-drift sequence."""
    from of_dis_tpu import io
    from of_dis_tpu.parallel.video import process_video_batched

    out = tmp_path / "flows"
    results = list(
        process_video_batched(
            frame_seq, out, cfg(), batch_size=2, loader=lambda a: a
        )
    )
    assert [i for i, _ in results] == list(range(5))
    ck = json.loads((out / "progress.json").read_text())
    assert ck["last_completed"] == 4
    flow = io.read_flo(results[2][1])
    inner = flow[12:-12, 12:-12]
    assert abs(np.median(inner[..., 0]) + 2.0) < 0.3
    assert abs(np.median(inner[..., 1]) + 1.0) < 0.3


def test_video_batched_kill_resume_matches_uninterrupted(frame_seq, tmp_path):
    """A run killed mid-sequence and resumed must produce ALL outputs
    byte-identical to the uninterrupted batched run (same chunk boundaries,
    warm start re-read from the completed output file)."""
    from of_dis_tpu import io
    from of_dis_tpu.parallel.video import process_video_batched

    c = cfg()
    loader = lambda a: a

    full = tmp_path / "full"
    outs = list(
        process_video_batched(frame_seq, full, c, batch_size=2, loader=loader)
    )

    part = tmp_path / "part"
    it = process_video_batched(
        frame_seq, part, c, batch_size=2, loader=loader, queue_depth=0
    )
    next(it)
    next(it)  # chunk 0 (pairs 0, 1) completed, then "crash"
    del it
    ck = json.loads((part / "progress.json").read_text())
    assert ck["last_completed"] == 1
    outs2 = list(
        process_video_batched(frame_seq, part, c, batch_size=2, loader=loader)
    )
    assert [i for i, _ in outs2] == [i for i, _ in outs]
    for (i, p_full), (_, p_part) in zip(outs, outs2):
        np.testing.assert_array_equal(
            io.read_flo(p_full), io.read_flo(p_part), err_msg=f"pair {i}"
        )


def test_video_batched_last_partial_chunk_and_mesh(frame_seq, tmp_path):
    """Odd pair count (5 pairs, batch 4 -> padded final chunk) on a data
    mesh: every real output written, padding pairs never written."""
    from of_dis_tpu.parallel.batch import data_mesh
    from of_dis_tpu.parallel.video import process_video_batched

    out = tmp_path / "flows"
    results = list(
        process_video_batched(
            frame_seq, out, cfg(), batch_size=4, loader=lambda a: a,
            mesh=data_mesh(4),
        )
    )
    assert [i for i, _ in results] == list(range(5))
    assert sorted(p.name for p in out.glob("*.flo")) == [
        f"flow_{i:06d}.flo" for i in range(5)
    ]


def test_video_stereo_warm_resume_matches_uninterrupted(tmp_path):
    """Stereo warm start is live; a resumed run must re-seed from the last
    .pfm (internal sign convention) and produce identical remaining outputs
    (round-1 advisor finding: stereo resumed cold)."""
    rng = np.random.RandomState(1)
    base = gaussian_filter(rng.rand(40, 80) * 255, 2.0).astype(np.float32)
    frames = [base[:, 6:-6], base[:, 9:-3], base[:, 12:]]  # 3 px/frame shift
    c = DISConfig(
        mode="stereo", channels=1, sc_f=1, sc_l=0, max_iter=3, min_iter=3,
        patch_size=8, overlap=0.4, use_tv_refine=False,
    ).validate()
    loader = lambda a: a

    full = tmp_path / "full"
    outs = list(process_video(frames, full, c, loader=loader, warm_start=True))
    from of_dis_tpu import io
    want = io.read_pfm(outs[-1][1])

    part = tmp_path / "part"
    it = process_video(frames, part, c, loader=loader, warm_start=True)
    next(it)  # complete pair 0, then "crash"
    del it
    outs2 = list(process_video(frames, part, c, loader=loader, warm_start=True))
    got = io.read_pfm(outs2[-1][1])
    np.testing.assert_array_equal(got, want)
