"""Video / sequence processing: temporal warm start + checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5): a crash loses the run.
Here a video run is a sequence of idempotent frame-pair work units; progress
is a tiny JSON sidecar ("last completed frame index"), so a pod job can be
killed and resumed losslessly.  The (disabled) init-flow input of the
reference (oflow.cpp:217-220) becomes a live feature: each pair is warm-
started from the previous pair's flow, downsampled to the coarsest scale.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .. import io
from ..config import DISConfig
from ..models.dis import dis_raw
from ..ops.pyramid import divisibility_padding, pad_to_divisible, resize_bilinear


def _warm_start_from(flow: np.ndarray, cfg: DISConfig) -> jnp.ndarray:
    """Downsample a full-res flow to the sc_f+1 grid expected by the
    coarsest-scale init (run_dense.cpp:372-375 semantics: scale values and
    area-resample by 2^-(sc_f+1))."""
    scf = 1 << cfg.sc_f
    padded = pad_to_divisible(jnp.asarray(flow, jnp.float32), scf)
    fct = 2.0 ** (-(cfg.sc_f + 1))
    out_h = max(1, int(padded.shape[0] * fct))
    out_w = max(1, int(padded.shape[1] * fct))
    return resize_bilinear(padded * fct, out_h, out_w)


def process_video(
    frames: Sequence,
    out_dir,
    cfg: DISConfig,
    loader: Optional[Callable] = None,
    warm_start: bool = True,
    resume: bool = True,
) -> Iterator[Tuple[int, Path]]:
    """Compute flow for consecutive frame pairs; yields (index, out_path).

    Progress is checkpointed to out_dir/progress.json after each completed
    pair; with resume=True a restarted run skips completed work.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = out_dir / "progress.json"
    done = -1
    if resume and ckpt.exists():
        done = json.loads(ckpt.read_text()).get("last_completed", -1)

    load = loader or (lambda p: io.load_image(p, cfg.channels))
    prev_flow: Optional[np.ndarray] = None

    for i in range(len(frames) - 1):
        if cfg.mode == "flow":
            out_path = out_dir / f"flow_{i:06d}.flo"
        else:
            out_path = out_dir / f"disp_{i:06d}.pfm"
        if i <= done and out_path.exists():
            if warm_start and i == done:
                # only the LAST completed pair's flow seeds the next one;
                # stereo re-seeds from the .pfm in the internal (negated)
                # sign convention so a resumed run matches an uninterrupted one
                if cfg.mode == "flow":
                    prev_flow = io.read_flo(out_path)
                else:
                    prev_flow = np.asarray(io.read_pfm(out_path, negate=True))[..., None]
            yield i, out_path
            continue
        a = load(frames[i])
        b = load(frames[i + 1])
        init = None
        if warm_start and prev_flow is not None:
            init = _warm_start_from(prev_flow, cfg)
        flow = np.asarray(dis_raw(a, b, cfg, init_flow=init))
        if cfg.mode == "flow":
            io.write_flo(out_path, flow)
        else:
            io.write_pfm(out_path, flow[..., 0])
        prev_flow = flow
        # Atomic checkpoint: a kill mid-write must not corrupt progress.json
        # (resume would die on JSONDecodeError otherwise).
        tmp = ckpt.with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"last_completed": i}))
        os.replace(tmp, ckpt)
        yield i, out_path
