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
from functools import partial
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import io
from ..config import DISConfig
from ..models.dis import _dis_padded, dis_raw
from ..ops.pyramid import divisibility_padding, pad_to_divisible, resize_bilinear


def _warm_start_from(flow, cfg: DISConfig) -> jnp.ndarray:
    """Downsample a full-res flow to the sc_f+1 grid expected by the
    coarsest-scale init (run_dense.cpp:372-375 semantics: scale values and
    area-resample by 2^-(sc_f+1))."""
    scf = 1 << cfg.sc_f
    padded = pad_to_divisible(jnp.asarray(flow, jnp.float32), scf)
    fct = 2.0 ** (-(cfg.sc_f + 1))
    out_h = max(1, int(padded.shape[0] * fct))
    out_w = max(1, int(padded.shape[1] * fct))
    return resize_bilinear(padded * fct, out_h, out_w)


# Jitted alias used by the batched driver for BOTH the live device-side
# chain and resume's file read-back: one program, so a resumed run's warm
# starts match the uninterrupted run's bit-exactly (float32 .flo/.pfm
# round-trips are byte-exact).
_warm_single = partial(jax.jit, static_argnames=("cfg",))(_warm_start_from)


def _pair_path(out_dir: Path, cfg: DISConfig, i: int) -> Path:
    """Output file of pair i — shared by BOTH drivers (cross-driver resume
    depends on the naming staying identical)."""
    if cfg.mode == "flow":
        return out_dir / f"flow_{i:06d}.flo"
    return out_dir / f"disp_{i:06d}.pfm"


def _read_pair(out_dir: Path, cfg: DISConfig, i: int) -> np.ndarray:
    """Read pair i's output back in the INTERNAL convention (stereo .pfm
    negates on write, so negate on read) — shared by both drivers' resume."""
    if cfg.mode == "flow":
        return io.read_flo(_pair_path(out_dir, cfg, i))
    return np.asarray(io.read_pfm(_pair_path(out_dir, cfg, i), negate=True))[..., None]


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
        out_path = _pair_path(out_dir, cfg, i)
        if i <= done and out_path.exists():
            if warm_start and i == done:
                # only the LAST completed pair's flow seeds the next one;
                # stereo re-seeds from the .pfm in the internal (negated)
                # sign convention so a resumed run matches an uninterrupted one
                prev_flow = _read_pair(out_dir, cfg, i)
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


# ---------------------------------------------------------------------------
# Batched serving (pod-run driver): N pairs per jit call + deep queue
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "h0", "w0"))
def _video_chunk(p1, p2, init, cfg: DISConfig, h0: int, w0: int):
    """One serving chunk: (B, Hp, Wp, C) pre-padded pairs, one SHARED warm
    start `init` (sc_f+1 grid), -> cropped full-res flow (B, h0, w0, nop)."""
    flow = jax.vmap(lambda a, b: _dis_padded(a, b, cfg, init_flow=init))(p1, p2)
    if cfg.sc_l != 0:
        sc = float(1 << cfg.sc_l)
        flow = jax.vmap(
            lambda f: resize_bilinear(f * sc, p1.shape[1], p1.shape[2])
        )(flow)
    t, _, l, _ = divisibility_padding(h0, w0, 1 << cfg.sc_f)
    return flow[:, t : t + h0, l : l + w0]


def process_video_batched(
    frames: Sequence,
    out_dir,
    cfg: DISConfig,
    batch_size: int = 32,
    loader: Optional[Callable] = None,
    warm_start: bool = True,
    resume: bool = True,
    queue_depth: int = 4,
    mesh=None,
) -> Iterator[Tuple[int, Path]]:
    """Batched, checkpointed video serving (SURVEY §5 pod-run driver).

    Unlike process_video (one pair per dispatch), this packs `batch_size`
    consecutive pairs into ONE jitted call and keeps up to `queue_depth`
    chunks in flight (dispatch chunk j+1..j+q before blocking on chunk j's
    file writes) — the deep-queue/batch-32 serving shape the bench measures.
    With `mesh` (a 1-D "data" mesh, parallel.batch.data_mesh), each chunk
    additionally shards over devices with zero communication.

    Temporal warm start chains ACROSS chunks: every pair in chunk j+1 is
    seeded from chunk j's LAST pair flow (the chain stays device-side, so
    queueing never forces a host sync).  This deviates from process_video's
    per-pair chaining — a deliberate throughput trade; warm starts are an
    optimization hint, not part of the output contract.

    Progress checkpointing uses the SAME atomic progress.json sidecar as
    process_video ("last_completed" pair index, written once per completed
    chunk).  Chunk boundaries are absolute (pair j*B..), so a killed run
    resumed mid-sequence recomputes from its last completed chunk with the
    same boundaries and a warm start re-read from the completed output file
    — the resumed outputs match the uninterrupted run's bit-exactly
    (tested: tests/test_video.py).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = out_dir / "progress.json"
    n_pairs = len(frames) - 1
    if n_pairs <= 0:
        return
    done = -1
    if resume and ckpt.exists():
        done = json.loads(ckpt.read_text()).get("last_completed", -1)

    load = loader or (lambda p: io.load_image(p, cfg.channels))
    pair_path = lambda i: _pair_path(out_dir, cfg, i)
    read_back = lambda i: _read_pair(out_dir, cfg, i)

    B = batch_size
    start_chunk = 0
    init = None
    scf = 1 << cfg.sc_f
    # Skip fully-completed chunks (chunk j covers pairs j*B .. min((j+1)*B,n)-1).
    while start_chunk * B < n_pairs and min((start_chunk + 1) * B, n_pairs) - 1 <= done:
        c0, c1 = start_chunk * B, min((start_chunk + 1) * B, n_pairs)
        if not all(pair_path(i).exists() for i in range(c0, c1)):
            break
        for i in range(c0, c1):
            yield i, pair_path(i)
        start_chunk += 1
    if warm_start and start_chunk > 0:
        prev_i = start_chunk * B - 1
        if pair_path(prev_i).exists():
            init = _warm_single(jnp.asarray(read_back(prev_i), jnp.float32), cfg)

    sh = None if mesh is None else NamedSharding(mesh, P("data"))
    pending = []  # [(chunk_start, n_real, device_flows)]

    def flush_one():
        c0, n_real, flows = pending.pop(0)
        flows = np.asarray(flows)  # forces THIS chunk only
        for k in range(n_real):
            p = pair_path(c0 + k)
            if cfg.mode == "flow":
                io.write_flo(p, flows[k])
            else:
                io.write_pfm(p, flows[k, ..., 0])
        tmp = ckpt.with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"last_completed": c0 + n_real - 1}))
        os.replace(tmp, ckpt)
        return [(c0 + k, pair_path(c0 + k)) for k in range(n_real)]

    h0 = w0 = None
    for j in range(start_chunk, (n_pairs + B - 1) // B):
        c0, c1 = j * B, min((j + 1) * B, n_pairs)
        idxs = list(range(c0, c1)) + [c1 - 1] * (B - (c1 - c0))  # pad by repeat
        a = np.stack([np.atleast_3d(np.asarray(load(frames[i]))) for i in idxs])
        b = np.stack([np.atleast_3d(np.asarray(load(frames[i + 1]))) for i in idxs])
        if h0 is None:
            h0, w0 = a.shape[1:3]
        p1 = jax.vmap(lambda x: pad_to_divisible(x, scf))(jnp.asarray(a, jnp.float32))
        p2 = jax.vmap(lambda x: pad_to_divisible(x, scf))(jnp.asarray(b, jnp.float32))
        if sh is not None:
            p1, p2 = jax.device_put(p1, sh), jax.device_put(p2, sh)
        if init is None or not warm_start:
            init_j = jnp.zeros(
                (max(1, p1.shape[1] >> (cfg.sc_f + 1)),
                 max(1, p1.shape[2] >> (cfg.sc_f + 1)), cfg.nop), jnp.float32
            )  # zeros init == cold start (_stage_init(None) is zeros)
        else:
            init_j = init
        flows = _video_chunk(p1, p2, init_j, cfg, h0, w0)
        if warm_start:
            init = _warm_single(flows[c1 - c0 - 1], cfg)  # device-side chain
        pending.append((c0, c1 - c0, flows))
        if len(pending) > queue_depth:
            yield from flush_one()
    while pending:
        yield from flush_one()
