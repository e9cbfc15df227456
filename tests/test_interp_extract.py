"""Ground-truth exactness of the window/template extraction primitives.

These pin the round-5 structured-grid rewrites (ops/interp.py):

  - gather_windows_rows: 32-px-stride / 64-px overlapping-segment row-BLOCK
    take (wide levels) and the one-hot/align-32 branches must return
    bit-exact windows for arbitrary in-range (by, bx), including the
    chunked (> GATHER_CHUNK) path and the band contract the fused GN
    kernel consumes (window at band offset bx % 32).
  - extract_grid_patches: space-to-depth static-slice template extraction
    must be bit-exact for dividing (psz % steps == 0) and non-dividing
    grids, C in {1, 3}.

Reference semantics: patch.cpp:286-402 (pointer-walk window extraction) /
patchgrid.cpp:42-75 (static grid).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import of_dis_tpu.ops.interp as interp
from of_dis_tpu.ops.interp import extract_grid_patches, gather_windows_rows


@pytest.mark.parametrize(
    "hp,wp,c,sy,sx,n",
    [
        (248, 536, 1, 26, 26, 777),    # op3-finest-like, wide branch
        (248, 536, 1, 26, 26, 3000),   # > GATHER_CHUNK when chunk small
        (66, 140, 3, 18, 18, 333),     # RGB, mid-width
        (60, 100, 1, 18, 18, 120),     # align-32 branch (wp <= 96... > 64)
        (40, 60, 1, 18, 18, 50),       # narrow: full-row take branch
    ],
)
@pytest.mark.parametrize("rowblock", [0, 4])
def test_gather_windows_ground_truth(hp, wp, c, sy, sx, n, rowblock, monkeypatch):
    monkeypatch.setattr(interp, "ROWBLOCK_TAKE", rowblock)
    rng = np.random.default_rng(hash((hp, wp, c, n)) % 2**32)
    img = rng.standard_normal((hp, wp, c)).astype(np.float32)
    by = rng.integers(0, hp - sy + 1, n).astype(np.int32)
    bx = rng.integers(0, wp - sx + 1, n).astype(np.int32)
    gt = np.stack(
        [img[by[i] : by[i] + sy, bx[i] : bx[i] + sx] for i in range(n)]
    ).transpose(2, 3, 1, 0)  # (sx, C, sy, N)
    got = np.asarray(
        gather_windows_rows(jnp.asarray(img), jnp.asarray(by), jnp.asarray(bx), sy, sx)
    )
    assert (got == gt).all()
    if sx <= 31 and wp > 64:
        band = np.asarray(
            gather_windows_rows(
                jnp.asarray(img), jnp.asarray(by), jnp.asarray(bx), sy, sx,
                return_band=True,
            )
        )
        assert band.shape == (64, c, sy, n)
        off = bx % 32
        for i in range(0, n, max(1, n // 37)):
            assert (band[off[i] : off[i] + sx, :, :, i] == gt[:, :, :, i]).all()


@pytest.mark.parametrize(
    "psz,steps,noph,nopw,c",
    [(12, 3, 75, 171, 1), (8, 4, 20, 30, 3), (8, 5, 11, 17, 1), (12, 3, 5, 7, 3)],
)
def test_extract_grid_patches_ground_truth(psz, steps, noph, nopw, c):
    pad = psz
    h = steps * (noph - 1) + 1 + 4
    w = steps * (nopw - 1) + 1 + 4
    rng = np.random.default_rng(hash((psz, steps, noph, nopw, c)) % 2**32)
    img = rng.standard_normal((h + 2 * pad, w + 2 * pad, c)).astype(np.float32)
    y0 = x0 = 2 + pad - psz // 2
    got = np.asarray(
        extract_grid_patches(jnp.asarray(img), y0, x0, steps, noph, nopw, psz)
    )
    ref = np.zeros_like(got)
    for i in range(nopw):
        for j in range(noph):
            ys, xs = y0 + steps * j, x0 + steps * i
            ref[i * noph + j] = img[ys : ys + psz, xs : xs + psz]
    assert (got == ref).all()
