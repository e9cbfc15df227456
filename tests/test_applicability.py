"""Pin the kernel-applicability table (VERDICT r3 item 8).

The GN-search and TV-refinement kernel gates budget VMEM with a MEASURED
Mosaic scoped-stack multiplier (ops/pallas_kernels.py::_GN_TILED_STACK_FACTOR,
models/refine.py::PALLAS_SOR_MAX_PIXELS).  A toolchain update that shifts
those estimates would silently reroute hot levels to slower paths (or OOM).
These tests pin TODAY's routing for the headline workloads — op points 1-4
and stereo at the reference's own QA resolution (1024x436, README.md:91-95)
— so any reroute is a loud failure instead of a quiet perf regression.
"""

import pytest

from of_dis_tpu.config import operating_point
from of_dis_tpu.models.grid import level_geometry
from of_dis_tpu.models.refine import PALLAS_SOR_MAX_PIXELS
from of_dis_tpu.ops.pallas_kernels import gn_route

W, H = 1024, 436

# (case, op, mode) -> {level: route} where route is the TPU-default search
# realization: "level" = whole-level fused kernel, "tiled<ps>" = (ps, 128)
# patch-tiled GN kernel, "untiled" = single-program GN kernel, "xla" =
# two-hot XLA loop.  CHANGES HERE MUST BE MEASURED (CLAUDE.md perf
# invariants): a faster route is welcome, but land it with sweep numbers.
_EXPECTED = {
    ("op1", 1, "flow"): {5: "level", 4: "level", 3: "level"},
    ("op2", 2, "flow"): {5: "level", 4: "level", 3: "level"},
    ("op3", 3, "flow"): {
        5: "level", 4: "level", 3: "untiled", 2: "tiled8", 1: "tiled8"
    },
    ("op4", 4, "flow"): {
        5: "level", 4: "level", 3: "untiled", 2: "tiled8", 1: "tiled8",
        0: "tiled8",
    },
    ("de_op2", 2, "stereo"): {5: "level", 4: "level", 3: "level"},
}


def _levels(cfg):
    scf = 1 << cfg.sc_f
    hp0, wp0 = H + (-H) % scf, W + (-W) % scf
    psz = cfg.patch_size
    out = {}
    for sl in range(cfg.sc_f, cfg.sc_l - 1, -1):
        lw, lh = wp0 >> sl, hp0 >> sl
        geo = level_geometry(lw, lh, cfg)
        hp, wp = lh + 2 * psz, lw + 2 * psz  # build_pyramid pads psz each side
        sy, sx = min(2 * psz + 2, hp), min(2 * psz + 2, wp)
        out[sl] = (hp, wp, geo.n_patches, psz, sy, sx, lh, lw)
    return out


@pytest.mark.parametrize("case,op,mode", sorted(_EXPECTED))
def test_gn_route_table(case, op, mode):
    cfg = operating_point(op, W, mode=mode)
    got = {
        sl: gn_route(hp, wp, cfg.channels, n, psz, sy, sx)
        for sl, (hp, wp, n, psz, sy, sx, _, _) in _levels(cfg).items()
    }
    assert got == _EXPECTED[(case, op, mode)], f"{case}: routing changed"


@pytest.mark.parametrize("op", [3, 4])
def test_tv_fused_inner_covers_all_levels(op):
    """The fused Pallas TV-inner kernel must engage at EVERY op3/op4 flow
    level (VERDICT r3 item 3a): each level's pixel count stays under the
    whole-kernel VMEM cap, including the op4 finest 448x1024 level."""
    cfg = operating_point(op, W, mode="flow")
    assert cfg.use_tv_refine
    for sl, (_, _, _, _, _, _, lh, lw) in _levels(cfg).items():
        assert lh * lw <= PALLAS_SOR_MAX_PIXELS, (
            f"op{op} level {sl} ({lh}x{lw}={lh*lw} px) exceeds the fused "
            f"TV kernel cap {PALLAS_SOR_MAX_PIXELS}"
        )
