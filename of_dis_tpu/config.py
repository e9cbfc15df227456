"""Configuration for the TPU-native DIS optical-flow / stereo framework.

Replaces the reference's 3-tier config system (compile-time SELECTMODE /
SELECTCHANNEL matrix, positional argv, hardcoded constants — see
reference run_dense.cpp:225-294, oflow.h:31-76, CMakeLists.txt:24-46) with a
single frozen dataclass.  Mode (flow vs stereo) and channel count are runtime
parameters that select trace-time shapes, not compile products.

Operating points 1-4 replicate reference run_dense.cpp:239-267 exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DISConfig:
    """All parameters of the DIS pipeline.

    Field provenance (reference file:line):
      - mode/channels: compile matrix CMakeLists.txt:24-46
      - sc_f..verbosity: OFClass ctor args oflow.h:84-111, optparam oflow.h:31-76
      - minerrval/normoutlier: oflow.h:62-63
      - fratio: run_dense.cpp:233
    """

    # Problem selection (reference: compile-time SELECTMODE / SELECTCHANNEL)
    mode: str = "flow"          # "flow" (2 params/px) | "stereo" (1 param/px)
    channels: int = 1           # 1 (grayscale) | 3 (RGB)

    # Scale range (reference: lv_f / lv_l)
    sc_f: int = 5               # coarsest scale (auto-selected by operating_point)
    sc_l: int = 3               # finest computed scale

    # Inverse-search iteration control (reference: patch.cpp:279-282)
    max_iter: int = 12
    min_iter: int = 12
    dp_thresh: float = 0.05     # mindprate; squared internally (oflow.cpp:88)
    dr_thresh: float = 0.95     # mindrrate
    res_thresh: float = 0.0     # minimgerr

    # Patch geometry (reference: oflow.cpp:81-92)
    patch_size: int = 8         # p_samp_s; even, center at (psz/2, psz/2)
    overlap: float = 0.4        # patove

    # Features
    use_fb_merge: bool = False  # usefbcon: forward-backward merge
    cost: int = 0               # 0 L2 | 1 L1 | 2 pseudo-Huber | 10 NCC (real NCC
                                # here; the reference README advertises it but the
                                # code silently no-ops, patch.cpp:223-262)
    patch_norm: bool = True     # mean-normalize patches (patch.cpp:330-331)

    # Variational (TV) refinement (reference: refine_variational.h:15-30)
    use_tv_refine: bool = True
    tv_alpha: float = 10.0
    tv_gamma: float = 10.0
    tv_delta: float = 5.0
    tv_innerit: int = 1
    tv_solverit: int = 3
    tv_sor: float = 1.6

    # Stereo only: 0 = left camera (disparity <= 0 internally), 1 = right
    # (patch.cpp:188-193, oflow.cpp:153-157)
    camlr: int = 0

    # Observability
    verbosity: int = 0

    # Fixed constants (oflow.h:62-63, run_dense.cpp:233)
    minerrval: float = 2.0
    normoutlier: float = 5.0
    fratio: int = 5

    # -------- Derived quantities (reference: oflow.cpp:75-108) --------

    @property
    def nop(self) -> int:
        """Parameters per pixel: 2 for flow, 1 for stereo (oflow.cpp:76-80)."""
        return 2 if self.mode == "flow" else 1

    @property
    def steps(self) -> int:
        """Distance between patch centers (oflow.cpp:91)."""
        return max(1, int(math.floor(self.patch_size * (1.0 - self.overlap))))

    @property
    def outlier_thresh(self) -> float:
        """Max query-patch travel before reset (oflow.cpp:82)."""
        return float(self.patch_size) / 2.0

    @property
    def novals(self) -> int:
        """Values per patch = channels * psz^2 (oflow.cpp:92)."""
        return self.channels * self.patch_size * self.patch_size

    @property
    def n_scales(self) -> int:
        return self.sc_f - self.sc_l + 1

    def validate(self) -> "DISConfig":
        if self.mode not in ("flow", "stereo"):
            raise ValueError(f"mode must be 'flow' or 'stereo', got {self.mode!r}")
        if self.channels not in (1, 3):
            raise ValueError(f"channels must be 1 or 3, got {self.channels}")
        if self.patch_size % 2 != 0 or self.patch_size < 2:
            raise ValueError("patch_size must be even and >= 2")
        if self.sc_l < 0 or self.sc_f < self.sc_l:
            raise ValueError("need sc_f >= sc_l >= 0")
        if self.cost not in (0, 1, 2, 10):
            raise ValueError("cost must be one of 0 (L2), 1 (L1), 2 (Huber), 10 (NCC)")
        return self


def auto_first_scale(width: int, fratio: int = 5, patch_size: int = 8) -> int:
    """Coarsest-scale auto-selection (reference run_dense.cpp:180-183).

    lv_f = max(0, floor(log2(2*width / (fratio * patch_size)))).
    """
    return max(0, int(math.floor(math.log2((2.0 * float(width)) / (float(fratio) * float(patch_size))))))


# Operating points 1-4 (reference run_dense.cpp:239-267). Values shared by all
# op points: run_dense.cpp:227-231.
_OP_TABLE = {
    1: dict(patch_size=8, overlap=0.3, rel_sc_l=2, max_iter=16, min_iter=16, use_tv_refine=False),
    2: dict(patch_size=8, overlap=0.4, rel_sc_l=2, max_iter=12, min_iter=12, use_tv_refine=True),
    3: dict(patch_size=12, overlap=0.75, rel_sc_l=4, max_iter=16, min_iter=16, use_tv_refine=True),
    4: dict(patch_size=12, overlap=0.75, rel_sc_l=5, max_iter=128, min_iter=128, use_tv_refine=True),
}


def operating_point(
    op: int,
    width: int,
    mode: str = "flow",
    channels: int = 1,
    verbosity: int = 0,
    **overrides,
) -> DISConfig:
    """Build a DISConfig for reference operating point 1-4 at a given image width.

    Mirrors run_dense.cpp:225-294: common defaults (mindprate=.05 mindrrate=.95
    minimgerr=0, fbcon off, patnorm on, L2 cost, alpha=gamma=10 delta=5,
    1 TV outer iter, 3 SOR iters, omega=1.6) + the per-op-point table.
    """
    if op not in _OP_TABLE:
        raise ValueError(f"operating point must be 1-4, got {op}")
    t = dict(_OP_TABLE[op])
    rel = t.pop("rel_sc_l")
    sc_f = auto_first_scale(width, 5, t["patch_size"])
    sc_l = max(sc_f - rel, 0)
    cfg = dict(
        mode=mode,
        channels=channels,
        sc_f=sc_f,
        sc_l=sc_l,
        dp_thresh=0.05,
        dr_thresh=0.95,
        res_thresh=0.0,
        use_fb_merge=False,
        patch_norm=True,
        cost=0,
        tv_alpha=10.0,
        tv_gamma=10.0,
        tv_delta=5.0,
        tv_innerit=1,
        tv_solverit=3,
        tv_sor=1.6,
        verbosity=verbosity,
    )
    cfg.update(t)
    cfg.update(overrides)
    return DISConfig(**cfg).validate()
