"""Golden-file tests against the REAL reference binaries (SURVEY.md §4 item 1).

tests/goldens/ holds deterministic synthetic inputs plus the .flo/.pfm
outputs of the unmodified reference (built by scripts/build_reference.sh from
/root/reference with OpenCV 4 + the TF-bundled Eigen; captured by
scripts/capture_goldens.py).  Every case replays through the TPU pipeline and
must agree within a small mean-EPE tolerance — measured deviations are
<= 0.04 px on ~2-4 px fields (float32 accumulation order + red-black vs
sequential SOR are the only numeric differences, ARCHITECTURE.md deviations
1 and 4).

Covers: operating points 1-4, gray/RGB, flow/stereo, the gradient-magnitude
input channel (reference SELECTCHANNEL==2, no CMake target), fb-consistency
merging, L1/Huber costs, patch-norm off, and 12-px patches.
"""

import numpy as np
import pytest

from golden_util import epe, load_manifest, run_case

_MANIFEST = load_manifest()
_CASES = {c["case"]: c for c in _MANIFEST["cases"]}

# Fallback mean-EPE tolerance for cases without a pinned capture-time EPE;
# cases WITH "epe_captured" in the manifest get max(2 x recorded, 0.02), so
# a 0.01-px case can't silently regress to 0.07 under a blanket bound.
_TOL = 0.08
# Raw (no-TV) search on high-frequency texture is chaotic: few-ULP float
# differences (XLA vs Mosaic vs the reference's SSE) flip ~2% of patches
# into different — equally valid — local minima, so trajectory-matching
# needs a looser bound there; test_golden_textured_quality then asserts the
# result is as close to TRUTH as the reference's.
_CASE_TOL = {"of_tex_op1": 0.30}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    case = _CASES[name]
    ours, golden = run_case(case)
    assert ours.shape == golden.shape, (ours.shape, golden.shape)
    e = epe(ours, golden)
    mag = float(np.mean(np.sqrt(np.sum(golden**2, axis=-1))))
    assert np.isfinite(e)
    tol = _CASE_TOL.get(name)
    if tol is None:
        rec = case.get("epe_captured")
        tol = _TOL if rec is None else max(2.0 * rec, 0.02)
    assert e < tol, f"{name}: mean EPE {e:.4f} (tol {tol:.4f}) vs golden |flow|={mag:.3f}"


@pytest.mark.parametrize("name", ["of_tex_op1", "of_tex_op2"])
def test_golden_textured_quality(name):
    """On chaotic textured content, assert quality parity against the TRUE
    flow: our EPE-vs-truth must not exceed the reference binary's by more
    than 5% + 0.02 px (measured: ours is marginally better)."""
    import os

    from golden_util import GOLD
    from of_dis_tpu import io

    case = _CASES[name]
    ours, golden = run_case(case)
    gt = io.read_flo(os.path.join(GOLD, "tx_gt.flo"))
    inner = np.s_[8:-8, 8:-8]
    e_ours = epe(ours[inner], gt[inner])
    e_ref = epe(golden[inner], gt[inner])
    assert e_ours <= e_ref * 1.05 + 0.02, (e_ours, e_ref)
