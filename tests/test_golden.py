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

# Mean-EPE tolerance ~2x the measured deviation per case family.
_TOL = 0.08


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    case = _CASES[name]
    ours, golden = run_case(case)
    assert ours.shape == golden.shape, (ours.shape, golden.shape)
    e = epe(ours, golden)
    mag = float(np.mean(np.sqrt(np.sum(golden**2, axis=-1))))
    assert np.isfinite(e)
    assert e < _TOL, f"{name}: mean EPE {e:.4f} vs golden |flow|={mag:.3f}"
