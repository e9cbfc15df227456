"""CLI driver tests (run_dense.cpp main() equivalent) — tiny images, CPU."""

import numpy as np
import pytest

from of_dis_tpu import io
from of_dis_tpu.cli import main


@pytest.fixture()
def pair_files(tmp_path, smooth_pair):
    img1, img2, (tu, tv) = smooth_pair
    p1 = tmp_path / "a.npy"
    p2 = tmp_path / "b.npy"
    np.save(p1, img1)
    np.save(p2, img2)
    return str(p1), str(p2), (tu, tv)


def test_cli_flow_op1(pair_files, tmp_path):
    p1, p2, (tu, tv) = pair_files
    out = str(tmp_path / "out.flo")
    assert main([p1, p2, out, "--op", "1", "-v", "0"]) == 0
    f = io.read_flo(out)
    inner = f[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.2
    assert abs(np.median(inner[..., 1]) - tv) < 0.2


def test_cli_explicit_params_and_init_flow(pair_files, tmp_path):
    """Variant 3 (20 explicit params, README.md:66-88) + .flo warm start."""
    p1, p2, (tu, tv) = pair_files
    out1 = str(tmp_path / "a.flo")
    params = "1 0 4 4 0.05 0.95 0 8 0.4 0 1 0 1 10 10 5 1 3 1.6 0".split()
    assert main([p1, p2, out1, "--params", *params, "-v", "0"]) == 0
    out2 = str(tmp_path / "b.flo")
    assert main(
        [p1, p2, out2, "--params", *params, "-v", "0", "--init-flow", out1]
    ) == 0
    f = io.read_flo(out2)
    inner = f[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - tu) < 0.2


def test_cli_stereo_pfm(tmp_path, smooth_pair):
    img1, img2, _ = smooth_pair
    # rectified: right image = left shifted (content moves left 3 px)
    left = img1[:, :-3]
    right = img1[:, 3:]
    p1 = tmp_path / "l.npy"
    p2 = tmp_path / "r.npy"
    np.save(p1, left)
    np.save(p2, right)
    out = str(tmp_path / "d.pfm")
    assert main([str(p1), str(p2), out, "--op", "1", "-v", "0"]) == 0
    d = io.read_pfm(out)
    assert abs(np.median(d[16:-16, 16:-16]) - 3.0) < 0.2


def test_cli_verbosity2_stage_table(pair_files, tmp_path, capsys):
    """-v 2 prints the reference's per-scale stage table (oflow.cpp:296-304)
    and produces the same output file as -v 0."""
    p1, p2, (tu, tv) = pair_files
    out0 = str(tmp_path / "q.flo")
    out2 = str(tmp_path / "v.flo")
    assert main([p1, p2, out0, "--op", "1", "-v", "0"]) == 0
    assert main([p1, p2, out2, "--op", "1", "-v", "2"]) == 0
    text = capsys.readouterr().out
    assert "TIME (Pyramide+Gradients)" in text
    assert "pconst, pinit, poptim, cflow, tvopt, total" in text
    assert "TIME (O.Flow Run-Time   )" in text
    f0 = io.read_flo(out0)
    f2 = io.read_flo(out2)
    np.testing.assert_allclose(f2, f0, rtol=1e-4, atol=1e-4)
