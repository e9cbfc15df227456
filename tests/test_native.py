"""Native C++ codec vs NumPy fallback: identical bytes and values."""

import numpy as np
import pytest

from of_dis_tpu import io, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_flo_native_vs_numpy_bytes(tmp_path):
    flow = np.random.RandomState(0).randn(11, 7, 2).astype(np.float32)
    pn = tmp_path / "native.flo"
    pp = tmp_path / "numpy.flo"
    assert native.write_flo(pn, flow)
    import of_dis_tpu.io as io_mod

    # force the NumPy writer path
    import os

    os.environ["OF_DIS_NATIVE"] = "1"
    # write via fallback manually
    import struct

    with open(pp, "wb") as f:
        f.write(b"PIEH")
        f.write(struct.pack("<ii", 7, 11))
        f.write(np.ascontiguousarray(flow, dtype="<f4").tobytes())
    assert pn.read_bytes() == pp.read_bytes()


def test_flo_native_roundtrip(tmp_path):
    flow = np.random.RandomState(1).randn(5, 9, 2).astype(np.float32)
    p = tmp_path / "t.flo"
    assert native.write_flo(p, flow)
    back = native.read_flo(p)
    np.testing.assert_array_equal(flow, back)
    # cross-read with numpy reader path semantics
    back2 = io.read_flo(p)
    np.testing.assert_array_equal(flow, back2)


def test_pfm_native_roundtrip(tmp_path):
    disp = -np.abs(np.random.RandomState(2).randn(6, 4).astype(np.float32))
    p = tmp_path / "t.pfm"
    assert native.write_pfm(p, disp, negate=True)
    stored = native.read_pfm(p)
    np.testing.assert_allclose(stored, -disp)
    np.testing.assert_allclose(io.read_pfm(p), -disp)


def test_gray_conversion_matches_python():
    rgb = np.random.RandomState(3).randint(0, 256, (13, 17, 3)).astype(np.uint8)
    nat = native.gray_from_rgb_u8(rgb)
    ref = io._bgr_to_gray_u8(rgb).astype(np.float32)
    np.testing.assert_array_equal(nat, ref)


def test_pnm_roundtrip(tmp_path):
    img = np.random.RandomState(4).randint(0, 256, (9, 11, 3)).astype(np.uint8)
    p = tmp_path / "t.ppm"
    with open(p, "wb") as f:
        f.write(b"P6\n11 9\n255\n")
        f.write(img.tobytes())
    back = native.read_pnm(p)
    np.testing.assert_array_equal(back, img)
