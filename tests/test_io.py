"""Format round-trip tests for .flo/.pfm against the reference byte layout
(SaveFlowFile/SavePFMFile, run_dense.cpp:16-81)."""

import struct

import numpy as np

from of_dis_tpu import io


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(1).randn(7, 5, 2).astype(np.float32)
    p = tmp_path / "t.flo"
    io.write_flo(p, flow)
    back = io.read_flo(p)
    np.testing.assert_array_equal(flow, back)


def test_flo_byte_layout(tmp_path):
    """Exact byte layout: 'PIEH', int32 w, int32 h, row-major float32 pairs."""
    flow = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
    p = tmp_path / "t.flo"
    io.write_flo(p, flow)
    raw = p.read_bytes()
    assert raw[:4] == b"PIEH"
    w, h = struct.unpack("<ii", raw[4:12])
    assert (w, h) == (3, 2)
    vals = np.frombuffer(raw[12:], dtype="<f4")
    np.testing.assert_array_equal(vals, flow.ravel())
    # magic float check used by Middlebury readers
    assert struct.unpack("<f", raw[:4])[0] == 202021.25


def test_pfm_roundtrip_negation(tmp_path):
    """Reference negates on write (run_dense.cpp:75): internal disparity <= 0
    becomes positive in the file."""
    disp = -np.abs(np.random.RandomState(2).randn(6, 4).astype(np.float32))
    p = tmp_path / "t.pfm"
    io.write_pfm(p, disp)  # negate=True default
    stored = io.read_pfm(p)
    np.testing.assert_allclose(stored, -disp)
    back = io.read_pfm(p, negate=True)
    np.testing.assert_allclose(back, disp)


def test_pfm_byte_layout(tmp_path):
    """Rows bottom-up, little-endian scale -1.0."""
    disp = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = tmp_path / "t.pfm"
    io.write_pfm(p, disp, negate=False)
    raw = p.read_bytes()
    lines = raw.split(b"\n", 3)
    assert lines[0] == b"Pf"
    assert lines[1] == b"2 3".replace(b"2 3", b"3 2")
    assert float(lines[2]) == -1.0
    vals = np.frombuffer(lines[3], dtype="<f4").reshape(2, 3)
    np.testing.assert_array_equal(vals, disp[::-1])


def test_load_image_npy(tmp_path):
    img = np.random.RandomState(3).randint(0, 255, (5, 6, 3)).astype(np.uint8)
    p = tmp_path / "img.npy"
    np.save(p, img)
    g = io.load_image(p, channels=1)
    assert g.shape == (5, 6, 1)
    c = io.load_image(p, channels=3)
    assert c.shape == (5, 6, 3)


def test_gray_matches_opencv(tmp_path):
    """Grayscale conversion parity with cv::imread(..., GRAYSCALE)."""
    cv2 = __import__("cv2")
    img = np.random.RandomState(4).randint(0, 255, (16, 20, 3)).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img[..., ::-1])  # cv2 writes BGR
    ours = io.load_image(p, channels=1)[..., 0]
    ref = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE).astype(np.float32)
    # For PNG, cv2.imread delegates the RGB->gray conversion to libpng's own
    # fixed-point path, which can differ by 1 gray level from OpenCV's
    # cvtColor formula; +-1/255 is far below flow EPE sensitivity.
    assert np.max(np.abs(ours - ref)) <= 1.0
