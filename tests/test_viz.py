"""Visualization tests (the reference's DISVISUAL display, live — viz.py)."""

import numpy as np
import pytest

from of_dis_tpu import io, viz


def test_color_wheel_shape_and_arcs():
    w = viz._color_wheel()
    assert w.shape == (55, 3)
    # arc start points (Middlebury RY/YG/GC/CB/BM/MR layout)
    np.testing.assert_array_equal(w[0], [255, 0, 0])          # R
    np.testing.assert_array_equal(w[15], [255, 255, 0])       # Y
    np.testing.assert_array_equal(w[15 + 6], [0, 255, 0])     # G
    np.testing.assert_array_equal(w[25], [0, 255, 255])       # C
    np.testing.assert_array_equal(w[36], [0, 0, 255])         # B
    np.testing.assert_array_equal(w[49], [255, 0, 255])       # M


def test_flow_to_color_basic_properties():
    h, w = 8, 10
    flow = np.zeros((h, w, 2), np.float32)
    img = viz.flow_to_color(flow, max_flow=1.0)
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, 255)  # zero motion -> white

    # full-magnitude +u motion lands on the MR arc near red, fully saturated
    flow[..., 0] = 1.0
    img = viz.flow_to_color(flow)  # max_rad defaults to the field max (1.0)
    assert (img == img[0, 0]).all()  # uniform field -> uniform color
    r, g, b = (int(c) for c in img[0, 0])
    assert r == 255 and g == 0 and b < 64

    # half magnitude under an explicit max_rad is less saturated (whiter)
    half = viz.flow_to_color(flow, max_flow=2.0)
    assert half[0, 0, 1] > 100  # green channel pulled toward white

    # non-finite vectors render black
    flow[3, 4] = np.nan
    img = viz.flow_to_color(flow)
    np.testing.assert_array_equal(img[3, 4], 0)


def test_flow_to_color_direction_distinguishes_opposites():
    f1 = np.zeros((2, 2, 2), np.float32)
    f2 = np.zeros((2, 2, 2), np.float32)
    f1[..., 1] = 1.0   # +v
    f2[..., 1] = -1.0  # -v
    c1 = viz.flow_to_color(f1, max_flow=1.0)[0, 0]
    c2 = viz.flow_to_color(f2, max_flow=1.0)[0, 0]
    assert np.abs(c1.astype(int) - c2.astype(int)).max() > 100


def test_disparity_to_gray_conventions():
    d = np.linspace(0.0, -4.0, 12, dtype=np.float32).reshape(3, 4, 1)
    g = viz.disparity_to_gray(d)  # internal (<= 0) convention via abs()
    assert g.shape == (3, 4) and g.dtype == np.uint8
    assert g[0, 0] == 0 and g[2, 3] == 255
    # on-disk (negated, >= 0) convention gives the identical image
    np.testing.assert_array_equal(g, viz.disparity_to_gray(-d[..., 0]))
    # NaN renders black even when it would otherwise define the max
    d[1, 1, 0] = np.nan
    assert viz.disparity_to_gray(d)[1, 1] == 0


def test_save_image_pnm_roundtrip(tmp_path):
    rgb = (np.arange(5 * 7 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    rgb = rgb.reshape(5, 7, 3)
    p = tmp_path / "c.ppm"
    viz.save_image(p, rgb)
    np.testing.assert_array_equal(io._read_pnm_numpy(p), rgb)

    gray = rgb[..., 0]
    p2 = tmp_path / "g.pgm"
    viz.save_image(p2, gray)
    np.testing.assert_array_equal(io._read_pnm_numpy(p2)[..., 0], gray)

    with pytest.raises(ValueError):
        viz.save_image(tmp_path / "f.ppm", rgb.astype(np.float32))


def test_save_image_png_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rgb = (np.arange(4 * 6 * 3, dtype=np.uint32) % 251).astype(np.uint8)
    rgb = rgb.reshape(4, 6, 3)
    p = tmp_path / "c.png"
    viz.save_image(p, rgb)
    np.testing.assert_array_equal(np.asarray(PIL.open(p)), rgb)


def test_cli_viz_flag(tmp_path, smooth_pair):
    from of_dis_tpu.cli import main

    a, b, _ = smooth_pair
    p1, p2 = tmp_path / "a.npy", tmp_path / "b.npy"
    np.save(p1, np.asarray(a))
    np.save(p2, np.asarray(b))
    out = str(tmp_path / "o.flo")
    vz = tmp_path / "o.ppm"
    assert main([str(p1), str(p2), out, "--op", "1", "-v", "0",
                 "--viz", str(vz)]) == 0
    img = io._read_pnm_numpy(vz)
    flow = io.read_flo(out)
    assert img.shape == (flow.shape[0], flow.shape[1], 3)
    assert img.std() > 0  # a real (non-constant) rendering
