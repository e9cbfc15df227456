"""Pyramid / gradient / resize parity vs OpenCV (the reference's
preprocessing, ConstructImgPyramide run_dense.cpp:130-178)."""

import cv2
import numpy as np
import pytest

from of_dis_tpu.ops import pyramid as pyr


@pytest.fixture()
def img():
    rng = np.random.RandomState(7)
    return (rng.rand(48, 64, 1) * 255).astype(np.float32)


def test_downsample_half_matches_cv2(img):
    ours = np.asarray(pyr.downsample_half(img))
    ref = cv2.resize(img[..., 0], None, fx=0.5, fy=0.5, interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours[..., 0], ref, rtol=1e-5, atol=1e-3)


def test_sobel_matches_cv2(img):
    dx, dy = pyr.sobel(img)
    ref_dx = cv2.Sobel(img[..., 0], cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
    ref_dy = cv2.Sobel(img[..., 0], cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0)
    np.testing.assert_allclose(np.asarray(dx)[..., 0], ref_dx, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy)[..., 0], ref_dy, rtol=1e-5, atol=1e-4)


def test_sobel_rgb(img):
    rgb = np.concatenate([img, img * 0.5, img * 0.1], axis=2)
    dx, _ = pyr.sobel(rgb)
    for c, s in enumerate([1.0, 0.5, 0.1]):
        ref = cv2.Sobel(rgb[..., c], cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
        np.testing.assert_allclose(np.asarray(dx)[..., c], ref, rtol=1e-5, atol=1e-4)


def test_resize_bilinear_upscale_matches_cv2(img):
    small = img[:24, :32]
    ours = np.asarray(pyr.resize_bilinear(small, 48, 64))
    ref = cv2.resize(small[..., 0], (64, 48), interpolation=cv2.INTER_LINEAR)
    # cv2 uses fixed-point (2^11) interpolation coefficients; allow small slack.
    np.testing.assert_allclose(ours[..., 0], ref, rtol=1e-3, atol=0.15)


def test_divisibility_padding():
    t, b, l, r = pyr.divisibility_padding(45, 100, 16)
    assert (45 + t + b) % 16 == 0 and (100 + l + r) % 16 == 0
    assert t == (45 + t + b - 45) // 2 or t <= b  # floor before, ceil after
    padded = pyr.pad_to_divisible(np.zeros((45, 100, 1), np.float32), 16)
    assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0


def test_pyramid_structure(img):
    imgs, dxs, dys = pyr.build_pyramid(img, n_levels=3, pad=4)
    assert len(imgs) == 3
    assert imgs[0].shape == (48 + 8, 64 + 8, 1)
    assert imgs[1].shape == (24 + 8, 32 + 8, 1)
    assert imgs[2].shape == (12 + 8, 16 + 8, 1)
    # replicate padding for image
    np.testing.assert_array_equal(np.asarray(imgs[0])[0, 4:-4, 0], img[0, :, 0])
    # zero padding for gradients
    assert np.all(np.asarray(dxs[0])[:4] == 0) and np.all(np.asarray(dys[0])[:, :4] == 0)


def test_gradient_magnitude(img):
    gm = np.asarray(pyr.gradient_magnitude(img))
    dx = cv2.Sobel(img[..., 0], cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
    dy = cv2.Sobel(img[..., 0], cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0)
    np.testing.assert_allclose(gm[..., 0], np.sqrt(dx**2 + dy**2), rtol=1e-4, atol=1e-3)
