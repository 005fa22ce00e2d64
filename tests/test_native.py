"""Native C++ pixel pipeline vs the cv2/numpy reference path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dtt.core.config import InputConfig
from dtt.data import native
from dtt.data.transforms import (load_image_bgr, normalize, prepare_frame,
                                 resize_to_canvas)

CFG = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                  max_gt_boxes=4)


@pytest.fixture(scope="module")
def jpeg_path(tmp_path_factory):
    rng = np.random.RandomState(0)
    # smooth image so DCT-scaled decode stays close to full-res decode
    yy, xx = np.mgrid[0:240, 0:320]
    img = np.stack([
        120 + 80 * np.sin(yy / 40.0),
        120 + 80 * np.cos(xx / 40.0),
        120 + 60 * np.sin((xx + yy) / 60.0),
    ], axis=-1).astype(np.uint8)
    p = str(tmp_path_factory.mktemp("imgs") / "test.JPEG")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return p


def test_native_builds():
    assert native.available(), "C++ pixelops failed to build/load"


def test_decode_matches_cv2_path(jpeg_path):
    got, scale_n = native.decode_resize_normalize(
        open(jpeg_path, "rb").read(), CFG)
    img = load_image_bgr(jpeg_path)
    canvas, scale_c = resize_to_canvas(img, CFG)
    want = canvas
    assert got.shape == want.shape == (96, 128, 3)
    assert abs(scale_n - scale_c) < 1e-5
    nh, nw = int(round(240 * scale_c)), int(round(320 * scale_c))
    # interpolation paths differ (DCT-scaled decode + our bilinear vs cv2
    # INTER_LINEAR from full res); on smooth content they stay close
    diff = np.abs(got[:nh, :nw] - want[:nh, :nw]).mean()
    assert diff < 6.0, f"mean abs pixel diff {diff}"


def test_padding_semantics_match(tmp_path):
    """Both paths must pad with exactly 0 AFTER mean subtraction (the
    reference pads zeros post-normalization). A 100x100 image on the 96x128
    canvas leaves real padding columns to compare."""
    rng = np.random.RandomState(3)
    img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "sq.JPEG")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    got, scale_n = native.decode_resize_normalize(open(p, "rb").read(), CFG)
    want, scale_c = resize_to_canvas(load_image_bgr(p), CFG)
    nh, nw = int(round(100 * scale_c)), int(round(100 * scale_c))
    assert nw < 128, "test image must not fill the canvas"
    assert np.all(got[:, nw + 1:] == 0), "native padding must be zero"
    assert np.all(want[:, nw + 1:] == 0), "cv2-path padding must be zero"
    assert np.abs(got[:nh, :nw] - want[:nh, :nw]).mean() < 8.0


def test_native_flip(jpeg_path):
    plain, _ = native.decode_resize_normalize(open(jpeg_path, "rb").read(), CFG)
    flipped, scale = native.decode_resize_normalize(
        open(jpeg_path, "rb").read(), CFG, flip=True)
    nw = int(round(320 * scale))
    np.testing.assert_allclose(flipped[:, :nw], plain[:, :nw][:, ::-1],
                               atol=1e-4)


def test_resize_normalize_u8(jpeg_path):
    img = cv2.imread(jpeg_path).astype(np.uint8)
    got, scale = native.resize_normalize(img, CFG)
    want, scale_c = resize_to_canvas(img.astype(np.float32), CFG)
    assert abs(scale - scale_c) < 1e-5
    nh, nw = int(round(img.shape[0] * scale)), int(round(img.shape[1] * scale))
    diff = np.abs(got[:nh, :nw] - want[:nh, :nw]).mean()
    assert diff < 3.0


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError):
        native.decode_resize_normalize(b"not a jpeg at all", CFG)


def test_prepare_frame_uses_native(jpeg_path):
    canvas, scale = prepare_frame(jpeg_path, CFG)
    assert canvas.shape == (96, 128, 3)
    canvas2, scale2 = prepare_frame(jpeg_path, CFG, use_native=False)
    assert abs(scale - scale2) < 1e-5
    assert np.abs(canvas - canvas2).mean() < 6.0
