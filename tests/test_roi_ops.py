"""RoI align/pool/crop vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from dtt.ops.roi_ops import bilinear_sample, roi_align, roi_crop, roi_pool


def np_bilinear(feat, y, x):
    h, w, _ = feat.shape
    if y < -1 or y > h or x < -1 or x > w:
        return np.zeros(feat.shape[-1], np.float32)
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * feat[y0, x0] + (1 - ly) * lx * feat[y0, x1]
            + ly * (1 - lx) * feat[y1, x0] + ly * lx * feat[y1, x1])


def np_roi_align(feat, rois, scale, k, sr, aligned=False):
    n = rois.shape[0]
    out = np.zeros((n, k, k, feat.shape[-1]), np.float32)
    off = 0.5 if aligned else 0.0
    for i in range(n):
        x1, y1, x2, y2 = rois[i] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / k, rh / k
        for ph in range(k):
            for pw in range(k):
                acc = np.zeros(feat.shape[-1], np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + ph * bh + (iy + 0.5) * bh / sr
                        x = x1 + pw * bw + (ix + 0.5) * bw / sr
                        acc += np_bilinear(feat, y, x)
                out[i, ph, pw] = acc / (sr * sr)
    return out


def np_roi_pool(feat, rois, scale, k):
    h, w, c = feat.shape
    n = rois.shape[0]
    out = np.zeros((n, k, k, c), np.float32)
    for i in range(n):
        x1 = int(round(rois[i, 0] * scale)); y1 = int(round(rois[i, 1] * scale))
        x2 = int(round(rois[i, 2] * scale)); y2 = int(round(rois[i, 3] * scale))
        rw, rh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        bw, bh = rw / k, rh / k
        for ph in range(k):
            for pw in range(k):
                hs = min(max(int(np.floor(ph * bh)) + y1, 0), h)
                he = min(max(int(np.ceil((ph + 1) * bh)) + y1, 0), h)
                ws = min(max(int(np.floor(pw * bw)) + x1, 0), w)
                we = min(max(int(np.ceil((pw + 1) * bw)) + x1, 0), w)
                if he > hs and we > ws:
                    out[i, ph, pw] = feat[hs:he, ws:we].max((0, 1))
    return out


@pytest.fixture
def feat(rng):
    return rng.randn(14, 18, 6).astype(np.float32)


ROIS = np.array([
    [10.0, 20.0, 120.0, 150.0],
    [0.0, 0.0, 287.0, 223.0],
    [40.0, 40.0, 44.0, 44.0],
    [-16.0, -16.0, 60.0, 60.0],
    [250.0, 180.0, 400.0, 300.0],
], np.float32)


def test_bilinear_against_oracle(feat, rng):
    pts = rng.uniform(-2, 20, (40, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(feat),
                                     jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1])))
    want = np.stack([np_bilinear(feat, y, x) for y, x in pts])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("aligned", [False, True])
def test_roi_align(feat, aligned):
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(ROIS), 1 / 16.0,
                               3, 2, aligned=aligned))
    want = np_roi_align(feat, ROIS, 1 / 16.0, 3, 2, aligned)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_pool(feat):
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(ROIS), 1 / 16.0, 3))
    want = np_roi_pool(feat, ROIS, 1 / 16.0, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roi_crop_shapes_and_identity(feat):
    out = roi_crop(jnp.asarray(feat), jnp.asarray(ROIS), 1 / 16.0, 4)
    assert out.shape == (5, 4, 4, 6)
    # max_pool=False on an exactly-aligned pixel grid reproduces the pixels
    roi = jnp.asarray([[0.0, 0.0, 3.0 * 16, 3.0 * 16]])
    got = np.asarray(roi_crop(jnp.asarray(feat), roi, 1 / 16.0, 4, max_pool=False))
    np.testing.assert_allclose(got[0], feat[:4, :4], rtol=1e-5)
