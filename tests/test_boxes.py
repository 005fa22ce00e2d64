"""Unit tests for dtt.core.boxes against NumPy closed-form oracles.

The oracle re-implements the py-faster-rcnn math (the reference's
bbox_transform.py / bbox.pyx semantics) independently in NumPy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dtt.core import boxes


def np_iou(a, b):
    n, m = a.shape[0], b.shape[0]
    out = np.zeros((n, m), np.float64)
    for i in range(n):
        for j in range(m):
            ix = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + 1
            iy = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + 1
            inter = max(ix, 0) * max(iy, 0)
            area_a = (a[i, 2] - a[i, 0] + 1) * (a[i, 3] - a[i, 1] + 1)
            area_b = (b[j, 2] - b[j, 0] + 1) * (b[j, 3] - b[j, 1] + 1)
            union = area_a + area_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def random_boxes(rng, n, size=100):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_pairwise_iou_matches_oracle(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 9)
    got = np.asarray(boxes.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np_iou(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_identity(rng):
    a = random_boxes(rng, 5)
    got = np.asarray(boxes.pairwise_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(got), 1.0, rtol=1e-6)


def test_encode_decode_roundtrip(rng):
    ex = random_boxes(rng, 32)
    gt = random_boxes(rng, 32)
    deltas = boxes.encode_boxes(jnp.asarray(ex), jnp.asarray(gt))
    rec = boxes.decode_boxes(jnp.asarray(ex), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_encode_decode_roundtrip_normalized(rng):
    ex = random_boxes(rng, 8)
    gt = random_boxes(rng, 8)
    means = (0.0, 0.0, 0.0, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = boxes.encode_boxes(jnp.asarray(ex), jnp.asarray(gt), means, stds)
    rec = boxes.decode_boxes(jnp.asarray(ex), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_decode_zero_deltas_is_identity(rng):
    ex = random_boxes(rng, 8)
    rec = boxes.decode_boxes(jnp.asarray(ex), jnp.zeros((8, 4)))
    np.testing.assert_allclose(np.asarray(rec), ex, rtol=1e-5, atol=1e-4)


def test_decode_reference_values():
    # Hand-computed with the py-faster-rcnn formulas (+1 convention).
    box = jnp.asarray([[0.0, 0.0, 9.0, 19.0]])  # w=10 h=20 cx=5 cy=10
    deltas = jnp.asarray([[0.1, -0.2, np.log(2.0), 0.0]])
    out = np.asarray(boxes.decode_boxes(box, deltas))[0]
    # ctr = (x1 + 0.5*w) = (5, 10); pred_cx = 0.1*10+5 = 6 ; pred_cy = -0.2*20+10 = 6
    # pw = 20, ph = 20; x2/y2 carry the -1 of the +1 width convention.
    np.testing.assert_allclose(out, [6 - 10, 6 - 10, 6 + 10 - 1, 6 + 10 - 1], rtol=1e-5)


def test_decode_multiclass_layout(rng):
    ex = random_boxes(rng, 6)
    deltas = rng.randn(6, 12).astype(np.float32) * 0.1
    out = np.asarray(boxes.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas)))
    assert out.shape == (6, 12)
    for k in range(3):
        sub = np.asarray(boxes.decode_boxes(jnp.asarray(ex), jnp.asarray(deltas[:, 4*k:4*k+4])))
        np.testing.assert_allclose(out[:, 4*k:4*k+4], sub, rtol=1e-5)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 200.0, 50.0], [10.0, 10.0, 20.0, 20.0]])
    out = np.asarray(boxes.clip_boxes(b, 100, 150))
    np.testing.assert_allclose(out[0], [0, 0, 149, 50])
    np.testing.assert_allclose(out[1], [10, 10, 20, 20])


def test_flip_boxes_involution(rng):
    b = random_boxes(rng, 10)
    w = 200
    flipped = boxes.flip_boxes(jnp.asarray(b), w)
    back = np.asarray(boxes.flip_boxes(flipped, w))
    np.testing.assert_allclose(back, b, rtol=1e-5)
    f = np.asarray(flipped)
    assert np.all(f[:, 2] >= f[:, 0])
