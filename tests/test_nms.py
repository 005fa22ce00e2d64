"""NMS vs an O(n^2) NumPy greedy oracle (the reference nms_cpu semantics)."""

import numpy as np
import jax.numpy as jnp

from dtt.ops.nms import nms_padded, nms_gather, multiclass_nms


def np_greedy_nms(boxes, scores, thresh):
    """Reference greedy NMS (py-faster-rcnn nms_cpu: keep ovr <= thresh)."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def random_boxes(rng, n, size=100):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 3, n)
    h = rng.uniform(1, size / 3, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        want = np_greedy_nms(boxes, scores, 0.5)
        idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want)


def test_nms_respects_max_outputs(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.rand(40).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.7)
    idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.7, 3)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want[:3])


def test_nms_valid_mask(rng):
    boxes = random_boxes(rng, 20)
    scores = rng.rand(20).astype(np.float32)
    # mark the top-scoring half invalid; result must equal NMS on the rest
    valid = np.zeros(20, bool)
    valid[scores < np.median(scores)] = True
    want = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    want_global = np.where(valid)[0][want]
    idx, v = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20,
                        valid=jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(v)]
    np.testing.assert_array_equal(got, want_global)


def test_nms_identical_boxes():
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (8, 1))
    scores = np.arange(8, dtype=np.float32)
    idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 8)
    assert np.asarray(valid).sum() == 1
    assert np.asarray(idx)[0] == 7


def test_nms_no_valid_inputs():
    boxes = np.zeros((4, 4), np.float32)
    scores = np.zeros(4, np.float32)
    idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4,
                            valid=jnp.zeros(4, bool))
    assert not np.asarray(valid).any()


def test_nms_gather_zeroes_padding(rng):
    boxes = random_boxes(rng, 10)
    scores = rng.rand(10).astype(np.float32)
    b, s, v = nms_gather(jnp.asarray(boxes), jnp.asarray(scores), 0.0, 10)
    v = np.asarray(v)
    assert np.all(np.asarray(b)[~v] == 0)
    assert np.all(np.asarray(s)[~v] == 0)


def test_multiclass_nms_shapes_and_independence(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.rand(30, 4).astype(np.float32)
    db, ds, dv, di = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                                    max_per_class=6, score_threshold=0.2)
    assert db.shape == (4, 6, 4) and ds.shape == (4, 6) and dv.shape == (4, 6)
    # returned indices must re-gather exactly the kept boxes
    regathered = boxes[np.asarray(di)] * np.asarray(dv)[..., None]
    np.testing.assert_allclose(np.asarray(db), regathered, rtol=1e-6)
    for c in range(4):
        want = [i for i in np_greedy_nms(boxes, scores[:, c], 0.5)
                if scores[i, c] > 0.2][:6]
        got_scores = np.asarray(ds)[c][np.asarray(dv)[c]]
        np.testing.assert_allclose(got_scores, scores[want, c], rtol=1e-6)


def test_fast_nms_matches_sequential(rng):
    """nms_padded_fast (multi-select while loop) must make EXACTLY the same
    greedy decisions as the one-at-a-time form, for several block sizes."""
    from dtt.ops.nms import nms_padded_fast
    for trial in range(6):
        n = 96
        boxes = random_boxes(rng, n)
        # duplicated boxes + tied scores stress tie-breaking
        boxes[10] = boxes[11] = boxes[12]
        scores = (rng.rand(n) * 10).round(1).astype(np.float32)
        valid = rng.rand(n) > 0.1
        for thr in (0.3, 0.7):
            for blk in (1, 4, 16, 33, 64):
                want_i, want_v = nms_padded(
                    jnp.asarray(boxes), jnp.asarray(scores), thr, 40,
                    valid=jnp.asarray(valid), score_threshold=0.05)
                got_i, got_v = nms_padded_fast(
                    jnp.asarray(boxes), jnp.asarray(scores), thr, 40,
                    valid=jnp.asarray(valid), score_threshold=0.05,
                    select_block=blk)
                np.testing.assert_array_equal(np.asarray(got_v),
                                              np.asarray(want_v))
                np.testing.assert_array_equal(
                    np.asarray(got_i)[np.asarray(got_v)],
                    np.asarray(want_i)[np.asarray(want_v)])


def test_fast_nms_edge_cases():
    from dtt.ops.nms import nms_padded_fast
    boxes = jnp.asarray(np.tile([[0, 0, 10, 10]], (8, 1)).astype(np.float32))
    scores = jnp.arange(8, 0, -1).astype(jnp.float32)
    idx, valid = nms_padded_fast(boxes, scores, 0.5, 4)
    assert int(np.asarray(valid).sum()) == 1          # all identical: keep 1
    assert int(np.asarray(idx)[0]) == 0
    # no valid inputs at all
    idx, valid = nms_padded_fast(boxes, scores, 0.5, 4,
                                 valid=jnp.zeros(8, bool))
    assert not np.asarray(valid).any()
