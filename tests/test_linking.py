"""Tube linking vs brute-force path enumeration on tiny inputs."""

import itertools

import numpy as np
import jax.numpy as jnp

from dtt.core import boxes as box_ops
from dtt.eval.linking import link_all_classes, link_tubes


def np_iou(a, b):
    ix = min(a[2], b[2]) - max(a[0], b[0]) + 1
    iy = min(a[3], b[3]) - max(a[1], b[1]) + 1
    inter = max(ix, 0) * max(iy, 0)
    ar = lambda z: (z[2] - z[0] + 1) * (z[3] - z[1] + 1)
    u = ar(a) + ar(b) - inter
    return inter / u if u > 0 else 0.0


def brute_force_best_path(boxes, scores, tracked, valid, w):
    """Enumerate every valid path; return (best path, best mean link score)."""
    t, n = scores.shape
    choices = [[j for j in range(n) if valid[f, j]] for f in range(t)]
    best, best_s = None, -np.inf
    for path in itertools.product(*choices):
        s = 0.0
        for f in range(t - 1):
            i, j = path[f], path[f + 1]
            s += (scores[f, i] + scores[f + 1, j]
                  + w * np_iou(tracked[f, i], boxes[f + 1, j]))
        s /= max(t - 1, 1)
        if s > best_s:
            best, best_s = path, s
    return best, best_s


def random_case(rng, t, n):
    boxes = np.zeros((t, n, 4), np.float32)
    x1 = rng.uniform(0, 80, (t, n))
    y1 = rng.uniform(0, 80, (t, n))
    boxes[..., 0], boxes[..., 1] = x1, y1
    boxes[..., 2] = x1 + rng.uniform(10, 40, (t, n))
    boxes[..., 3] = y1 + rng.uniform(10, 40, (t, n))
    scores = rng.rand(t, n).astype(np.float32)
    tracked = boxes + rng.uniform(-5, 5, (t, n, 4)).astype(np.float32)
    valid = rng.rand(t, n) > 0.2
    valid[:, 0] = True  # every frame has at least one det
    return boxes, scores, tracked, valid


def test_viterbi_matches_brute_force(rng):
    for trial in range(5):
        boxes, scores, tracked, valid = random_case(rng, t=4, n=4)
        want_path, want_score = brute_force_best_path(boxes, scores, tracked,
                                                      valid, 1.0)
        out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.asarray(tracked), jnp.asarray(valid),
                         max_tubes=1, link_iou_weight=1.0)
        got_path = tuple(np.asarray(out.det_idx[0]))
        assert bool(out.tube_valid[0])
        np.testing.assert_allclose(float(out.tube_score[0]), want_score,
                                   rtol=1e-5)
        assert got_path == want_path


def test_tracking_glues_the_right_path(rng):
    """Two parallel moving objects; tracking IoU must keep tubes unmixed."""
    t, n = 6, 2
    boxes = np.zeros((t, n, 4), np.float32)
    for f in range(t):
        boxes[f, 0] = [10 + 8 * f, 10, 40 + 8 * f, 40]   # object A moves right
        boxes[f, 1] = [10 + 8 * f, 60, 40 + 8 * f, 90]   # object B below
    scores = np.full((t, n), 0.5, np.float32)
    tracked = boxes.copy()
    tracked[..., [0, 2]] += 8.0   # perfect tracking prediction
    valid = np.ones((t, n), bool)
    out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(tracked), jnp.asarray(valid), max_tubes=2)
    assert bool(out.tube_valid[0]) and bool(out.tube_valid[1])
    p0 = np.asarray(out.det_idx[0])
    p1 = np.asarray(out.det_idx[1])
    assert len(set(p0.tolist())) == 1, "tube must not jump between objects"
    assert len(set(p1.tolist())) == 1
    assert p0[0] != p1[0]
    # every detection got claimed
    assert np.asarray(out.det_in_tube).all()


def test_rescoring_boosts_weak_detection():
    """A weak det inside a strong tube gets boosted to the tube statistic."""
    t, n = 4, 2
    boxes = np.tile(np.array([10, 10, 40, 40], np.float32), (t, n, 1))
    boxes[:, 1] += 200.0  # det 1 far away, low score, unmatched by tracking
    scores = np.array([[0.9, 0.1], [0.9, 0.1], [0.1, 0.1], [0.9, 0.1]],
                      np.float32)
    tracked = boxes.copy()
    valid = np.ones((t, n), bool)
    out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(tracked), jnp.asarray(valid), max_tubes=1)
    rescored = np.asarray(out.rescored)
    # tube = det 0 in all frames; top half = 2 of [0.9,0.9,0.9,0.1] -> 0.9
    assert float(rescored[2, 0]) > 0.85
    np.testing.assert_allclose(rescored[:, 1], scores[:, 1])  # untouched


def test_exhausted_detections_stop_producing_tubes(rng):
    boxes, scores, tracked, valid = random_case(rng, t=3, n=2)
    out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(tracked), jnp.asarray(valid), max_tubes=8)
    n_valid_dets = int(valid.sum())
    claimed = int(np.asarray(out.det_in_tube).sum())
    assert claimed <= n_valid_dets
    n_tubes = int(np.asarray(out.tube_valid).sum())
    assert n_tubes <= 8
    # after all dets are claimed, remaining tube slots must be invalid
    assert not np.asarray(out.tube_valid)[n_tubes:].any()


def test_link_all_classes_shape(rng):
    boxes, scores, tracked, valid = random_case(rng, t=3, n=4)
    cb = jnp.stack([jnp.asarray(boxes)] * 3)
    cs = jnp.stack([jnp.asarray(scores)] * 3)
    ct = jnp.stack([jnp.asarray(tracked)] * 3)
    cv = jnp.stack([jnp.asarray(valid)] * 3)
    out = link_all_classes(cb, cs, ct, cv, max_tubes=4)
    assert out.det_idx.shape == (3, 4, 3)
    assert out.rescored.shape == (3, 3, 4)


def test_tube_bridges_empty_frame():
    """A frame with zero valid detections must not void the class's tubes
    (advisor finding): the tube passes through a virtual skip slot and the
    real detections on both sides still get linked and rescored."""
    t, n = 5, 2
    boxes = np.tile(np.array([10, 10, 40, 40], np.float32), (t, n, 1))
    scores = np.full((t, n), 0.8, np.float32)
    scores[0, 0] = 0.9
    tracked = boxes.copy()
    valid = np.ones((t, n), bool)
    valid[2] = False  # middle frame: no detections at all
    out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(tracked), jnp.asarray(valid), max_tubes=1)
    assert bool(out.tube_valid[0]), "tube must survive the empty frame"
    in_tube = np.asarray(out.det_in_tube)
    # claimed on both sides of the gap, never inside it
    assert in_tube[0].any() and in_tube[3].any() and in_tube[4].any()
    assert not in_tube[2].any()
    # rescoring reached the far side of the gap
    rescored = np.asarray(out.rescored)
    assert rescored[4].max() >= 0.8


def test_all_frames_empty_yields_no_tubes():
    t, n = 3, 2
    boxes = np.zeros((t, n, 4), np.float32)
    scores = np.zeros((t, n), np.float32)
    valid = np.zeros((t, n), bool)
    out = link_tubes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(boxes), jnp.asarray(valid), max_tubes=3)
    assert not np.asarray(out.tube_valid).any()
    assert not np.asarray(out.det_in_tube).any()


def test_tube_score_boost_statistics():
    """cfg.eval.tube_score_boost selects the boost statistic: rescored
    claimed detections are lifted to mean-of-top-half / mean / max of the
    tube's claimed scores (the field was dead config in round 2)."""
    t, n = 4, 1
    boxes = np.tile(np.array([10, 10, 40, 40], np.float32), (t, n, 1))
    scores = np.array([[0.9], [0.5], [0.3], [0.1]], np.float32)
    tracked = boxes.copy()
    valid = np.ones((t, n), bool)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(tracked),
            jnp.asarray(valid))
    expect = {
        "mean_top_half": (0.9 + 0.5) / 2,     # top half of 4 scores
        "mean": (0.9 + 0.5 + 0.3 + 0.1) / 4,
        "max": 0.9,
    }
    for stat, want in expect.items():
        out = link_tubes(*args, max_tubes=1, score_boost=stat)
        rescored = np.asarray(out.rescored)[:, 0]
        # every claimed det boosted to max(original, statistic)
        np.testing.assert_allclose(rescored,
                                   np.maximum(scores[:, 0], want), rtol=1e-6)


def test_tube_score_boost_rejects_unknown():
    boxes = jnp.zeros((2, 1, 4))
    scores = jnp.zeros((2, 1))
    valid = jnp.ones((2, 1), bool)
    try:
        link_tubes(boxes, scores, boxes, valid, max_tubes=1,
                   score_boost="median")
    except ValueError as e:
        assert "tube_score_boost" in str(e)
    else:
        raise AssertionError("unknown score_boost must raise")
