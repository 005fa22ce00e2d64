"""eval.py host-side helpers (gt assembly must never truncate crowds)."""

import importlib

import numpy as np

eval_script = importlib.import_module("eval")


def _fake_annots(t_len: int, n_tracks: int):
    annots = []
    for t in range(t_len):
        boxes = np.stack([[10.0 * i, 5.0 * i, 10.0 * i + 20, 5.0 * i + 20]
                          for i in range(n_tracks)]).astype(np.float32)
        annots.append({
            "boxes": boxes + t,  # slight motion
            "labels": np.array([1 + (i % 3) for i in range(n_tracks)]),
            "trackids": np.arange(n_tracks),
            "height": 480, "width": 640,
        })
    return annots


def test_snippet_gt_not_truncated_beyond_30_tracks():
    """Regression: >input.max_gt_boxes tracks used to be silently dropped,
    deflating the gt count and inflating mAP on crowded snippets."""
    n_tracks = 37  # > the 30-slot device-side static pad
    annots = _fake_annots(t_len=4, n_tracks=n_tracks)
    gt_boxes, gt_labels, gt_valid = eval_script.snippet_gt_arrays(annots, 0.5)
    assert gt_boxes.shape == (4, n_tracks, 4)
    assert gt_valid.all()
    assert (gt_labels == np.array([1 + (i % 3) for i in range(n_tracks)])).all()
    # scale applied
    np.testing.assert_allclose(gt_boxes[0, 1], np.array([10, 5, 30, 25]) * 0.5)


def test_snippet_gt_partial_visibility():
    annots = _fake_annots(t_len=3, n_tracks=2)
    # track 1 invisible in frame 1
    annots[1]["boxes"] = annots[1]["boxes"][:1]
    annots[1]["labels"] = annots[1]["labels"][:1]
    annots[1]["trackids"] = annots[1]["trackids"][:1]
    gt_boxes, gt_labels, gt_valid = eval_script.snippet_gt_arrays(annots, 1.0)
    assert gt_valid[0].all() and gt_valid[2].all()
    assert gt_valid[1, 0] and not gt_valid[1, 1]


def test_cap_frame_dets_caps_across_classes():
    """cfg.eval.max_dets_per_frame (dead config in round 2) now caps each
    frame's detections ACROSS classes, reference max_per_image semantics."""
    c, t, m = 3, 2, 4
    rng = np.random.RandomState(0)
    scores = rng.rand(c, t, m).astype(np.float32)
    valid = np.ones((c, t, m), bool)
    capped = eval_script.cap_frame_dets(scores, valid, max_dets=5)
    for f in range(t):
        kept = scores[:, f, :][capped[:, f, :]]
        dropped = scores[:, f, :][valid[:, f, :] & ~capped[:, f, :]]
        assert kept.size == 5
        assert dropped.size == c * m - 5
        assert kept.min() >= dropped.max()  # the kept set is the top set
    # no-op when the budget exceeds the candidate count
    assert (eval_script.cap_frame_dets(scores, valid, max_dets=50)
            == valid).all()
    # invalid slots never resurrected
    valid2 = valid.copy()
    valid2[0] = False
    assert not eval_script.cap_frame_dets(scores, valid2, 5)[0].any()


def test_strided_fallback_emits_unclaimed_detections():
    """eval --tau N must never silently drop detections no tube claimed
    (VERDICT round-2 task 5): with max_tubes=1 and two well-separated
    objects, the second object's keyframe detections fall back to raw
    emission instead of vanishing."""
    from dtt.core.config import Config

    cfg = Config()
    cfg = cfg.replace(eval=cfg.eval.replace(max_tubes_per_class=1,
                                            score_thresh=0.01))
    num_classes = 2   # one foreground class
    t_prime, m = 3, 2
    eval_ts = [0, 2, 4]
    t_len = 5
    boxes = np.zeros((1, t_prime, m, 4), np.float32)
    for ti in range(t_prime):
        boxes[0, ti, 0] = [10, 10, 40, 40]       # object A (claimed by tube)
        boxes[0, ti, 1] = [200, 200, 240, 240]   # object B (no tube budget)
    scores = np.zeros((1, t_prime, m), np.float32)
    scores[0, :, 0] = 0.9
    scores[0, :, 1] = 0.6
    tracked = boxes.copy()
    valid = np.ones((1, t_prime, m), bool)

    all_dets = {1: []}
    raw_dets = {1: []}
    eval_script.process_strided_snippet(
        cfg, num_classes, 0, t_len, eval_ts, boxes, scores, valid, tracked,
        all_dets, raw_dets)

    from dtt.eval.vid_eval import det_tuples
    # raw keyframe detections collected for mAP_nolink: both objects
    assert len(det_tuples(raw_dets[1])) == 2 * t_prime
    # object B's detections appear in the final set despite having no tube
    final = det_tuples(all_dets[1])
    b_dets = [d for d in final if d[2][0] > 100]
    assert len(b_dets) == t_prime, final
    assert {d[0] for d in b_dets} == set(eval_ts)
    # object A still comes from tube interpolation: every frame covered
    a_frames = {d[0] for d in final if d[2][0] < 100}
    assert a_frames == set(range(t_len))
