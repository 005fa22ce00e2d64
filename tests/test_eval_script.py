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
