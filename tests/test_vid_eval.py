"""mAP evaluator vs hand-computable PR cases."""

import numpy as np

from dtt.eval.vid_eval import (average_precision, eval_class, eval_detections,
                               gt_iou_thresholds)


def test_perfect_detections():
    gts = {0: np.array([[0, 0, 10, 10], [50, 50, 80, 80]], float),
           1: np.array([[5, 5, 25, 25]], float)}
    dets = [(0, 0.9, [0, 0, 10, 10]), (0, 0.8, [50, 50, 80, 80]),
            (1, 0.7, [5, 5, 25, 25])]
    ap, rec, prec = eval_class(dets, gts)
    assert ap == 1.0


def test_half_recall():
    gts = {0: np.array([[0, 0, 10, 10], [100, 100, 130, 130]], float)}
    dets = [(0, 0.9, [0, 0, 10, 10])]
    ap, rec, prec = eval_class(dets, gts)
    # one TP of two gt, precision 1 at recall 0.5 -> AP 0.5
    assert abs(ap - 0.5) < 1e-9


def test_duplicate_detection_is_fp():
    gts = {0: np.array([[0, 0, 10, 10]], float)}
    dets = [(0, 0.9, [0, 0, 10, 10]), (0, 0.8, [0, 0, 10, 10])]
    ap, rec, prec = eval_class(dets, gts)
    assert rec[-1] == 1.0
    assert prec[-1] == 0.5
    assert ap == 1.0  # the duplicate ranks after the TP, AP unaffected


def test_low_iou_is_fp():
    gts = {0: np.array([[0, 0, 10, 10]], float)}
    dets = [(0, 0.9, [8, 8, 30, 30])]
    ap, _, _ = eval_class(dets, gts)
    assert ap == 0.0


def test_score_order_matters():
    """A high-scoring FP before the TP halves early precision."""
    gts = {0: np.array([[0, 0, 10, 10]], float)}
    dets = [(0, 0.95, [200, 200, 230, 230]), (0, 0.9, [0, 0, 10, 10])]
    ap, _, _ = eval_class(dets, gts)
    assert abs(ap - 0.5) < 1e-9


def test_average_precision_known_curve():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    assert abs(average_precision(rec, prec) - 0.75) < 1e-9


def test_map_aggregation():
    gts1 = {0: np.array([[0, 0, 10, 10]], float)}
    gts2 = {0: np.array([[0, 0, 10, 10]], float)}
    dets = {1: [(0, 0.9, [0, 0, 10, 10])], 2: [(0, 0.9, [100, 100, 120, 120])]}
    out = eval_detections(dets, {1: gts1, 2: gts2}, num_classes=3)
    assert out["ap"][1] == 1.0 and out["ap"][2] == 0.0
    assert out["map"] == 0.5


def test_class_without_gt_is_excluded_from_map():
    gts1 = {0: np.array([[0, 0, 10, 10]], float)}
    dets = {1: [(0, 0.9, [0, 0, 10, 10])]}
    out = eval_detections(dets, {1: gts1}, num_classes=4)
    assert np.isnan(out["ap"][2]) and np.isnan(out["ap"][3])
    assert out["map"] == 1.0


def test_gt_absent_class_with_detections_is_excluded():
    """False positives for a gt-absent class must not deflate mAP (devkit
    convention; previously returned AP=0 and dragged the mean down)."""
    gts1 = {0: np.array([[0, 0, 10, 10]], float)}
    dets = {1: [(0, 0.9, [0, 0, 10, 10])],
            2: [(0, 0.8, [50, 50, 70, 70])]}   # class 2 has no gt anywhere
    out = eval_detections(dets, {1: gts1}, num_classes=3)
    assert np.isnan(out["ap"][2])
    assert out["map"] == 1.0


def test_devkit_thresholds_hand_computed():
    # box (0,0,4,4): w=h=5 -> 25/(15*15) = 1/9; large box stays at 0.5
    boxes = np.array([[0, 0, 4, 4], [0, 0, 99, 99]], float)
    thr = gt_iou_thresholds(boxes)
    assert abs(thr[0] - 25.0 / 225.0) < 1e-12
    assert thr[1] == 0.5
    flat = gt_iou_thresholds(boxes, protocol="flat")
    assert flat[0] == 0.5 and flat[1] == 0.5


def test_devkit_relaxes_small_boxes():
    """A loose detection on a tiny gt matches under devkit but not flat 0.5.

    gt (0,0,4,4) 5x5 px, det (2,2,6,6): inter 3x3=9, union 25+25-9=41,
    IoU = 9/41 = 0.2195; devkit threshold 25/225 = 0.111.
    """
    gts = {0: np.array([[0, 0, 4, 4]], float)}
    dets = [(0, 0.9, [2, 2, 6, 6])]
    ap_devkit, _, _ = eval_class(dets, gts, protocol="devkit")
    ap_flat, _, _ = eval_class(dets, gts, protocol="flat")
    assert ap_devkit == 1.0
    assert ap_flat == 0.0


def test_devkit_threshold_is_per_matched_gt():
    """The threshold comes from the argmax-overlap gt, not a global min."""
    # one tiny gt (relaxed thr) and one large gt (0.5 thr) in the same frame;
    # a det overlapping the LARGE one at IoU 0.4 must stay a FP
    gts = {0: np.array([[0, 0, 4, 4], [100, 100, 199, 199]], float)}
    # det inside the large gt: inter 100x40 = 4000, union 10000 -> IoU 0.4,
    # below the large gt's 0.5 threshold (its devkit thr is min(0.5, 0.826))
    dets = [(0, 0.9, [100, 100, 199, 139])]
    ap, _, _ = eval_class(dets, gts, protocol="devkit")
    assert ap == 0.0
