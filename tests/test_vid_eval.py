"""mAP evaluator vs hand-computable PR cases."""

import numpy as np

from dtt.eval.vid_eval import average_precision, eval_class, eval_detections


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
