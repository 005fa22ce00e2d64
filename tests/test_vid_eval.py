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


def _eval_class_sequential(detections, gts, iou_thresh=0.5,
                           protocol="devkit"):
    """The pre-round-4 per-detection greedy loop, kept as the oracle for the
    vectorized eval_class (identical devkit semantics required)."""
    from dtt.eval.vid_eval import _iou_matrix, average_precision, det_tuples
    n_gt = sum(len(v) for v in gts.values())
    if n_gt == 0:
        return np.nan, None, None
    dets = det_tuples(detections)
    if not dets:
        return 0.0, np.zeros(0), np.zeros(0)
    dets = sorted(dets, key=lambda d: -d[1])
    matched = {fid: np.zeros(len(b), bool) for fid, b in gts.items()}
    thr = {fid: gt_iou_thresholds(b, iou_thresh, protocol)
           for fid, b in gts.items()}
    tp, fp = np.zeros(len(dets)), np.zeros(len(dets))
    for i, (fid, score, box) in enumerate(dets):
        gt = gts.get(fid)
        if gt is None or len(gt) == 0:
            fp[i] = 1
            continue
        ious = _iou_matrix(np.asarray(box, np.float64)[None, :], gt)[0]
        j = int(np.argmax(ious))
        if ious[j] >= thr[fid][j] and not matched[fid][j]:
            matched[fid][j] = True
            tp[i] = 1
        else:
            fp[i] = 1
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    rec = ctp / n_gt
    prec = ctp / np.maximum(ctp + cfp, 1e-9)
    return average_precision(rec, prec), rec, prec


def test_vectorized_matcher_equals_sequential_oracle():
    """Random crowded scenes: the per-frame vectorized matcher must
    reproduce the sequential greedy loop bit-for-bit (AP and PR curves),
    in both protocols, including tied scores and gt-free frames."""
    rng = np.random.RandomState(7)
    for trial in range(8):
        n_frames, n_dets = 6, 60
        gts = {}
        for f in range(n_frames - 1):     # last frame left gt-free
            g = rng.randint(1, 4)
            xy = rng.randint(0, 60, (g, 2))
            wh = rng.randint(3, 40, (g, 2))
            gts[f] = np.concatenate([xy, xy + wh], 1).astype(float)
        fids = rng.randint(0, n_frames, n_dets)
        scores = np.round(rng.rand(n_dets), 2)    # force score ties
        xy = rng.randint(0, 60, (n_dets, 2))
        wh = rng.randint(3, 40, (n_dets, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(float)
        dets = (fids, scores, boxes)
        for protocol in ("devkit", "flat"):
            ap_v, rec_v, prec_v = eval_class(dets, gts, protocol=protocol)
            ap_s, rec_s, prec_s = _eval_class_sequential(dets, gts,
                                                         protocol=protocol)
            assert ap_v == ap_s, (trial, protocol)
            np.testing.assert_array_equal(rec_v, rec_s)
            np.testing.assert_array_equal(prec_v, prec_s)


def test_det_arrays_formats_agree():
    """Legacy tuple lists, array triples, and lists of per-snippet triples
    canonicalize to the same detections in the same order."""
    from dtt.eval.vid_eval import det_arrays
    tuples = [(0, 0.9, [0, 0, 10, 10]), (1, 0.8, [5, 5, 25, 25]),
              (0, 0.7, [2, 2, 12, 12])]
    triple = (np.array([0, 1, 0]), np.array([0.9, 0.8, 0.7]),
              np.array([[0, 0, 10, 10], [5, 5, 25, 25], [2, 2, 12, 12]]))
    chunks = [(triple[0][:2], triple[1][:2], triple[2][:2]),
              (triple[0][2:], triple[1][2:], triple[2][2:])]
    ref = det_arrays(tuples)
    for other in (det_arrays(triple), det_arrays(chunks)):
        for a, b in zip(ref, other):
            np.testing.assert_array_equal(a, b)


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


def test_nms_frame_dets_dedups_parallel_tube_duplicates():
    """Per-frame greedy NMS over flat detection arrays: duplicates from
    parallel interpolated tubes are suppressed per frame, winners kept by
    score; different frames never suppress each other."""
    from dtt.eval.vid_eval import nms_frame_dets
    fids = np.array([0, 0, 0, 1, 1])
    scores = np.array([0.9, 0.8, 0.5, 0.7, 0.6])
    boxes = np.array([[0, 0, 10, 10],     # f0 winner
                      [1, 0, 11, 10],     # f0 duplicate of winner -> drop
                      [50, 50, 60, 60],   # f0 distinct -> keep
                      [0, 0, 10, 10],     # f1 winner (same box, other frame)
                      [1, 0, 11, 10]],    # f1 duplicate -> drop
                     np.float32)
    keep = nms_frame_dets(fids, scores, boxes, thresh=0.3)
    assert keep.tolist() == [True, False, True, True, False]
