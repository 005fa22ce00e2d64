"""ImageNet VID detection evaluation: per-class AP -> mAP.

Equivalent of the reference's VID evaluator (ref: lib/datasets vid_eval
module, itself a port of the ImageNet devkit's eval_vid): detections are
matched greedily in descending score order against unmatched ground truth;
precision/recall integrate into AP with the all-points (VOC-2010+/devkit)
interpolation. Host-side NumPy — evaluation is offline and per-dataset, not
a jit target.

Protocols:
* ``devkit`` (default) — the ImageNet devkit's size-adaptive IoU threshold:
  each ground-truth box of width w and height h (+1 pixel convention) is
  matched at threshold ``min(thr, w*h / ((w+10)*(h+10)))``, relaxing the
  criterion for small objects. Paper mAP numbers (74.2/79.8) use this.
* ``flat`` — a single fixed IoU threshold for every box (VOC-style).

A class with zero ground truth in the evaluated set returns AP=NaN and is
excluded from mAP regardless of whether it has detections (devkit
convention; false positives for gt-absent classes do not deflate mAP).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ix = (np.minimum(a[:, None, 2], b[None, :, 2])
          - np.maximum(a[:, None, 0], b[None, :, 0]) + 1)
    iy = (np.minimum(a[:, None, 3], b[None, :, 3])
          - np.maximum(a[:, None, 1], b[None, :, 1]) + 1)
    inter = np.maximum(ix, 0) * np.maximum(iy, 0)
    area = lambda z: (z[:, 2] - z[:, 0] + 1) * (z[:, 3] - z[:, 1] + 1)
    union = area(a)[:, None] + area(b)[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-points interpolated AP (VOC 2010+ / ImageNet devkit)."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(mpre.size - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def gt_iou_thresholds(boxes: np.ndarray, iou_thresh: float = 0.5,
                      protocol: str = "devkit") -> np.ndarray:
    """Per-ground-truth-box matching threshold.

    devkit: min(thr, w*h / ((w+10)*(h+10))) with +1 pixel widths (the
    ImageNet devkit eval_vid rule — small boxes match at lower IoU).
    flat: the fixed threshold for every box.
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    if protocol == "flat":
        return np.full(len(boxes), iou_thresh)
    if protocol != "devkit":
        raise ValueError(f"unknown eval protocol {protocol!r}")
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    return np.minimum(iou_thresh, (w * h) / ((w + 10.0) * (h + 10.0)))


def eval_class(detections: Sequence[tuple], gts: Dict, iou_thresh: float = 0.5,
               protocol: str = "devkit"
               ) -> tuple[float, np.ndarray, np.ndarray]:
    """AP for one class.

    Args:
      detections: list of (frame_id, score, box[4]) for this class.
      gts: {frame_id: (G, 4) array} ground-truth boxes of this class.
      protocol: "devkit" (size-adaptive IoU) or "flat" (fixed IoU).
    Returns: (ap, recall curve, precision curve).
    """
    n_gt = sum(len(v) for v in gts.values())
    if n_gt == 0:
        # no gt for this class in the evaluated set: excluded from mAP even
        # if detections exist (devkit convention — see module docstring)
        return np.nan, None, None
    if not detections:
        return 0.0, np.zeros(0), np.zeros(0)

    dets = sorted(detections, key=lambda d: -d[1])
    matched = {fid: np.zeros(len(boxes), bool) for fid, boxes in gts.items()}
    thr = {fid: gt_iou_thresholds(boxes, iou_thresh, protocol)
           for fid, boxes in gts.items()}
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
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
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-9)
    return average_precision(recall, precision), recall, precision


def eval_detections(all_dets: Dict[int, List[tuple]],
                    all_gts: Dict[int, Dict],
                    num_classes: int,
                    iou_thresh: float = 0.5,
                    class_names: Sequence[str] | None = None,
                    protocol: str = "devkit") -> dict:
    """Full mAP table.

    Args:
      all_dets: {class_id: [(frame_id, score, box), ...]} (class ids 1-based,
        background excluded).
      all_gts: {class_id: {frame_id: (G, 4) boxes}}.
      num_classes: total including background (class 0).
      protocol: "devkit" (size-adaptive IoU, the ImageNet eval_vid rule) or
        "flat" (fixed IoU threshold).
    Returns dict with per-class AP and mAP over classes that have gt.
    """
    aps = {}
    for c in range(1, num_classes):
        ap, _, _ = eval_class(all_dets.get(c, []), all_gts.get(c, {}),
                              iou_thresh, protocol)
        aps[c] = ap
    valid_aps = [v for v in aps.values() if not np.isnan(v)]
    result = {
        "ap": aps,
        "map": float(np.mean(valid_aps)) if valid_aps else 0.0,
        "protocol": protocol,
    }
    if class_names:
        result["ap_named"] = {class_names[c]: aps[c] for c in aps}
    return result
