#!/usr/bin/env python
"""Host-side detection-collection benchmark (VERDICT round-3 task 5).

Measures seconds of host Python per snippet for (a) the detection
accumulation (eval.py collect) and (b) the greedy AP matcher
(dtt.eval.vid_eval.eval_class), old per-detection-tuple loops vs the
round-4 array-valued forms, at real VID scale: 30 foreground classes,
T frames, 300 padded det slots per (class, frame).

Pure CPU — safe to run alongside a live TPU job. Usage:
    python tools/bench_host_collect.py [--frames 500]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from dtt.eval.vid_eval import det_arrays, eval_class  # noqa: E402


def old_collect(boxes, scores, valid, thresh, num_classes, t_len, frame_uid):
    dest = {c: [] for c in range(1, num_classes)}
    for c in range(1, num_classes):
        ci = c - 1
        for t in range(t_len):
            fid = frame_uid + t
            for m in range(boxes.shape[2]):
                if valid[ci, t, m] and scores[ci, t, m] > thresh:
                    dest[c].append((fid, float(scores[ci, t, m]),
                                    boxes[ci, t, m].tolist()))
    return dest


def new_collect(boxes, scores, valid, thresh, num_classes, t_len, frame_uid):
    dest = {c: [] for c in range(1, num_classes)}
    mask = valid & (scores > thresh)
    for c in range(1, num_classes):
        t_idx, m_idx = np.nonzero(mask[c - 1])
        if t_idx.size:
            dest[c].append((frame_uid + t_idx, scores[c - 1][t_idx, m_idx],
                            boxes[c - 1][t_idx, m_idx]))
    return dest


def old_eval_class(detections, gts, iou_thresh=0.5):
    from dtt.eval.vid_eval import (_iou_matrix, average_precision,
                                   gt_iou_thresholds)
    n_gt = sum(len(v) for v in gts.values())
    dets = sorted(detections, key=lambda d: -d[1])
    matched = {fid: np.zeros(len(b), bool) for fid, b in gts.items()}
    thr = {fid: gt_iou_thresholds(b, iou_thresh) for fid, b in gts.items()}
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
    return average_precision(rec, prec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=500)
    p.add_argument("--classes", type=int, default=31)
    p.add_argument("--slots", type=int, default=300)
    args = p.parse_args()
    c, t, m = args.classes - 1, args.frames, args.slots
    rng = np.random.RandomState(0)
    # realistic sparsity: NMS passes ~tens of dets per (class, frame); the
    # score head puts most padded slots below the 0.01 threshold
    scores = (rng.rand(c, t, m) ** 8).astype(np.float32)
    valid = rng.rand(c, t, m) < 0.2
    xy = rng.randint(0, 500, (c, t, m, 2))
    wh = rng.randint(5, 100, (c, t, m, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    thresh = 0.01
    n_live = int((valid & (scores > thresh)).sum())
    print(f"scene: {c} classes x {t} frames x {m} slots, "
          f"{n_live} detections above threshold")

    t0 = time.perf_counter()
    old = old_collect(boxes, scores, valid, thresh, args.classes, t, 0)
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    new = new_collect(boxes, scores, valid, thresh, args.classes, t, 0)
    t_new = time.perf_counter() - t0
    for cc in old:   # identical content, identical order
        a, b = det_arrays(old[cc]), det_arrays(new[cc])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    print(f"collect: old {t_old:.3f}s  new {t_new:.3f}s  "
          f"speedup {t_old / max(t_new, 1e-9):.1f}x")

    # AP matcher on one class's detections (every frame has gt)
    gts = {}
    for f in range(t):
        g = rng.randint(1, 4)
        gxy = rng.randint(0, 500, (g, 2))
        gwh = rng.randint(5, 100, (g, 2))
        gts[f] = np.concatenate([gxy, gxy + gwh], 1).astype(float)
    dets_t = old[1]
    dets_a = new[1]
    t0 = time.perf_counter()
    ap_old = old_eval_class(dets_t, gts)
    t_old2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    ap_new, _, _ = eval_class(dets_a, gts)
    t_new2 = time.perf_counter() - t0
    assert ap_old == ap_new, (ap_old, ap_new)
    print(f"eval_class ({len(dets_t)} dets): old {t_old2:.3f}s  "
          f"new {t_new2:.3f}s  speedup {t_old2 / max(t_new2, 1e-9):.1f}x")
    per_1000 = (t_old + 30 * t_old2) * (1000 / t)
    per_1000_new = (t_new + 30 * t_new2) * (1000 / t)
    print(f"host s/1000-frame snippet (collect + 30-class eval): "
          f"old {per_1000:.1f}  new {per_1000_new:.2f}  "
          f"speedup {per_1000 / max(per_1000_new, 1e-9):.1f}x")


if __name__ == "__main__":
    main()
