#!/usr/bin/env python
"""Demo: run D&T over a frame directory or video, draw detections + tracks.

Equivalent of the reference demo script (box drawing per
lib/model/utils/net_utils.py vis_detections).

Examples:
  python demo.py --checkpoint runs/dtt --frames /path/to/frames --out demo_out
  python demo.py --checkpoint runs/tiny --synthetic --out demo_out
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Detect&Track demo")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--frames", default=None,
                   help="directory of ordered frames (JPEG/PNG) or a video file")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--link", action="store_true")
    return p.parse_args()


def read_frames(path):
    import cv2
    if os.path.isdir(path):
        names = sorted(f for f in os.listdir(path)
                       if f.lower().endswith((".jpeg", ".jpg", ".png")))
        return [cv2.imread(os.path.join(path, n)).astype(np.float32)
                for n in names]
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame.astype(np.float32))
    cap.release()
    return frames


_COLORS = [(60, 76, 231), (113, 204, 46), (219, 152, 52), (34, 126, 230),
           (156, 89, 182), (47, 156, 241), (133, 160, 22), (43, 57, 192)]


def draw(img, boxes, scores, classes, names, tube_ids=None):
    import cv2
    out = img.copy().astype(np.uint8)
    for i, (b, s, c) in enumerate(zip(boxes, scores, classes)):
        color = _COLORS[(tube_ids[i] if tube_ids is not None else c) % len(_COLORS)]
        x1, y1, x2, y2 = [int(round(v)) for v in b]
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        label = f"{names[c] if c < len(names) else c}:{s:.2f}"
        if tube_ids is not None:
            label += f" #{tube_ids[i]}"
        cv2.putText(out, label, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return out


def main():
    args = parse_args()
    import cv2
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eval import load_model_state
    from dtt.data.imagenet_vid import CLASS_NAMES
    from dtt.data.transforms import normalize, resize_to_canvas
    from dtt.eval.inference import evaluate_snippet, link_snippet, make_pair_step

    cfg, model, state = load_model_state(args)
    names = (CLASS_NAMES if cfg.model.num_classes == 31
             else [f"c{i}" for i in range(cfg.model.num_classes)])

    if args.synthetic:
        from dtt.data.synthetic import synthetic_snippet
        rng = np.random.RandomState(7)
        h, w = cfg.input.canvas_height, cfg.input.canvas_width
        raw, _, _, _ = synthetic_snippet(rng, 8, h, w, cfg.model.num_classes,
                                         cfg.input.max_gt_boxes)
        frames = list(raw)
        scale = 1.0
        canvases = [normalize(f, cfg.input) for f in frames]
    else:
        assert args.frames, "--frames required without --synthetic"
        frames = read_frames(args.frames)
        assert frames, f"no frames found at {args.frames}"
        canvases, scale = [], None
        for f in frames:
            c, scale = resize_to_canvas(f, cfg.input)  # normalizes internally
            canvases.append(c)

    pair_step = make_pair_step(cfg, model)
    if args.synthetic:
        im_hw = (cfg.input.canvas_height, cfg.input.canvas_width)
    else:
        im_hw = (round(frames[0].shape[0] * scale),
                 round(frames[0].shape[1] * scale))
    boxes, scores, valid, tracked = evaluate_snippet(
        cfg, pair_step, state.params, np.stack(canvases),
        im_hw=im_hw, scale=scale or 1.0)
    tube_of = None
    if args.link:
        scores, tubes = link_snippet(cfg, boxes, scores, tracked, valid)
        det_idx = np.asarray(tubes.det_idx)       # (C-1, max_tubes, T)
        tube_ok = np.asarray(tubes.tube_valid)
        in_tube = np.asarray(tubes.det_in_tube)
        tube_of = np.full(scores.shape, -1, np.int64)
        tid = 0
        for c in range(det_idx.shape[0]):
            for k in range(det_idx.shape[1]):
                if not tube_ok[c, k]:
                    continue
                for t in range(det_idx.shape[2]):
                    j = det_idx[c, k, t]
                    if in_tube[c, t, j]:
                        tube_of[c, t, j] = tid
                tid += 1

    os.makedirs(args.out, exist_ok=True)
    n_drawn = 0
    for t, frame in enumerate(frames):
        bs, ss, cs, tids = [], [], [], []
        for ci in range(scores.shape[0]):
            for m in range(scores.shape[2]):
                if valid[ci, t, m] and scores[ci, t, m] >= args.score_thresh:
                    bs.append(boxes[ci, t, m] / (scale or 1.0))
                    ss.append(float(scores[ci, t, m]))
                    cs.append(ci + 1)
                    tids.append(int(tube_of[ci, t, m]) if tube_of is not None else -1)
        img = draw(frame, bs, ss, cs, names,
                   tube_ids=tids if args.link else None)
        cv2.imwrite(os.path.join(args.out, f"frame_{t:04d}.jpg"), img)
        n_drawn += len(bs)
    print(f"wrote {len(frames)} annotated frames ({n_drawn} boxes) to {args.out}")


if __name__ == "__main__":
    main()
