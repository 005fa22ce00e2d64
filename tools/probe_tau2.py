#!/usr/bin/env python
"""Diagnose the τ=2 mAP collapse on clean synthetic (round 5).

Clean 16-frame snippets, mid checkpoint: τ=1 mAP 1.0, τ=2 linked 0.79 —
interpolation on constant-velocity objects should be near-exact, so ~21
points are leaking somewhere in link → interpolate → fallback. This runs
the EXACT strided path on a few snippets and prints, per frame, how many
GT objects are covered (IoU >= 0.5) by (a) raw keyframe detections,
(b) tube-interpolated detections, (c) the union the evaluator scores —
plus tube bookkeeping (tube_valid count, det_in_tube coverage per tube).

Run on the TPU host: python tools/probe_tau2.py --checkpoint runs/mid_synth
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou(a, b):
    import numpy as np
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ix = np.maximum(0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1) + 1)
    iy = np.maximum(0, np.minimum(ay2, by2) - np.maximum(ay1, by1) + 1)
    inter = ix * iy
    ua = ((ax2 - ax1 + 1) * (ay2 - ay1 + 1)
          + (bx2 - bx1 + 1) * (by2 - by1 + 1) - inter)
    return inter / np.maximum(ua, 1e-9)


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="runs/mid_synth")
    p.add_argument("--snippets", type=int, default=3)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--tau", type=int, default=2)
    args = p.parse_args()

    from dtt.core.config import load_config
    from dtt.data.synthetic import synthetic_snippet
    from dtt.eval.inference import (evaluate_snippet, interpolate_tubes,
                                    link_snippet, make_pair_step)
    from dtt.train.checkpoint import latest_checkpoint, restore_params_only
    from dtt.train.trainer import create_train_state

    ck = latest_checkpoint(args.checkpoint)
    cfg = load_config(os.path.join(ck, "config.yml"))
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32))
    params, _ = restore_params_only(ck, state.params)

    pair_step = make_pair_step(cfg, model)
    rng = np.random.RandomState(123)
    for s in range(args.snippets):
        imgs, gt_boxes, gt_labels, gt_valid = synthetic_snippet(
            rng, args.frames, h, w, cfg.model.num_classes,
            cfg.input.max_gt_boxes, uint8=True)
        boxes, scores, valid, tracked, eval_ts = evaluate_snippet(
            cfg, pair_step, params, imgs, tau=args.tau)
        _, tubes = link_snippet(cfg, boxes, scores, tracked, valid)
        tv = np.asarray(tubes.tube_valid)
        onmat = np.asarray(tubes.det_in_tube)
        print(f"snippet {s}: eval_ts={eval_ts}  tubes/class="
              f"{tv.sum(axis=1).tolist()}", flush=True)
        ts, cls0, sc, bx = interpolate_tubes(tubes, boxes, eval_ts,
                                             args.frames, tau=args.tau)
        t_len = args.frames
        n_obj = int(gt_valid[0].sum())
        for t in range(t_len):
            cover_raw = cover_itp = 0
            for g in range(n_obj):
                gt = gt_boxes[t, g]
                c = int(gt_labels[g]) - 1
                if t in eval_ts:
                    ti = eval_ts.index(t)
                    v = np.asarray(valid[c][ti]).astype(bool)
                    if v.any() and iou(gt, np.asarray(boxes[c][ti])[v]).max() >= 0.5:
                        cover_raw += 1
                sel = (ts == t) & (cls0 == c) & (sc > 0.05)
                if sel.any() and iou(gt, bx[sel]).max() >= 0.5:
                    cover_itp += 1
            tag = "KEY" if t in eval_ts else "   "
            print(f"  t={t:2d} {tag} raw {cover_raw}/{n_obj}  "
                  f"interp {cover_itp}/{n_obj}", flush=True)
        # tube keyframe coverage for the classes present
        for g in range(n_obj):
            c = int(gt_labels[g]) - 1
            for k in np.nonzero(tv[c])[0]:
                j = np.asarray(tubes.det_idx)[c, k]
                on = onmat[c, np.arange(len(eval_ts)), j]
                rs = np.asarray(tubes.rescored)[c, np.arange(len(eval_ts)), j]
                print(f"  class {c} tube {k}: on={on.astype(int).tolist()} "
                      f"rescored={np.round(rs, 2).tolist()}", flush=True)


if __name__ == "__main__":
    main()
