#!/usr/bin/env python
"""Probe why specific flagship-eval synthetic snippets yield ZERO detections
(round-4 flagship run: mAP 0.679 with ~5 of 32 snippets detection-dead while
the rest score ~1.0). Recreates a dead snippet exactly as eval.py does, then
re-runs the cached video step on controlled variants to isolate the cause:
position shift, class swap, velocity zeroing, background reroll.

Run on TPU: python tools/probe_dead_snippet.py --checkpoint /tmp/flagship_synth
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()

import argparse
import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="/tmp/flagship_synth")
    p.add_argument("--snippet", type=int, default=7)
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()

    from dtt.core.config import load_config
    from dtt.train.checkpoint import latest_checkpoint, restore_params_only
    from dtt.train.trainer import create_train_state
    from dtt.eval.inference import evaluate_snippet_video, make_video_step
    from dtt.data.synthetic import (_background, render_frame,
                                    sample_snippet_params)

    ck = latest_checkpoint(args.checkpoint)
    cfg = load_config(os.path.join(args.checkpoint, "config.yml"))
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      jnp.zeros((1, 2, h, w, 3), jnp.float32))
    params, step_n = restore_params_only(ck, state.params)
    print(f"loaded {ck}")
    video_step = make_video_step(cfg, model, min(33, args.frames + 1))

    # recreate eval's RNG chain up to the target snippet
    rng = np.random.RandomState(123)
    for i in range(args.snippet):
        sample_snippet_params(rng, args.frames, h, w, cfg.model.num_classes,
                              cfg.input.max_gt_boxes)
        _background(rng, (args.frames, h, w, 3))
    gt_boxes, gt_labels, gt_valid = sample_snippet_params(
        rng, args.frames, h, w, cfg.model.num_classes, cfg.input.max_gt_boxes)
    bg = _background(rng, (args.frames, h, w, 3))

    def run(tag, boxes, labels, background):
        imgs = background.copy()
        for t in range(args.frames):
            render_frame(imgs[t], boxes[t], labels, gt_valid[t])
        b, s, v, tr = evaluate_snippet_video(cfg, video_step, params, imgs,
                                             im_hw=(h, w), scale=1.0)
        live = v & (s > 0.3)
        n_each = []
        for g in range(2):
            # best det score overlapping object g's frame-0 box
            from dtt.eval.vid_eval import _iou_matrix
            gb = boxes[0, g:g + 1]
            best = 0.0
            for c in range(s.shape[0]):
                m = v[c, 0]
                if not m.any():
                    continue
                ious = _iou_matrix(np.asarray(b[c, 0][m], float), gb)[:, 0]
                sc = np.asarray(s[c, 0][m])
                hit = (ious > 0.5)
                if hit.any():
                    best = max(best, float(sc[hit].max()))
            n_each.append(round(best, 3))
        print(f"{tag:40s} hi-dets {int(live.sum()):3d}   "
              f"best score obj0/obj1: {n_each}")

    run("original (dead?)", gt_boxes, gt_labels, bg)
    # variant: shift both objects +40px x, +24px y
    sh = gt_boxes + np.asarray([40, 24, 40, 24], np.float32)
    sh = np.clip(sh, 0, [w - 1, h - 1, w - 1, h - 1])
    run("shifted +40,+24", sh, gt_labels, bg)
    # variant: zero velocity (freeze at frame 0 geometry)
    frozen = np.repeat(gt_boxes[:1], args.frames, axis=0)
    run("zero velocity", frozen, gt_labels, bg)
    # variant: swap classes to (cls % 29) + 1
    swapped = np.where(gt_labels > 0, (gt_labels % 29) + 1, 0).astype(np.int32)
    run(f"classes {gt_labels[gt_valid[0]]} -> {swapped[gt_valid[0]]}",
        gt_boxes, swapped, bg)
    # variant: new background roll
    bg2 = _background(np.random.RandomState(999), (args.frames, h, w, 3))
    run("rerolled background", gt_boxes, gt_labels, bg2)
    # variant: object sizes +-10%
    c = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2
    half = (gt_boxes[..., 2:] - gt_boxes[..., :2]) / 2 * 1.1
    grown = np.concatenate([c - half, c + half], -1).astype(np.float32)
    grown = np.clip(grown, 0, [w - 1, h - 1, w - 1, h - 1])
    run("boxes grown 10%", grown, gt_labels, bg)


if __name__ == "__main__":
    main()


def proposal_probe(args=None):
    """Second-stage probe: for the dead snippet's frame 0, dump RPN proposal
    coverage (max IoU of the 300 proposals vs each gt) and the RFCN class
    probability at the gt box itself — separates RPN recall failure from
    RFCN classification failure."""
    from dtt.core.anchors import grid_anchors_for
    from dtt.core.config import load_config
    from dtt.train.checkpoint import latest_checkpoint, restore_params_only
    from dtt.train.trainer import create_train_state
    from dtt.models.dnt import DnT, make_model, normalize_device_images, rfcn_head
    from dtt.models.rpn import proposal_layer
    from dtt.core import boxes as box_ops
    from dtt.data.synthetic import (_background, render_frame,
                                    sample_snippet_params)
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="/tmp/flagship_synth")
    p.add_argument("--snippet", type=int, default=7)
    p.add_argument("--frames", type=int, default=8)
    a = p.parse_args(args)

    ck = latest_checkpoint(a.checkpoint)
    cfg = load_config(os.path.join(a.checkpoint, "config.yml"))
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      jnp.zeros((1, 2, h, w, 3), jnp.float32))
    params, _ = restore_params_only(ck, state.params)
    rng = np.random.RandomState(123)
    for i in range(a.snippet):
        sample_snippet_params(rng, a.frames, h, w, cfg.model.num_classes,
                              cfg.input.max_gt_boxes)
        _background(rng, (a.frames, h, w, 3))
    gt_boxes, gt_labels, gt_valid = sample_snippet_params(
        rng, a.frames, h, w, cfg.model.num_classes, cfg.input.max_gt_boxes)
    bg = _background(rng, (a.frames, h, w, 3))
    img = bg[0].copy()
    render_frame(img, gt_boxes[0], gt_labels, gt_valid[0])

    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, h // 16, w // 16))
    mcfg = cfg.model

    @jax.jit
    def probe(params, img):
        x = normalize_device_images(img[None], jnp.asarray([h, w], jnp.float32),
                                    cfg.input.pixel_means)
        feats = model.apply(params, x, method=DnT.frame_features)
        props = proposal_layer(feats.rpn_cls[0], feats.rpn_bbox[0], anchors,
                               h, w, 1.0, mcfg.rpn, False)
        # RFCN head at the gt boxes themselves + at proposals
        gtb = jnp.asarray(gt_boxes[0][gt_valid[0]])
        cls_gt, _ = rfcn_head(mcfg, feats.cls_maps[0], feats.bbox_maps[0],
                              gtb, 1.0 / mcfg.anchors.feat_stride)
        return props, jax.nn.softmax(cls_gt, -1)

    props, cls_at_gt = probe(params, jnp.asarray(img))
    rois = np.asarray(props.rois)[np.asarray(props.valid)]
    scores = np.asarray(props.scores)[np.asarray(props.valid)]
    print(f"valid proposals: {len(rois)}, top score {scores.max():.3f}")
    for g in range(int(gt_valid[0].sum())):
        gb = gt_boxes[0, g]
        iou = np.asarray(box_ops.pairwise_iou(jnp.asarray(rois),
                                              jnp.asarray(gb[None])))[:, 0]
        j = int(np.argmax(iou))
        probs = np.asarray(cls_at_gt[g])
        print(f"obj{g} cls={gt_labels[g]} box={gb.round(0)}: "
              f"best proposal IoU {iou[j]:.3f} (rpn score {scores[j]:.3f}); "
              f"RFCN@gt: argmax cls {int(probs.argmax())} "
              f"p={probs.max():.3f}, p[true]={probs[gt_labels[g]]:.3f}")


if __name__ == "__main__" and os.environ.get("PROBE_STAGE") == "2":
    proposal_probe()
