#!/usr/bin/env python
"""Evaluate D&T: detections + tube linking + VID mAP
(TPU-native equivalent of the reference test_net.py + linking).

Examples:
  # synthetic end-to-end check against generated ground truth:
  python eval.py --synthetic --checkpoint runs/dtt

  # ImageNet VID validation with tube rescoring:
  python eval.py --dataset imagenet_vid_val --data-root /data/ILSVRC2015 \
      --checkpoint runs/dtt --link
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate Detect&Track (TPU)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    p.add_argument("--checkpoint", required=True,
                   help="run dir (uses LATEST) or explicit step dir")
    p.add_argument("--dataset", default="imagenet_vid_val")
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-snippets", type=int, default=4)
    p.add_argument("--synthetic-frames", type=int, default=8,
                   help="frames per synthetic snippet (also sizes the video "
                        "chunk so short snippets aren't padded to 33 frames)")
    p.add_argument("--synthetic-hard", action="store_true",
                   help="hard synthetic eval: occlusion windows, flickering "
                        "distractors, noise bursts, confusable textures "
                        "(dtt/data/synthetic_hard.py) — the linking benchmark")
    p.add_argument("--hard-visibility", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"), help="occlusion-window alpha range")
    p.add_argument("--hard-distractors", type=int, default=None)
    p.add_argument("--hard-noise-sigma", type=float, default=None)
    p.add_argument("--hard-occlusion-prob", type=float, default=None)
    p.add_argument("--link", action="store_true", help="tube linking + rescoring")
    p.add_argument("--tau", type=int, default=1,
                   help="temporal stride for strided testing (D&T paper §4); "
                        "tau>1 implies --link + tube interpolation")
    p.add_argument("--out", default=None, help="detections pickle path")
    p.add_argument("--max-snippets", type=int, default=None)
    p.add_argument("--eval-protocol", choices=("devkit", "flat"),
                   default="devkit",
                   help="devkit: size-adaptive IoU threshold (ImageNet "
                        "eval_vid rule, the paper-number protocol); "
                        "flat: fixed IoU 0.5")
    p.add_argument("--parallel", action="store_true",
                   help="data-parallel inference over ALL devices: τ=1 "
                        "shards each chunk's frames (one-frame halo "
                        "exchange); τ>1 shards the pair batch")
    args = p.parse_args()
    if args.synthetic_hard:
        args.synthetic = True   # hard mode IS synthetic (chunk sizing etc.)
    return args


def load_model_state(args):
    from dtt.utils.platform import apply_platform_request
    apply_platform_request()  # honor DTT_PLATFORM before first backend use
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dtt.core.config import load_config
    from dtt.train.checkpoint import latest_checkpoint, restore_params_only
    from dtt.train.trainer import create_train_state

    ck = args.checkpoint
    if os.path.exists(os.path.join(ck, "LATEST")):
        ck = latest_checkpoint(ck)
    # fail fast BEFORE building/compiling the model
    if ck is None or not os.path.exists(os.path.join(ck, "state.msgpack")):
        raise SystemExit(
            f"error: no checkpoint at {args.checkpoint!r} "
            f"(expected a run dir with LATEST or a step dir with state.msgpack)")
    cfg_path = args.config or os.path.join(ck, "config.yml")
    cfg = load_config(cfg_path if os.path.exists(cfg_path) else None, args.set)
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    sample = jnp.zeros((1, 2, h, w, 3), jnp.float32)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), sample)
    params, step = restore_params_only(ck, state.params)
    state = state._replace(params=params, step=jnp.asarray(step))
    print(f"loaded {ck} (step {step})")
    return cfg, model, state


def snippet_stream_synthetic(cfg, n_snippets, num_frames=8, hard=None):
    """Synthetic snippets ship as RAW uint8 canvases: the jitted eval steps
    normalize on device (exact — normalize_device_images), and uint8 is 4x
    fewer H2D bytes than float32 through this machine's ~40 MB/s tunnel.

    `hard`: a dtt.data.synthetic_hard.Hardness — switch to the hard
    generator (occlusions/distractors/noise; the linking benchmark)."""
    rng = np.random.RandomState(123)
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    for i in range(n_snippets):
        if hard is not None:
            from dtt.data.synthetic_hard import synthetic_hard_snippet
            imgs, gt_boxes, gt_labels, gt_valid = synthetic_hard_snippet(
                rng, num_frames, h, w, cfg.model.num_classes,
                cfg.input.max_gt_boxes, hard=hard, uint8=True)
        else:
            from dtt.data.synthetic import synthetic_snippet
            imgs, gt_boxes, gt_labels, gt_valid = synthetic_snippet(
                rng, num_frames, h, w, cfg.model.num_classes,
                cfg.input.max_gt_boxes, uint8=True)
        yield (f"synthetic_{i}", imgs, (h, w), 1.0,
               (gt_boxes, gt_labels, gt_valid))


def snippet_gt_arrays(annots, scale: float):
    """Track-aligned gt arrays for one snippet, sized to the TRUE track count.

    Ground truth is host-side only (the device path never sees it), so gt
    slots grow with the snippet — crowded snippets (>input.max_gt_boxes
    tracks) are never truncated, which would silently inflate mAP.
    Returns (gt_boxes (T, G, 4), gt_labels (G,), gt_valid (T, G)).
    """
    t_len = len(annots)
    tids = [np.asarray(ann["trackids"], np.int64).reshape(-1)
            for ann in annots]
    flat_tids = (np.concatenate(tids) if tids
                 else np.zeros(0, np.int64))
    uniq = np.unique(flat_tids)          # slot order is arbitrary
    g = max(uniq.size, 1)
    gt_boxes = np.zeros((t_len, g, 4), np.float32)
    gt_labels = np.zeros((g,), np.int32)
    gt_valid = np.zeros((t_len, g), bool)
    if flat_tids.size:
        t_idx = np.repeat(np.arange(t_len), [t.size for t in tids])
        slots = np.searchsorted(uniq, flat_tids)
        gt_boxes[t_idx, slots] = np.concatenate(
            [np.asarray(ann["boxes"], np.float32).reshape(-1, 4)
             for ann in annots]) * scale
        gt_labels[slots] = np.concatenate(
            [np.asarray(ann["labels"], np.int32).reshape(-1)
             for ann in annots])
        gt_valid[t_idx, slots] = True
    return gt_boxes, gt_labels, gt_valid


def snippet_stream_vid(cfg, args):
    """Yield (name, frames, im_hw, scale, gt) per snippet.

    `frames` is a LazyFrames: frames decode per inference chunk instead of
    stacking the whole snippet up front (real VID snippets run to thousands
    of frames ≈ tens of GB stacked — the round-2 OOM hazard). The scale and
    true extent come from the annotation header (frames of a snippet share
    dimensions), so nothing is decoded before inference asks for it.
    """
    from dtt.data.imdb import get_dataset
    import dtt.data.imagenet_vid  # noqa: F401
    from dtt.data.transforms import canvas_scale
    from dtt.eval.inference import LazyFrames
    ds = get_dataset(args.dataset, root=args.data_root)
    for i, sn in enumerate(ds.snippets):
        if args.max_snippets and i >= args.max_snippets:
            return
        ann0 = sn.annots[0]
        scale = canvas_scale(ann0["height"], ann0["width"], cfg.input)
        im_hw = (round(ann0["height"] * scale), round(ann0["width"] * scale))
        yield (os.path.basename(os.path.dirname(sn.frames[0])),
               LazyFrames(sn.frames, cfg.input), im_hw, scale,
               snippet_gt_arrays(sn.annots, scale))


def cap_frame_dets(scores: np.ndarray, valid: np.ndarray, max_dets: int
                   ) -> np.ndarray:
    """Per-frame detection cap ACROSS classes (cfg.eval.max_dets_per_frame;
    the reference's test_net.py max_per_image rule): keep each frame's top
    `max_dets` scores among valid detections, ties kept like the reference's
    `>= image_thresh`. Returns the tightened valid mask (C-1, T, M)."""
    c, t, m = scores.shape
    if max_dets <= 0 or c * m <= max_dets:
        return valid
    flat = np.where(valid, scores, -np.inf).transpose(1, 0, 2).reshape(t, -1)
    kth = -np.sort(-flat, axis=1)[:, max_dets - 1]          # (T,)
    keep = (flat >= kth[:, None]) & np.isfinite(flat)
    return valid & keep.reshape(t, c, m).transpose(1, 0, 2)


def process_strided_snippet(cfg, num_classes, frame_uid, t_len, eval_ts,
                            boxes, scores, valid, tracked,
                            all_dets, raw_dets):
    """τ-strided snippet post-processing: link tubes, interpolate them to
    every frame, and FALL BACK to raw keyframe detections for any detection
    no tube claimed — strided testing must never silently drop detections
    (a round-2 gap: only tube-claimed detections were emitted). The raw
    keyframe detections also feed `raw_dets` (mAP_nolink).

    Accumulation is array-valued throughout (dest[c] collects
    (fids, scores, boxes) triples — dtt.eval.vid_eval.det_arrays format);
    the reference's per-detection all_boxes appends (ref: test_net.py) cost
    ~600k Python iterations per 1000-frame snippet at flagship settings."""
    from dtt.eval.inference import interpolate_tubes, link_snippet
    from dtt.eval.vid_eval import nms_frame_dets
    valid = cap_frame_dets(scores, valid, cfg.eval.max_dets_per_frame)
    _, tubes = link_snippet(cfg, boxes, scores, tracked, valid)
    tau = int(eval_ts[1] - eval_ts[0]) if len(eval_ts) > 1 else 1
    ts, cls0, sc, bx = interpolate_tubes(tubes, boxes, eval_ts, t_len,
                                         tau=tau)
    keep = sc > cfg.eval.score_thresh
    in_tube = np.asarray(tubes.det_in_tube)                  # (C-1, T', N)
    mask = valid & (scores > cfg.eval.score_thresh)
    eval_ts = np.asarray(eval_ts)
    for c in range(1, num_classes):
        ti, m = np.nonzero(mask[c - 1])
        if raw_dets is not None and ti.size:
            raw_dets[c].append((frame_uid + eval_ts[ti],
                                scores[c - 1][ti, m], boxes[c - 1][ti, m]))
        # union of interpolated tube detections and unclaimed (orphan) raw
        # keyframe detections, then PER-FRAME NMS: interpolation emits one
        # detection per tube per frame, so parallel tubes on one object
        # reintroduce the spatial duplicates keyframe NMS removed — each a
        # full-score FP at every interpolated frame (see nms_frame_dets)
        sel = keep & (cls0 == c - 1)
        orphan = (~in_tube[c - 1][ti, m] if ti.size
                  else np.zeros(0, bool))
        t_u = np.concatenate([ts[sel], eval_ts[ti][orphan]])
        if t_u.size == 0:
            continue
        s_u = np.concatenate([sc[sel], scores[c - 1][ti, m][orphan]])
        b_u = np.concatenate([bx[sel], boxes[c - 1][ti, m][orphan]], axis=0)
        km = nms_frame_dets(t_u, s_u, b_u, cfg.eval.nms_thresh)
        all_dets[c].append((frame_uid + t_u[km], s_u[km], b_u[km]))


def main():
    args = parse_args()
    from dtt.eval.inference import evaluate_snippet, link_snippet, make_pair_step
    from dtt.eval.vid_eval import eval_detections
    from dtt.data.imagenet_vid import CLASS_NAMES

    cfg, model, state = load_model_state(args)
    do_link = args.link or args.tau > 1   # tau>1 implies tube linking
    pair_batch = 4
    if args.tau > 1:
        if args.parallel:
            from dtt.eval.inference import make_pair_step_parallel
            from dtt.parallel.mesh import data_mesh
            mesh = data_mesh()
            pair_step = make_pair_step_parallel(cfg, model, mesh)
            pair_batch = pair_step.batch
            print(f"parallel strided eval: {mesh.size}-device mesh, "
                  f"{pair_batch}-pair batches")
        else:
            pair_step = make_pair_step(cfg, model)
    elif args.parallel:
        import jax
        from dtt.eval.inference import make_video_step_parallel
        from dtt.parallel.mesh import data_mesh
        mesh = data_mesh()
        n = mesh.size
        fpd = (max(1, (args.synthetic_frames + n) // n) if args.synthetic
               else max(1, 96 // n))
        video_step = make_video_step_parallel(cfg, model, mesh, fpd)
        print(f"parallel eval: {n}-device mesh, "
              f"{video_step.frames_per_chunk}-frame chunks")
    else:
        from dtt.eval.inference import make_video_step
        # synthetic snippets are short and known-length: size the chunk to
        # the snippet instead of padding 8 frames up to a 97-frame upload.
        # 97 is the measured throughput peak (bench.py CHUNK table).
        fpc = (min(97, args.synthetic_frames + 1) if args.synthetic else 97)
        video_step = make_video_step(cfg, model, fpc)
    num_classes = cfg.model.num_classes

    all_dets = {c: [] for c in range(1, num_classes)}
    # when linking, the PRE-linking detections are also collected (linking is
    # a cheap host-side rescoring of already-computed detections; the
    # reference evaluates before and after rescoring — one device pass
    # yields both mAPs). For tau>1 these are the un-interpolated keyframe
    # detections, so mAP_nolink also reflects the strided-testing gap.
    raw_dets = {c: [] for c in range(1, num_classes)} if do_link else None
    all_gts = {c: {} for c in range(1, num_classes)}
    frame_uid = 0

    hard = None
    if args.synthetic_hard:
        from dtt.data.synthetic_hard import Hardness
        over = {}
        if args.hard_visibility is not None:
            over["visibility"] = tuple(args.hard_visibility)
        if args.hard_distractors is not None:
            over["distractors"] = args.hard_distractors
        if args.hard_noise_sigma is not None:
            over["noise_sigma"] = args.hard_noise_sigma
        if args.hard_occlusion_prob is not None:
            over["occlusion_prob"] = args.hard_occlusion_prob
        hard = Hardness(**over)
    stream = (snippet_stream_synthetic(cfg, args.synthetic_snippets,
                                       args.synthetic_frames, hard=hard)
              if args.synthetic or args.synthetic_hard
              else snippet_stream_vid(cfg, args))

    for name, frames, im_hw, scale, (gt_boxes, gt_labels, gt_valid) in stream:
        t_len = frames.shape[0]
        if args.tau > 1:
            boxes, scores, valid, tracked, eval_ts = evaluate_snippet(
                cfg, pair_step, state.params, frames, tau=args.tau,
                batch=pair_batch, im_hw=im_hw, scale=scale)
            process_strided_snippet(cfg, num_classes, frame_uid, t_len,
                                    eval_ts, boxes, scores, valid, tracked,
                                    all_dets, raw_dets)
        else:
            # τ=1: share per-frame features across adjacent pairs (2x fewer
            # backbone passes than the siamese pair formulation)
            from dtt.eval.inference import evaluate_snippet_video
            boxes, scores, valid, tracked = evaluate_snippet_video(
                cfg, video_step, state.params, frames, im_hw=im_hw, scale=scale)
            valid = cap_frame_dets(scores, valid, cfg.eval.max_dets_per_frame)
            raw_scores = scores
            if args.link:
                scores, _ = link_snippet(cfg, boxes, scores, tracked, valid)

            def collect(dest, sc):
                # array-valued accumulation (det_arrays triples): the
                # per-detection tuple loop was ~600k Python iterations per
                # 1000-frame snippet at flagship settings
                mask = valid & (sc > cfg.eval.score_thresh)  # (C-1, T, M)
                for c in range(1, num_classes):
                    t_idx, m_idx = np.nonzero(mask[c - 1])
                    if t_idx.size:
                        dest[c].append((frame_uid + t_idx,
                                        sc[c - 1][t_idx, m_idx],
                                        boxes[c - 1][t_idx, m_idx]))

            collect(all_dets, scores)
            if raw_dets is not None:
                collect(raw_dets, raw_scores)
        for c in np.unique(gt_labels):
            if not 1 <= c < num_classes:   # 0 = padding slots / background
                continue
            slot_mask = gt_labels == c              # (G,)
            present = gt_valid & slot_mask[None, :]  # (T, G)
            for t in np.nonzero(present.any(axis=1))[0]:
                all_gts[int(c)][frame_uid + int(t)] = gt_boxes[t][present[t]]
        frame_uid += t_len
        print(f"snippet {name}: {t_len} frames done (tau={args.tau})")

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump({"dets": all_dets, "gts": all_gts}, f)
        print(f"wrote {args.out}")

    names = CLASS_NAMES if num_classes == 31 else None
    result = eval_detections(all_dets, all_gts, num_classes,
                             class_names=names, protocol=args.eval_protocol)
    per_class = {f"class_{c}": (None if np.isnan(a) else round(a, 4))
                 for c, a in result["ap"].items()}
    out = {"mAP": round(result["map"], 4), "protocol": args.eval_protocol}
    if raw_dets is not None:
        raw = eval_detections(raw_dets, all_gts, num_classes,
                              class_names=names, protocol=args.eval_protocol)
        out["mAP_nolink"] = round(raw["map"], 4)
        out["link_uplift"] = round(result["map"] - raw["map"], 4)
    print(json.dumps({**out, **per_class}))


if __name__ == "__main__":
    main()
