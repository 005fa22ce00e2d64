"""Jit-compiled inference drivers for eval/demo.

The eval path of the reference (ref: test_net.py) iterates val frames,
forwards, thresholds, per-class-NMS and accumulates `all_boxes`; the D&T
variant also collects tracking offsets and then links tubes. Here the whole
per-pair computation — siamese features, proposals, PSRoI heads, correlation
tracking, per-class decode+NMS — is one jitted function; the host only
accumulates numpy results.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dtt.core.anchors import grid_anchors_for
from dtt.core.config import Config
from dtt.eval.linking import link_all_classes
from dtt.models.dnt import (DnT, decode_frame_detections, detect_frame,
                            track_rois)


class PairOutputs(NamedTuple):
    """Per-class padded detections for frame t of the pair."""

    boxes: jnp.ndarray    # (C-1, M, 4)
    scores: jnp.ndarray   # (C-1, M)
    valid: jnp.ndarray    # (C-1, M)
    tracked: jnp.ndarray  # (C-1, M, 4) predicted boxes in frame t+τ


def make_pair_step(cfg: Config, model: DnT):
    """jitted (params, pair (1,2,H,W,3)) -> PairOutputs for frame t."""
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h // 16, w // 16))
    ecfg = cfg.eval

    @jax.jit
    def step(params, pair):
        f_t, f_tau, track_maps = model.apply(params, pair)
        props, det = detect_frame(mcfg, f_t, anchors, h, w, 1.0,
                                  frame_idx=0, train=False)
        deltas = track_rois(mcfg, track_maps, det.rois, frame_idx=0)
        boxes, scores, valid, tracked = decode_frame_detections(
            mcfg, det, h, w, ecfg.score_thresh, ecfg.nms_thresh,
            ecfg.max_per_class, track_deltas=deltas)
        return PairOutputs(boxes, scores, valid, tracked)

    return step


def make_single_frame_step(cfg: Config, model: DnT):
    """jitted (params, image (1,H,W,3)) -> per-class detections (no tracking).

    Driver config #1: single-frame R-FCN detection.
    """
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h // 16, w // 16))
    ecfg = cfg.eval

    @jax.jit
    def step(params, image):
        feats = model.apply(params, image, method=DnT.frame_features)
        props, det = detect_frame(mcfg, feats, anchors, h, w, 1.0,
                                  frame_idx=0, train=False)
        return decode_frame_detections(mcfg, det, h, w, ecfg.score_thresh,
                                       ecfg.nms_thresh, ecfg.max_per_class)

    return step


def evaluate_snippet(cfg: Config, pair_step, params, frames: np.ndarray,
                     tau: int = 1):
    """Slide stride-τ pairs over a snippet; return stacked per-frame dets.

    frames: (T, H, W, 3) normalized. With tau=1 every frame is evaluated
    (the last pairs with itself, matching the reference). With tau>1
    (temporally-strided testing, D&T paper §4) only frames 0, τ, 2τ, ... are
    evaluated; use `interpolate_tubes` to fill skipped frames from tubes.
    Returns numpy (C-1, T', M, 4), (C-1, T', M), (C-1, T', M), (C-1, T', M, 4)
    plus the list of evaluated frame indices.
    """
    t_len = frames.shape[0]
    eval_ts = list(range(0, t_len, tau))
    boxes, scores, valid, tracked = [], [], [], []
    for t in eval_ts:
        t2 = min(t + tau, t_len - 1)
        pair = jnp.asarray(np.stack([frames[t], frames[t2]])[None])
        out = pair_step(params, pair)
        boxes.append(np.asarray(out.boxes))
        scores.append(np.asarray(out.scores))
        valid.append(np.asarray(out.valid))
        tracked.append(np.asarray(out.tracked))
    stack = lambda xs: np.stack(xs, axis=1)  # (C-1, T', ...)
    out = (stack(boxes), stack(scores), stack(valid), stack(tracked))
    return out if tau == 1 else (*out, eval_ts)


def interpolate_tubes(tubes, boxes: np.ndarray, scores: np.ndarray,
                      eval_ts: list[int], t_total: int):
    """Fill skipped frames of a τ-strided evaluation by linear interpolation
    along each tube (D&T paper §4: strided tubes are interpolated to every
    frame). Returns per-frame detection lists:
      {frame: [(class_id0based, score, box(4,)), ...]} for ALL t_total frames.
    """
    det_idx = np.asarray(tubes.det_idx)      # (C, K, T')
    tube_ok = np.asarray(tubes.tube_valid)   # (C, K)
    in_tube = np.asarray(tubes.det_in_tube)  # (C, T', N)
    rescored = np.asarray(tubes.rescored)    # (C, T', N)
    out: dict[int, list] = {t: [] for t in range(t_total)}
    n_c, n_k, n_t = det_idx.shape
    for c in range(n_c):
        for k in range(n_k):
            if not tube_ok[c, k]:
                continue
            # gather the tube's valid keyframe boxes
            keyframes = []
            for ti, t in enumerate(eval_ts):
                j = det_idx[c, k, ti]
                if in_tube[c, ti, j]:
                    keyframes.append((t, boxes[c, ti, j],
                                      float(rescored[c, ti, j])))
            if not keyframes:
                continue
            for (t0, b0, s0), (t1, b1, s1) in zip(keyframes, keyframes[1:]):
                for t in range(t0, t1):
                    a = (t - t0) / max(t1 - t0, 1)
                    out[t].append((c, (1 - a) * s0 + a * s1,
                                   (1 - a) * b0 + a * b1))
            t_last, b_last, s_last = keyframes[-1]
            for t in range(t_last, min(t_last + 1, t_total)):
                out[t].append((c, s_last, b_last))
    return out


def link_snippet(cfg: Config, boxes, scores, tracked, valid):
    """Tube linking + rescoring for one snippet's stacked detections."""
    tubes = link_all_classes(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(tracked),
        jnp.asarray(valid), max_tubes=cfg.eval.max_tubes_per_class,
        link_iou_weight=cfg.eval.link_iou_weight)
    return np.asarray(tubes.rescored), tubes
