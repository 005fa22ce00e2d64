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


def evaluate_snippet(cfg: Config, pair_step, params, frames: np.ndarray):
    """Slide τ=1 pairs over a snippet; return stacked per-frame detections.

    frames: (T, H, W, 3) normalized. Frame T-1 pairs with itself (identity),
    matching the reference's handling of the last frame.
    Returns numpy (C-1, T, M, 4), (C-1, T, M), (C-1, T, M), (C-1, T, M, 4).
    """
    t_len = frames.shape[0]
    boxes, scores, valid, tracked = [], [], [], []
    for t in range(t_len):
        t2 = min(t + 1, t_len - 1)
        pair = jnp.asarray(np.stack([frames[t], frames[t2]])[None])
        out = pair_step(params, pair)
        boxes.append(np.asarray(out.boxes))
        scores.append(np.asarray(out.scores))
        valid.append(np.asarray(out.valid))
        tracked.append(np.asarray(out.tracked))
    stack = lambda xs: np.stack(xs, axis=1)  # (C-1, T, ...)
    return stack(boxes), stack(scores), stack(valid), stack(tracked)


def link_snippet(cfg: Config, boxes, scores, tracked, valid):
    """Tube linking + rescoring for one snippet's stacked detections."""
    tubes = link_all_classes(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(tracked),
        jnp.asarray(valid), max_tubes=cfg.eval.max_tubes_per_class,
        link_iou_weight=cfg.eval.link_iou_weight)
    return np.asarray(tubes.rescored), tubes
