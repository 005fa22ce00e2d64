"""Static-shape target assignment for RPN anchors and RoIs.

TPU-native re-derivations of the reference's numpy target layers
(ref: lib/model/rpn/anchor_target_layer.py,
lib/model/rpn/proposal_target_layer_cascade.py). The reference round-trips
device→host→device every step and produces dynamic-size samples; here the
assignment runs on-device inside jit with fixed sample budgets, using
randomized-priority top-k for subsampling and validity masks instead of
dynamic shapes.

D&T extension: `proposal_target` also emits *tracking* regression targets —
the encoded displacement from an RoI in frame t to the same track's ground
truth box in frame t+τ (D&T paper §3.3). Ground-truth tensors for the two
frames are track-aligned by the data layer: slot g holds the same trackid in
both frames, with a per-frame validity bit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dtt.core import boxes as box_ops
from dtt.core.config import RoIConfig, RPNConfig, TrackConfig


def roi_norm_params(cfg: RoIConfig):
    """(means, stds) for RCNN bbox-target normalization, honoring
    cfg.bbox_normalize_targets_precomputed (ref TRAIN.BBOX_NORMALIZE_
    TARGETS_PRECOMPUTED): when off, targets are raw deltas and decode
    must not denormalize — both sides use this one helper."""
    if cfg.bbox_normalize_targets_precomputed:
        return (jnp.asarray(cfg.bbox_normalize_means),
                jnp.asarray(cfg.bbox_normalize_stds))
    return jnp.zeros(4), jnp.ones(4)

_NEG = -1e9


def _capped_random_mask(eligible: jnp.ndarray, cap: int, key) -> jnp.ndarray:
    """Boolean mask selecting at most `cap` of the eligible entries, uniformly."""
    u = jax.random.uniform(key, eligible.shape)
    score = jnp.where(eligible, u, _NEG)
    _, idx = jax.lax.top_k(score, min(cap, eligible.shape[0]))
    mask = jnp.zeros_like(eligible).at[idx].set(True)
    return mask & eligible


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (A,) in {-1 ignore, 0 neg, 1 pos}
    bbox_targets: jnp.ndarray    # (A, 4) unnormalized encode() deltas
    bbox_weights: jnp.ndarray    # (A,) loss weight rows (pos / num_examples)


def anchor_target(anchors: jnp.ndarray,      # (A, 4) trace-time consts
                  gt_boxes: jnp.ndarray,     # (G, 4)
                  gt_valid: jnp.ndarray,     # (G,) bool
                  im_height, im_width,
                  key,
                  cfg: RPNConfig) -> AnchorTargets:
    a = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_width) & (anchors[:, 3] < im_height))

    iou = box_ops.pairwise_iou(anchors, gt_boxes)          # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    # per-gt best anchors (ties included), restricted to inside anchors
    iou_in = jnp.where(inside[:, None], iou, -1.0)
    gt_best = jnp.max(iou_in, axis=0)                      # (G,)
    is_best = jnp.any((iou_in == gt_best[None, :]) & gt_valid[None, :]
                      & (gt_best[None, :] > 0), axis=1)

    neg = max_iou < cfg.negative_overlap
    pos = is_best | (max_iou >= cfg.positive_overlap)
    if cfg.clobber_positives:
        pos = pos & ~neg
    else:
        neg = neg & ~pos
    pos = pos & inside
    neg = neg & inside

    k_pos, k_neg = jax.random.split(key)
    max_pos = int(cfg.fg_fraction * cfg.batch_size)
    pos_sel = _capped_random_mask(pos, max_pos, k_pos)
    num_pos = jnp.sum(pos_sel)

    # negatives fill the remaining budget; top-k is static at batch_size and
    # the dynamic budget is enforced by rank masking
    u = jax.random.uniform(k_neg, (a,))
    neg_score = jnp.where(neg, u, _NEG)
    k_budget = min(cfg.batch_size, a)  # tiny grids can have < batch_size anchors
    _, neg_idx = jax.lax.top_k(neg_score, k_budget)
    neg_rank_keep = jnp.arange(k_budget) < (cfg.batch_size - num_pos)
    neg_sel = jnp.zeros((a,), bool).at[neg_idx].set(neg_rank_keep) & neg

    labels = jnp.where(pos_sel, 1, jnp.where(neg_sel, 0, -1))

    matched = gt_boxes[argmax_gt]
    bbox_targets = jnp.where(pos_sel[:, None],
                             box_ops.encode_boxes(anchors, matched), 0.0)
    num_examples = jnp.maximum(num_pos + jnp.sum(neg_sel), 1.0)
    if cfg.positive_weight < 0:
        w = pos_sel.astype(jnp.float32) / num_examples
    else:
        w = pos_sel.astype(jnp.float32) * (cfg.positive_weight / jnp.maximum(num_pos, 1.0))
    return AnchorTargets(labels=labels, bbox_targets=bbox_targets, bbox_weights=w)


class RoITargets(NamedTuple):
    rois: jnp.ndarray            # (S, 4) sampled boxes (frame t)
    labels: jnp.ndarray          # (S,) class ids, 0 = background
    valid: jnp.ndarray           # (S,) slot holds a real roi
    bbox_targets: jnp.ndarray    # (S, 4) normalized deltas to matched gt (t)
    bbox_weights: jnp.ndarray    # (S,) 1.0 for fg
    track_targets: jnp.ndarray   # (S, 4) normalized deltas roi(t) -> gt(t+τ)
    track_weights: jnp.ndarray   # (S,) 1.0 where fg & track visible at t+τ


def proposal_target(rois: jnp.ndarray,        # (R, 4) RPN proposals, frame t
                    roi_valid: jnp.ndarray,   # (R,)
                    gt_boxes: jnp.ndarray,    # (G, 4) frame t
                    gt_labels: jnp.ndarray,   # (G,) int class ids (>=1)
                    gt_valid: jnp.ndarray,    # (G,)
                    gt_boxes_tau: jnp.ndarray,   # (G, 4) frame t+τ, track-aligned
                    gt_valid_tau: jnp.ndarray,   # (G,)
                    key,
                    cfg: RoIConfig,
                    track_cfg: TrackConfig | None = None) -> RoITargets:
    """Sample a fixed fg/bg RoI batch + regression/tracking targets.

    Mirrors proposal_target_layer_cascade.py: gt boxes are appended to the
    proposal set, fg/bg are split by IoU thresholds, and a fixed budget
    (batch_size, fg_fraction) is sampled. All selection is masked top-k.
    """
    # append gt boxes to the candidate set (the reference does this so every
    # gt has at least one perfectly-matching roi)
    all_rois = jnp.concatenate([rois, gt_boxes], axis=0)
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)
    r = all_rois.shape[0]

    iou = box_ops.pairwise_iou(all_rois, gt_boxes)
    iou = jnp.where((gt_valid[None, :]) & (all_valid[:, None]), iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    fg = all_valid & (max_iou >= cfg.fg_thresh)
    bg = all_valid & (max_iou < cfg.bg_thresh_hi) & (max_iou >= cfg.bg_thresh_lo)

    s = cfg.batch_size
    fg_budget = int(round(cfg.fg_fraction * s))
    k1, k2 = jax.random.split(key)
    fg_sel = _capped_random_mask(fg, fg_budget, k1)

    # final slots: selected fg first, then random bg. Slots that end up
    # holding anything else (e.g. unsampled fg beyond the budget when bg
    # candidates run short) are marked INVALID rather than mislabeled as
    # background — the reference discards excess fg, never relabels it.
    u = jax.random.uniform(k2, (r,))
    priority = jnp.where(fg_sel, 3.0 + u,
                         jnp.where(bg, 2.0 + u, u - 10.0))
    _, slot_idx = jax.lax.top_k(priority, s)

    sel_rois = all_rois[slot_idx]
    sel_fg = fg_sel[slot_idx]
    sel_valid = sel_fg | bg[slot_idx]
    sel_arg = argmax_gt[slot_idx]
    labels = jnp.where(sel_fg, gt_labels[sel_arg], 0)
    labels = jnp.where(sel_valid, labels, 0)

    matched = gt_boxes[sel_arg]
    means, stds = roi_norm_params(cfg)
    bbox_targets = jnp.where(
        sel_fg[:, None],
        box_ops.encode_boxes(sel_rois, matched, means, stds), 0.0)
    bbox_weights = sel_fg.astype(jnp.float32)

    if track_cfg is not None:
        t_means = jnp.asarray(track_cfg.bbox_normalize_means)
        t_stds = jnp.asarray(track_cfg.bbox_normalize_stds)
        trk_ok = sel_fg & gt_valid_tau[sel_arg]
        track_targets = jnp.where(
            trk_ok[:, None],
            box_ops.encode_boxes(sel_rois, gt_boxes_tau[sel_arg], t_means, t_stds),
            0.0)
        track_weights = trk_ok.astype(jnp.float32)
    else:
        track_targets = jnp.zeros_like(bbox_targets)
        track_weights = jnp.zeros_like(bbox_weights)

    return RoITargets(rois=sel_rois, labels=labels, valid=sel_valid,
                      bbox_targets=bbox_targets, bbox_weights=bbox_weights,
                      track_targets=track_targets, track_weights=track_weights)


def label_all_rois(rois: jnp.ndarray, roi_valid: jnp.ndarray,
                   gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   gt_boxes_tau: jnp.ndarray, gt_valid_tau: jnp.ndarray,
                   cfg: RoIConfig,
                   track_cfg: TrackConfig | None = None) -> RoITargets:
    """OHEM path: label EVERY roi (no sampling); the loss ranks hardness.

    R-FCN trains with Online Hard Example Mining by forwarding all proposals
    and keeping the top-B highest-loss RoIs; this provides the per-roi labels
    and targets for that (D&T/R-FCN practice; ref model code + paper §3.1).
    """
    all_rois = jnp.concatenate([rois, gt_boxes], axis=0)
    all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    iou = box_ops.pairwise_iou(all_rois, gt_boxes)
    iou = jnp.where((gt_valid[None, :]) & (all_valid[:, None]), iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    fg = all_valid & (max_iou >= cfg.fg_thresh)
    # for OHEM every non-fg valid roi is background (no bg_lo band)
    labels = jnp.where(fg, gt_labels[argmax_gt], 0)

    matched = gt_boxes[argmax_gt]
    means, stds = roi_norm_params(cfg)
    bbox_targets = jnp.where(
        fg[:, None], box_ops.encode_boxes(all_rois, matched, means, stds), 0.0)

    if track_cfg is not None:
        t_means = jnp.asarray(track_cfg.bbox_normalize_means)
        t_stds = jnp.asarray(track_cfg.bbox_normalize_stds)
        trk_ok = fg & gt_valid_tau[argmax_gt]
        track_targets = jnp.where(
            trk_ok[:, None],
            box_ops.encode_boxes(all_rois, gt_boxes_tau[argmax_gt], t_means, t_stds),
            0.0)
        track_weights = trk_ok.astype(jnp.float32)
    else:
        track_targets = jnp.zeros_like(bbox_targets)
        track_weights = jnp.zeros(all_rois.shape[0], jnp.float32)

    return RoITargets(rois=all_rois, labels=labels, valid=all_valid,
                      bbox_targets=bbox_targets,
                      bbox_weights=fg.astype(jnp.float32),
                      track_targets=track_targets, track_weights=track_weights)
