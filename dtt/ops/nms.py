"""Static-shape greedy NMS for XLA.

TPU-native replacement for the reference's CUDA bitmask NMS
(ref: lib/model/nms/src/nms_cuda_kernel.cu + nms_wrapper.py). Instead of the
64-bit block bitmask algorithm (a GPU-warp trick), we run the mathematically
identical greedy selection as a fixed-trip-count `lax.fori_loop`: each
iteration selects the current argmax score and masks out everything with
IoU > threshold. `max_outputs` iterations × O(K) vector work — fully
jit-compatible, no dynamic shapes, no host round-trip.

Semantics match greedy descending-score NMS exactly: a box is suppressed iff
IoU with an already-kept higher-scoring box is strictly greater than
`iou_threshold` (the reference keeps `ovr <= thresh`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dtt.core import boxes as box_ops

_NEG = -1e10


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms_padded(boxes: jnp.ndarray,
               scores: jnp.ndarray,
               iou_threshold,
               max_outputs: int,
               valid: jnp.ndarray | None = None,
               score_threshold=_NEG / 2):
    """Greedy NMS over K padded boxes.

    Args:
      boxes: (K, 4) in (x1, y1, x2, y2).
      scores: (K,).
      iou_threshold: scalar; suppress iff IoU > threshold.
      max_outputs: static number of kept slots (padded).
      valid: optional (K,) bool mask of real (non-padding) inputs.
      score_threshold: selections with score <= this are marked invalid.

    Returns:
      keep_idx: (max_outputs,) int32 indices into the input (0 where invalid).
      keep_valid: (max_outputs,) bool.
    """
    k = boxes.shape[0]
    s = scores.astype(jnp.float32)
    if valid is not None:
        s = jnp.where(valid, s, _NEG)

    def body(i, carry):
        s, idx, val = carry
        j = jnp.argmax(s)
        best = s[j]
        ok = best > score_threshold
        iou = box_ops.elementwise_iou(boxes[j], boxes)
        suppress = iou > iou_threshold
        # always retire the selected element itself so the loop progresses
        new_s = jnp.where(suppress, _NEG, s).at[j].set(_NEG)
        s = jnp.where(ok, new_s, s)
        idx = idx.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        val = val.at[i].set(ok)
        return s, idx, val

    idx0 = jnp.zeros((max_outputs,), jnp.int32)
    val0 = jnp.zeros((max_outputs,), bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_outputs, body, (s, idx0, val0))
    return keep_idx, keep_valid


@functools.partial(jax.jit, static_argnames=("max_outputs", "select_block"))
def nms_padded_fast(boxes: jnp.ndarray,
                    scores: jnp.ndarray,
                    iou_threshold,
                    max_outputs: int,
                    valid: jnp.ndarray | None = None,
                    score_threshold=_NEG / 2,
                    select_block: int = 16):
    """Greedy NMS with multi-selection: EXACT nms_padded semantics, fewer
    serial steps (inference path).

    Each while-loop iteration takes the top `select_block` remaining
    candidates, resolves their mutual suppression with an unrolled
    mini-greedy over the tiny B×B IoU matrix (processing in descending
    score order — identical decisions to one-at-a-time greedy), commits the
    survivors, and masks everything they suppress. The loop runs until the
    output budget fills or scores are exhausted — typically ~B× fewer
    dependent steps than the one-per-iteration fori_loop form.

    NOT reverse-differentiable (lax.while_loop): use in inference paths
    only; the train-time proposal layer keeps the fori_loop form.
    """
    kcount = boxes.shape[0]
    m = min(select_block, max_outputs, kcount)
    s0 = scores.astype(jnp.float32)
    if valid is not None:
        s0 = jnp.where(valid, s0, _NEG)

    def cond(carry):
        s, idx, val, count = carry
        return (count < max_outputs) & (jnp.max(s) > score_threshold)

    def body(carry):
        s, idx, val, count = carry
        top_s, top_i = jax.lax.top_k(s, m)                  # descending
        kb = boxes[top_i]                                   # (M, 4)
        iou_m = box_ops.pairwise_iou(kb, kb)                # (M, M)
        ok = top_s > score_threshold
        keep = jnp.zeros((m,), bool)
        for j in range(m):                                  # unrolled: tiny
            # j == 0 gets a jnp scalar, not Python False: `~False` is a
            # Python-3.16 DeprecationWarning (int bitwise-not on bool)
            sup = (jnp.any(keep[:j] & (iou_m[:j, j] > iou_threshold))
                   if j else jnp.zeros((), bool))
            keep = keep.at[j].set(ok[j] & ~sup)
        # budget: only the first (max_outputs - count) survivors fit
        pos = count + jnp.cumsum(keep) - keep.astype(jnp.int32)
        keep = keep & (pos < max_outputs)
        slot = jnp.where(keep, pos, max_outputs)            # OOB rows dropped
        idx = idx.at[slot].set(top_i.astype(jnp.int32), mode="drop")
        val = val.at[slot].set(True, mode="drop")
        # suppress everything the committed boxes overlap (incl. themselves)
        iou_all = box_ops.pairwise_iou(kb, boxes)           # (M, K)
        sup_all = jnp.any(keep[:, None] & (iou_all > iou_threshold), axis=0)
        s = jnp.where(sup_all, _NEG, s)
        # retire committed boxes even at iou_threshold >= 1 (self-IoU == 1)
        s = s.at[top_i].set(jnp.where(keep, _NEG, s[top_i]))
        return s, idx, val, count + jnp.sum(keep)

    init = (s0, jnp.zeros((max_outputs,), jnp.int32),
            jnp.zeros((max_outputs,), bool), jnp.int32(0))
    _, keep_idx, keep_valid, _ = jax.lax.while_loop(cond, body, init)
    return keep_idx, keep_valid


def nms_gather(boxes, scores, iou_threshold, max_outputs, valid=None,
               score_threshold=_NEG / 2):
    """NMS returning gathered (boxes, scores, valid) instead of indices."""
    idx, keep_valid = nms_padded(boxes, scores, iou_threshold, max_outputs,
                                 valid, score_threshold)
    kept_boxes = boxes[idx] * keep_valid[:, None].astype(boxes.dtype)
    kept_scores = jnp.where(keep_valid, scores[idx], 0.0)
    return kept_boxes, kept_scores, keep_valid


def multiclass_nms(boxes: jnp.ndarray,
                   scores: jnp.ndarray,
                   iou_threshold,
                   max_per_class: int,
                   score_threshold=0.0,
                   valid: jnp.ndarray | None = None,
                   per_class_boxes: bool = False,
                   select_block: int = 16):
    """Per-class NMS for the eval path (ref: test_net.py per-class loop).

    Args:
      boxes: (K, 4) shared boxes, or (K, C, 4) per-class boxes if
        `per_class_boxes`.
      scores: (K, C) class scores (background already dropped by caller).
      max_per_class: static per-class detection budget.

    Returns:
      det_boxes: (C, max_per_class, 4)
      det_scores: (C, max_per_class)
      det_valid: (C, max_per_class) bool
      det_idx: (C, max_per_class) int32 indices into the K input rois
    """
    num_classes = scores.shape[1]
    scores_t = scores.T  # (C, K)
    if per_class_boxes:
        boxes_t = jnp.moveaxis(boxes, 1, 0)  # (C, K, 4)
    else:
        boxes_t = jnp.broadcast_to(boxes[None], (num_classes, *boxes.shape))
    valid_t = None if valid is None else jnp.broadcast_to(valid[None], scores_t.shape)

    def one_class(b, s, v):
        # eval-only path: the multi-select while-loop NMS (exact greedy)
        idx, keep_valid = nms_padded_fast(b, s, iou_threshold, max_per_class,
                                          v, score_threshold,
                                          select_block=select_block)
        kept_boxes = b[idx] * keep_valid[:, None].astype(b.dtype)
        kept_scores = jnp.where(keep_valid, s[idx], 0.0)
        return kept_boxes, kept_scores, keep_valid, idx

    if valid is None:
        return jax.vmap(lambda b, s: one_class(b, s, None))(boxes_t, scores_t)
    return jax.vmap(one_class)(boxes_t, scores_t, valid_t)
