"""Viterbi tube linking + rescoring over padded per-frame detections.

TPU-native equivalent of the reference's host-side tube linking
(ref: test-path post-processing; D&T paper §3.4). Per class, detections of a
snippet are linked across time by a dynamic program over the link score

  s(d_t, d_{t+1}) = p(d_t) + p(d_{t+1}) + w * IoU(track(d_t), d_{t+1})

where track(d_t) is d_t's box displaced by the tracking regression. The
highest-scoring path (Viterbi over a lax.scan) becomes a tube; its
detections are rescored (boosted to the mean of the top half of the tube's
scores — the paper's tube-level boost), removed, and the program repeats up
to `max_tubes` times. Everything is static-shape: detections are padded to
N per frame with validity masks, tubes to `max_tubes`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dtt.core import boxes as box_ops

_NEG = -1e9


class Tubes(NamedTuple):
    det_idx: jnp.ndarray      # (max_tubes, T) detection index per frame
    tube_valid: jnp.ndarray   # (max_tubes,) tube is real
    tube_score: jnp.ndarray   # (max_tubes,) mean link-path score
    rescored: jnp.ndarray     # (T, N) rescored detection scores
    det_in_tube: jnp.ndarray  # (T, N) bool: detection was claimed by a tube


def _viterbi_once(boxes, scores, tracked, valid, virtual, link_iou_weight):
    """Best single tube: returns (path (T,), path_score_mean).

    `virtual` marks skip slots (score 0, zero box): frames with no available
    detection expose one so a tube can pass through instead of being voided
    by a single empty frame (advisor finding: one empty keyframe previously
    killed every tube of the class in the snippet).
    """
    t, n = scores.shape
    p = jnp.where(valid, scores, jnp.where(virtual, 0.0, _NEG))
    eff_valid = valid | virtual

    def step(carry, xs):
        v_prev = carry                      # (N,) best path value ending at i
        p_prev, p_cur, trk_prev, box_cur, valid_cur = xs
        iou = box_ops.pairwise_iou(trk_prev, box_cur)      # (N, N)
        link = (p_prev[:, None] + p_cur[None, :]
                + link_iou_weight * iou)                    # (N, N)
        cand = v_prev[:, None] + jnp.where(valid_cur[None, :], link, _NEG)
        v = jnp.max(cand, axis=0)
        back = jnp.argmax(cand, axis=0)
        return v, (v, back)

    v0 = jnp.where(eff_valid[0], 0.0, _NEG)
    xs = (p[:-1], p[1:], tracked[:-1], boxes[1:], eff_valid[1:])
    v_last, (vs, backs) = jax.lax.scan(step, v0, xs)

    end = jnp.argmax(v_last)
    path_score = v_last[end]

    def backtrack(carry, back):
        j = carry
        i = back[j]
        return i, j

    first, rest = jax.lax.scan(backtrack, end, backs, reverse=True)
    path = jnp.concatenate([first[None], rest])            # (T,)
    # mean link score per transition
    mean_score = path_score / jnp.maximum(t - 1, 1)
    return path, mean_score


@functools.partial(jax.jit, static_argnames=("max_tubes", "score_boost"))
def link_tubes(boxes: jnp.ndarray,    # (T, N, 4)
               scores: jnp.ndarray,   # (T, N)
               tracked: jnp.ndarray,  # (T, N, 4) box propagated t -> t+1
               valid: jnp.ndarray,    # (T, N)
               max_tubes: int = 20,
               link_iou_weight: float = 1.0,
               score_boost: str = "mean_top_half") -> Tubes:
    """Greedy repeated-Viterbi tube extraction for one class.

    `score_boost` selects the tube statistic detections are boosted to
    (cfg.eval.tube_score_boost): "mean_top_half" (D&T paper §3.4),
    "mean", or "max" over the tube's claimed detection scores.
    """
    if score_boost not in ("mean_top_half", "mean", "max"):
        raise ValueError(f"unknown tube_score_boost {score_boost!r}")
    t, n = scores.shape

    def body(carry, _):
        cur_valid, rescored, in_tube = carry
        any_left = jnp.any(cur_valid)
        # frames with no available detection expose slot 0 as a virtual
        # skip (score 0, zero box) so tubes can bridge them; virtual slots
        # are never claimed or rescored (onehot is masked by cur_valid)
        frame_empty = ~jnp.any(cur_valid, axis=1)                    # (T,)
        virtual = frame_empty[:, None] & (jnp.arange(n) == 0)[None, :]
        path, mean_score = _viterbi_once(boxes, scores, tracked, cur_valid,
                                         virtual, link_iou_weight)
        tube_ok = any_left & (mean_score > _NEG / 2)

        onehot = jax.nn.one_hot(path, n, dtype=bool) & cur_valid  # (T, N)
        flat = jnp.sort(jnp.where(onehot, scores, -jnp.inf).max(axis=1))[::-1]
        count = jnp.sum(onehot.any(axis=1))
        finite = jnp.where(jnp.isfinite(flat), flat, 0.0)
        if score_boost == "mean_top_half":
            k_stat = jnp.maximum((count + 1) // 2, 1)
        else:  # "mean": all claimed scores; "max": k=1 of the sorted scores
            k_stat = jnp.maximum(count, 1) if score_boost == "mean" else 1
        top_mask = jnp.arange(t) < k_stat
        boost = jnp.sum(jnp.where(top_mask, finite, 0.0)) / k_stat

        new_rescored = jnp.where(onehot & tube_ok,
                                 jnp.maximum(rescored, boost), rescored)
        new_valid = cur_valid & ~(onehot & tube_ok)
        new_in_tube = in_tube | (onehot & tube_ok)
        out = (path, tube_ok, mean_score)
        return (new_valid, new_rescored, new_in_tube), out

    init = (valid, scores, jnp.zeros_like(valid))
    (final_valid, rescored, in_tube), (paths, oks, mscores) = jax.lax.scan(
        body, init, None, length=max_tubes)
    return Tubes(det_idx=paths, tube_valid=oks, tube_score=mscores,
                 rescored=rescored, det_in_tube=in_tube)


def link_all_classes(boxes, scores, tracked, valid, max_tubes: int = 20,
                     link_iou_weight: float = 1.0,
                     score_boost: str = "mean_top_half") -> Tubes:
    """vmap over the leading class axis: (C, T, N, ...) inputs."""
    fn = lambda b, s, tr, v: link_tubes(b, s, tr, v, max_tubes,
                                        link_iou_weight, score_boost)
    return jax.vmap(fn)(boxes, scores, tracked, valid)
