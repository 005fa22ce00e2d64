"""Region Proposal Network: head + static-shape proposal layer.

TPU-native equivalent of the reference RPN
(ref: lib/model/rpn/rpn.py + lib/model/rpn/proposal_layer.py). The proposal
layer is re-derived for XLA: instead of dynamic filtering it uses fixed
pre/post-NMS budgets (top-k padding) and a validity mask threaded to every
consumer — the structural pattern the whole framework rests on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dtt.core import boxes as box_ops
from dtt.core.config import RPNConfig
from dtt.ops.nms import nms_padded_fast


class RPNHead(nn.Module):
    """3x3 conv + twin 1x1 heads (ref rpn.py: RPN_Conv/RPN_cls_score/RPN_bbox_pred).

    Outputs per-cell logits laid out (..., A, 2) for cls and (..., A*4) for
    box deltas.
    """

    num_anchors: int
    channels: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        init = nn.initializers.normal(0.01)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(feat)
        x = nn.relu(x)
        cls = nn.Conv(self.num_anchors * 2, (1, 1), kernel_init=init,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="cls_score")(x)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="bbox_pred")(x)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)


class Proposals(NamedTuple):
    rois: jnp.ndarray    # (K_post, 4)
    scores: jnp.ndarray  # (K_post,)
    valid: jnp.ndarray   # (K_post,) bool


def proposal_layer(rpn_cls: jnp.ndarray,     # (H, W, 2A)
                   rpn_bbox: jnp.ndarray,    # (H, W, 4A)
                   anchors: jnp.ndarray,     # (H*W*A, 4) trace-time const
                   im_height, im_width, im_scale,
                   cfg: RPNConfig,
                   train: bool) -> Proposals:
    """Decode → clip → min-size filter → top-K → NMS → top-N (all static).

    ref proposal_layer.py semantics with fixed K (pre_nms_top_n) and fixed N
    (post_nms_top_n); invalid slots are masked, never dropped.
    """
    h, w, _ = rpn_cls.shape
    a = anchors.shape[0] // (h * w)
    if train:
        # Reference parity: the proposal layer is DETACHED from the graph
        # (the lineage's proposal_layer.py runs on .data / numpy; proposals
        # carry no gradient). Without this, the encode(rois, gt) regression
        # TARGETS backprop into the RPN bbox head with the wrong sign
        # (moving targets toward predictions), and the NMS select loop sits
        # on the differentiation path for no reason.
        rpn_cls = jax.lax.stop_gradient(rpn_cls)
        rpn_bbox = jax.lax.stop_gradient(rpn_bbox)
    logits = rpn_cls.reshape(-1, 2)                       # (HWA, 2)
    fg_scores = jax.nn.softmax(logits, axis=-1)[:, 1]
    deltas = rpn_bbox.reshape(-1, 4)

    proposals = box_ops.decode_boxes(anchors, deltas)
    proposals = box_ops.clip_boxes(proposals, im_height, im_width)

    ws = proposals[:, 2] - proposals[:, 0] + 1.0
    hs = proposals[:, 3] - proposals[:, 1] + 1.0
    min_size = cfg.min_size * im_scale
    keep = (ws >= min_size) & (hs >= min_size)
    scores = jnp.where(keep, fg_scores, -1.0)

    k_pre = min(cfg.pre_nms_top_n_train if train else cfg.pre_nms_top_n_test,
                scores.shape[0])
    k_post = cfg.post_nms_top_n_train if train else cfg.post_nms_top_n_test

    top_scores, top_idx = jax.lax.top_k(scores, k_pre)
    top_boxes = proposals[top_idx]
    # multi-select while-loop NMS in BOTH modes (identical decisions to the
    # sequential greedy form, ~select_block x fewer serial steps). Train is
    # eligible because the layer is detached above: the loop carries no
    # cotangents, so reverse-mode AD treats it as primal-only.
    keep_idx, keep_valid = nms_padded_fast(
        top_boxes, top_scores, cfg.nms_thresh, k_post,
        valid=top_scores >= 0.0, score_threshold=-0.5,
        select_block=cfg.nms_select_block)
    rois = top_boxes[keep_idx] * keep_valid[:, None]
    out_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)
    return Proposals(rois=rois, scores=out_scores, valid=keep_valid)


def rpn_loss(rpn_cls: jnp.ndarray,          # (H, W, 2A)
             rpn_bbox: jnp.ndarray,         # (H, W, 4A)
             labels: jnp.ndarray,           # (HWA,) in {-1, 0, 1}
             bbox_targets: jnp.ndarray,     # (HWA, 4)
             bbox_weights: jnp.ndarray,     # (HWA,) outside weights
             sigma: float = 3.0,
             inside_weight: float = 1.0):
    """RPN losses over the anchor map with ignore masking (ref rpn.py).

    `inside_weight` is the reference's RPN_BBOX_INSIDE_WEIGHTS (uniform
    scalar form): it scales the regression DIFF before the smooth-L1 hinge,
    exactly like _smooth_l1_loss(in_w * (pred - target))."""
    logits = rpn_cls.reshape(-1, 2)
    use = labels >= 0
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), 2)
    ce = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    n_cls = jnp.maximum(jnp.sum(use), 1.0)
    cls_loss = jnp.sum(jnp.where(use, ce, 0.0)) / n_cls

    pred = rpn_bbox.reshape(-1, 4)
    box_loss = jnp.sum(smooth_l1(inside_weight * pred,
                                 inside_weight * bbox_targets, sigma)
                       * bbox_weights[:, None])
    return cls_loss, box_loss


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, sigma: float = 1.0
              ) -> jnp.ndarray:
    """Elementwise smooth-L1 with the Fast R-CNN sigma convention
    (ref: lib/model/utils/net_utils.py _smooth_l1_loss)."""
    s2 = sigma * sigma
    diff = pred - target
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0 / s2, 0.5 * s2 * diff * diff, ad - 0.5 / s2)
