"""D&T training losses: RPN + R-FCN (with OHEM) + tracking.

Loss structure follows the reference training path (ref: trainval_net.py loss
sum of rpn_cls/rpn_box/RCNN_cls/RCNN_box(+tracking); OHEM per R-FCN practice,
D&T paper §3.1/3.4): detection losses are computed on BOTH frames of the
pair, the tracking smooth-L1 on frame-t RoIs against the matched track's
frame-τ ground truth.

Everything here is a pure function of (params-derived tensors, batch,
rng key) — vmapped over the per-device batch and jit-compiled inside the
train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dtt.core.config import Config
from dtt.models import dnt as dnt_lib
from dtt.models import rpn as rpn_lib
from dtt.models import targets as tgt_lib
from dtt.models.dnt import DnT, FrameFeats, rfcn_head, track_rois
from dtt.models.rpn import proposal_layer, rpn_loss, smooth_l1
from dtt.ops.nms import nms_padded


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    rpn_cls: jnp.ndarray
    rpn_box: jnp.ndarray
    rfcn_cls: jnp.ndarray
    rfcn_box: jnp.ndarray
    track: jnp.ndarray
    num_fg: jnp.ndarray
    # mean CE over FOREGROUND RoIs only. rfcn_cls averages fg+bg together,
    # so confident-background predictions can mask a chance-level
    # classifier (observed: rfcn_cls 0.5 while fg CE sat at log C); this
    # metric makes classification progress directly visible in the logs.
    fg_ce: jnp.ndarray


def _rfcn_losses(cfg: Config, cls_score, bbox_pred, tgts: tgt_lib.RoITargets):
    """Per-RoI cls CE + box smooth-L1, OHEM-ranked if configured.

    Returns (cls_loss, box_loss, fg_ce) — fg_ce is the diagnostic mean CE
    over foreground RoIs (see LossBreakdown.fg_ce)."""
    mcfg = cfg.model
    labels = tgts.labels
    logp = jax.nn.log_softmax(cls_score, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    fg_mask = tgts.valid & (labels > 0)
    fg_ce = (jnp.sum(jnp.where(fg_mask, ce, 0.0))
             / jnp.maximum(jnp.sum(fg_mask), 1.0))

    if mcfg.roi.class_agnostic:
        pred = bbox_pred[:, 4:8]       # fg half of the (bg, fg) pair
    else:
        idx = (labels[:, None] * 4 + jnp.arange(4)[None, :])
        pred = jnp.take_along_axis(bbox_pred, idx, axis=1)
    box = jnp.sum(smooth_l1(pred, tgts.bbox_targets, sigma=1.0), axis=-1)
    box = box * tgts.bbox_weights

    per_roi = jnp.where(tgts.valid, ce + box, 0.0)
    if cfg.train.ohem:
        k = min(cfg.train.ohem_top_k, per_roi.shape[0])
        if cfg.train.ohem_nms_thresh > 0:
            # R-FCN OHEM practice: NMS over loss-ranked RoIs first, so a
            # cluster of near-duplicate proposals on one hard object cannot
            # crowd out other hard examples (ref: R-FCN paper §3 "OHEM" —
            # NMS with 0.7 on the loss-sorted RoIs before selecting top-B)
            keep_idx, keep_valid = nms_padded(
                tgts.rois, per_roi, cfg.train.ohem_nms_thresh, k,
                valid=tgts.valid, score_threshold=-0.5)
            sel = (jnp.zeros_like(tgts.valid).at[keep_idx]
                   .max(keep_valid)) & tgts.valid
        else:
            vals, idx = jax.lax.top_k(
                jnp.where(tgts.valid, per_roi, -jnp.inf), k)
            sel = jnp.zeros_like(tgts.valid).at[idx].set(True) & tgts.valid
        sel = jax.lax.stop_gradient(sel)
        denom = jnp.maximum(jnp.sum(sel), 1.0)
        cls_loss = jnp.sum(jnp.where(sel, ce, 0.0)) / denom
        box_loss = jnp.sum(jnp.where(sel, box, 0.0)) / denom
    else:
        denom = jnp.maximum(jnp.sum(tgts.valid), 1.0)
        cls_loss = jnp.sum(jnp.where(tgts.valid, ce, 0.0)) / denom
        box_loss = jnp.sum(box) / denom
    return cls_loss, box_loss, fg_ce


def pair_loss(cfg: Config, model: DnT, params, anchors: jnp.ndarray,
              images: jnp.ndarray,       # (2, H, W, 3)
              gt_boxes: jnp.ndarray,     # (2, G, 4) track-aligned
              gt_labels: jnp.ndarray,    # (G,)
              gt_valid: jnp.ndarray,     # (2, G)
              im_scale, im_size, key) -> LossBreakdown:
    """Full D&T training loss for one frame pair.

    im_size is the TRUE (h, w) extent of the image on the padded canvas:
    anchors beyond it are padding, not background, and must not be sampled
    as negatives (the reference trains on unpadded images).
    """
    mcfg = cfg.model
    h_img = im_size[0]
    w_img = im_size[1]
    images = dnt_lib.normalize_device_images(images, im_size,
                                             cfg.input.pixel_means)
    f_t, f_tau, track_maps = model.apply(params, images[None])
    frames = [f_t, f_tau]

    keys = jax.random.split(key, 4)
    spatial_scale = 1.0 / mcfg.anchors.feat_stride

    rpn_cls_total = 0.0
    rpn_box_total = 0.0
    rfcn_cls_total = 0.0
    rfcn_box_total = 0.0
    track_loss = jnp.float32(0.0)
    num_fg = jnp.float32(0.0)
    fg_ce_total = 0.0

    for f in range(2):
        feats: FrameFeats = frames[f]
        at = tgt_lib.anchor_target(anchors, gt_boxes[f], gt_valid[f],
                                   h_img, w_img, keys[2 * f], mcfg.rpn)
        l_cls, l_box = rpn_loss(feats.rpn_cls[0], feats.rpn_bbox[0],
                                at.labels, at.bbox_targets, at.bbox_weights,
                                sigma=3.0,
                                inside_weight=mcfg.rpn.bbox_inside_weight)
        rpn_cls_total += l_cls
        rpn_box_total += l_box

        props = proposal_layer(feats.rpn_cls[0], feats.rpn_bbox[0], anchors,
                               h_img, w_img, im_scale, mcfg.rpn, train=True)
        other = 1 - f
        if cfg.train.ohem:
            tgts = tgt_lib.label_all_rois(
                props.rois, props.valid, gt_boxes[f], gt_labels, gt_valid[f],
                gt_boxes[other], gt_valid[other], mcfg.roi,
                mcfg.track if f == 0 else None)
        else:
            tgts = tgt_lib.proposal_target(
                props.rois, props.valid, gt_boxes[f], gt_labels, gt_valid[f],
                gt_boxes[other], gt_valid[other], keys[2 * f + 1], mcfg.roi,
                mcfg.track if f == 0 else None)

        cls_score, bbox_pred = rfcn_head(mcfg, feats.cls_maps[0],
                                         feats.bbox_maps[0], tgts.rois,
                                         spatial_scale)
        l_rcls, l_rbox, l_fg_ce = _rfcn_losses(cfg, cls_score, bbox_pred, tgts)
        rfcn_cls_total += l_rcls
        rfcn_box_total += l_rbox
        fg_ce_total += 0.5 * l_fg_ce
        num_fg += jnp.sum(tgts.bbox_weights)

        if f == 0:  # tracking head regresses frame-t RoIs to frame-τ gt
            trk_pred = track_rois(mcfg, track_maps, tgts.rois)
            tl = jnp.sum(smooth_l1(trk_pred, tgts.track_targets, sigma=1.0),
                         axis=-1) * tgts.track_weights
            track_loss = jnp.sum(tl) / jnp.maximum(jnp.sum(tgts.track_weights), 1.0)

    total = (rpn_cls_total + rpn_box_total + rfcn_cls_total + rfcn_box_total
             + track_loss)
    return LossBreakdown(total=total, rpn_cls=rpn_cls_total,
                         rpn_box=rpn_box_total, rfcn_cls=rfcn_cls_total,
                         rfcn_box=rfcn_box_total, track=track_loss,
                         num_fg=num_fg, fg_ce=fg_ce_total)


def batch_loss_vmapped(cfg: Config, model: DnT, params, anchors, batch, key
                       ) -> tuple[jnp.ndarray, LossBreakdown]:
    """Mean pair_loss vmapped over the batch — the pre-round-4 batch_loss.

    Kept as the parity oracle for `batch_loss`: vmapping pair_loss turns the
    per-frame PSRoI flat gather into a multi-axis batched gather, the known
    serial-slow TPU path (dtt/ops/psroi.py batch-folding note), which is why
    training now uses the batched formulation below.
    """
    b = batch["images"].shape[0]
    keys = jax.random.split(key, b)

    def one(images, gt_boxes, gt_labels, gt_valid, im_scale, im_size, k):
        return pair_loss(cfg, model, params, anchors, images, gt_boxes,
                         gt_labels, gt_valid, im_scale, im_size, k)

    lb = jax.vmap(one)(batch["images"], batch["gt_boxes"], batch["gt_labels"],
                       batch["gt_valid"], batch["im_scale"],
                       batch["im_size"], keys)
    mean_lb = jax.tree.map(jnp.mean, lb)
    return mean_lb.total, mean_lb


def batch_loss(cfg: Config, model: DnT, params, anchors, batch, key
               ) -> tuple[jnp.ndarray, LossBreakdown]:
    """Mean D&T loss over the per-device batch dict.

    batch keys: images (B,2,H,W,3), gt_boxes (B,2,G,4), gt_labels (B,G),
    gt_valid (B,2,G), im_scale (B,), im_size (B,2).

    Numerically equivalent to vmapping pair_loss over the batch (same RNG
    key flow; loss-parity-tested in tests/test_train.py), but structured the
    way the eval path is: ONE backbone/head forward over all 2B frames and
    batch-folded PSRoI pooling (psroi_pool_batched) over (B, N) RoIs —
    lifting the pools out of the vmap keeps their gather single-axis flat
    (round-3 VERDICT task 4; the vmapped form is the known serial-slow
    multi-axis gather on TPU). Target assignment and per-RoI losses stay
    vmapped — they are tiny element-wise/top-k work.
    """
    from dtt.models.dnt import pool_vote_batched
    mcfg = cfg.model
    b = batch["images"].shape[0]
    # identical key flow to batch_loss_vmapped -> pair_loss
    keys_b = jax.random.split(key, b)
    keys4 = jax.vmap(lambda k: jax.random.split(k, 4))(keys_b)   # (B, 4, 2)

    images = jax.vmap(
        lambda im, sz: dnt_lib.normalize_device_images(
            im, sz, cfg.input.pixel_means))(batch["images"],
                                            batch["im_size"])
    flat = images.reshape(-1, *images.shape[2:])                 # (2B, ...)
    feats = model.apply(params, flat, method=DnT.frame_features)
    f_t = jax.tree.map(lambda x: x[0::2], feats)
    f_tau = jax.tree.map(lambda x: x[1::2], feats)
    track_maps = model.apply(params, f_t, f_tau, method=DnT.track_psmaps)
    frames = [f_t, f_tau]

    h_img = batch["im_size"][:, 0]
    w_img = batch["im_size"][:, 1]
    im_scale = batch["im_scale"]
    gt_boxes, gt_labels = batch["gt_boxes"], batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    spatial_scale = 1.0 / mcfg.anchors.feat_stride

    rpn_cls_total = 0.0
    rpn_box_total = 0.0
    rfcn_cls_total = 0.0
    rfcn_box_total = 0.0
    track_loss = jnp.float32(0.0)
    num_fg = jnp.float32(0.0)
    fg_ce_total = 0.0

    for f in range(2):
        feats_f: FrameFeats = frames[f]
        at = jax.vmap(
            lambda gb, gv, hh, ww, k: tgt_lib.anchor_target(
                anchors, gb, gv, hh, ww, k, mcfg.rpn))(
            gt_boxes[:, f], gt_valid[:, f], h_img, w_img, keys4[:, 2 * f])
        l_cls, l_box = jax.vmap(
            lambda rc, rb, a: rpn_loss(
                rc, rb, a.labels, a.bbox_targets, a.bbox_weights, sigma=3.0,
                inside_weight=mcfg.rpn.bbox_inside_weight))(
            feats_f.rpn_cls, feats_f.rpn_bbox, at)
        rpn_cls_total += jnp.mean(l_cls)
        rpn_box_total += jnp.mean(l_box)

        props = jax.vmap(
            lambda rc, rb, hh, ww, sc: proposal_layer(
                rc, rb, anchors, hh, ww, sc, mcfg.rpn, train=True))(
            feats_f.rpn_cls, feats_f.rpn_bbox, h_img, w_img, im_scale)
        other = 1 - f
        track_cfg = mcfg.track if f == 0 else None
        if cfg.train.ohem:
            tgts = jax.vmap(
                lambda r, v, gb, gl, gv, gbo, gvo: tgt_lib.label_all_rois(
                    r, v, gb, gl, gv, gbo, gvo, mcfg.roi, track_cfg))(
                props.rois, props.valid, gt_boxes[:, f], gt_labels,
                gt_valid[:, f], gt_boxes[:, other], gt_valid[:, other])
        else:
            tgts = jax.vmap(
                lambda r, v, gb, gl, gv, gbo, gvo, k:
                tgt_lib.proposal_target(
                    r, v, gb, gl, gv, gbo, gvo, k, mcfg.roi, track_cfg))(
                props.rois, props.valid, gt_boxes[:, f], gt_labels,
                gt_valid[:, f], gt_boxes[:, other], gt_valid[:, other],
                keys4[:, 2 * f + 1])

        # batch-folded pools — OUTSIDE the vmap (the whole point); the
        # train_pool_impl default is the direct MXU kernel with the matmul
        # backward (the gather form's scatter-add bwd was 64.5 ms of the
        # 217 ms batch-8 step — BASELINE.md round-5 train profile)
        pimpl = mcfg.roi.train_pool_impl
        cls_score = pool_vote_batched(mcfg, feats_f.cls_maps, tgts.rois,
                                      spatial_scale, impl=pimpl)
        bbox_pred = pool_vote_batched(mcfg, feats_f.bbox_maps, tgts.rois,
                                      spatial_scale, impl=pimpl)
        l_rcls, l_rbox, l_fg_ce = jax.vmap(
            lambda cs, bp, t: _rfcn_losses(cfg, cs, bp, t))(
            cls_score, bbox_pred, tgts)
        rfcn_cls_total += jnp.mean(l_rcls)
        rfcn_box_total += jnp.mean(l_rbox)
        fg_ce_total += 0.5 * jnp.mean(l_fg_ce)
        num_fg += jnp.mean(jnp.sum(tgts.bbox_weights, axis=-1))

        if f == 0:  # tracking head regresses frame-t RoIs to frame-τ gt
            trk_pred = pool_vote_batched(mcfg, track_maps, tgts.rois,
                                         spatial_scale, impl=pimpl)
            tl = jnp.sum(smooth_l1(trk_pred, tgts.track_targets, sigma=1.0),
                         axis=-1) * tgts.track_weights
            tw = jnp.maximum(jnp.sum(tgts.track_weights, axis=-1), 1.0)
            track_loss = jnp.mean(jnp.sum(tl, axis=-1) / tw)

    total = (rpn_cls_total + rpn_box_total + rfcn_cls_total + rfcn_box_total
             + track_loss)
    lb = LossBreakdown(total=total, rpn_cls=rpn_cls_total,
                       rpn_box=rpn_box_total, rfcn_cls=rfcn_cls_total,
                       rfcn_box=rfcn_box_total, track=track_loss,
                       num_fg=num_fg, fg_ce=fg_ce_total)
    return lb.total, lb
