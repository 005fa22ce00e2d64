"""Box geometry in pure jnp — XLA-friendly, fully vectorized.

Capability parity with the reference's bbox utilities
(ref: lib/model/rpn/bbox_transform.py — bbox_transform, bbox_transform_inv,
clip_boxes; lib/model/utils/bbox.pyx — bbox_overlaps), but written as
shape-polymorphic jnp functions that trace once under jit. All boxes are
``(x1, y1, x2, y2)`` and use the Caffe/py-faster-rcnn ``+1`` width
convention the reference inherits, so decoded coordinates match the PyTorch
lineage within fp tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

# Caffe lineage: width = x2 - x1 + 1.
_ONE = 1.0


def box_wh_ctr(boxes: jnp.ndarray):
    """(..., 4) -> widths, heights, ctr_x, ctr_y with the +1 convention."""
    w = boxes[..., 2] - boxes[..., 0] + _ONE
    h = boxes[..., 3] - boxes[..., 1] + _ONE
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + _ONE, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + _ONE, 0.0)
    return w * h


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (..., N, 4) and (..., M, 4) -> (..., N, M).

    Replaces the Cython bbox_overlaps kernel with one vectorized XLA op.
    """
    a_ = a[..., :, None, :]
    b_ = b[..., None, :, :]
    ix = jnp.minimum(a_[..., 2], b_[..., 2]) - jnp.maximum(a_[..., 0], b_[..., 0]) + _ONE
    iy = jnp.minimum(a_[..., 3], b_[..., 3]) - jnp.maximum(a_[..., 1], b_[..., 1]) + _ONE
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between matched boxes: (..., 4) vs (..., 4) -> (...,)."""
    ix = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + _ONE
    iy = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + _ONE
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    union = box_area(a) + box_area(b) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_boxes(ex_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                 means=None, stds=None) -> jnp.ndarray:
    """Boxes -> regression deltas (ref bbox_transform).

    dx = (gt_cx - ex_cx)/ex_w, dw = log(gt_w/ex_w); optionally normalized by
    (means, stds) — the reference's BBOX_NORMALIZE_TARGETS_PRECOMPUTED path.
    """
    ew, eh, ecx, ecy = box_wh_ctr(ex_boxes)
    gw, gh, gcx, gcy = box_wh_ctr(gt_boxes)
    ew = jnp.maximum(ew, 1e-6)
    eh = jnp.maximum(eh, 1e-6)
    deltas = jnp.stack(
        [
            (gcx - ecx) / ew,
            (gcy - ecy) / eh,
            jnp.log(jnp.maximum(gw, 1e-6) / ew),
            jnp.log(jnp.maximum(gh, 1e-6) / eh),
        ],
        axis=-1,
    )
    if means is not None:
        deltas = deltas - jnp.asarray(means, deltas.dtype)
    if stds is not None:
        deltas = deltas / jnp.asarray(stds, deltas.dtype)
    return deltas


def decode_boxes(boxes: jnp.ndarray, deltas: jnp.ndarray,
                 means=None, stds=None) -> jnp.ndarray:
    """Regression deltas -> boxes (ref bbox_transform_inv).

    `deltas` may carry multiple 4-vectors per box in its last dim (per-class
    regression): (..., N, 4*K) against boxes (..., N, 4) -> (..., N, 4*K).
    """
    if stds is not None or means is not None:
        d = deltas.reshape(*deltas.shape[:-1], -1, 4)
        if stds is not None:
            d = d * jnp.asarray(stds, deltas.dtype)
        if means is not None:
            d = d + jnp.asarray(means, deltas.dtype)
        deltas = d.reshape(*deltas.shape)
    w, h, cx, cy = box_wh_ctr(boxes)
    d = deltas.reshape(*deltas.shape[:-1], -1, 4)
    # clamp dw/dh as modern detectors do to avoid inf under exp; the clamp
    # (log(1000/16)≈4.135) never binds for sane inputs so parity is preserved.
    dwdh_max = 4.135166556742356
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], max=dwdh_max)
    dh = jnp.clip(d[..., 3], max=dwdh_max)
    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]
    # The "- 1" on x2/y2 makes decode the exact inverse of encode under the
    # +1 width convention (Detectron's documented fix of the py-faster-rcnn
    # asymmetry); zero deltas are then the identity.
    out = jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph,
         pcx + 0.5 * pw - _ONE, pcy + 0.5 * ph - _ONE],
        axis=-1,
    )
    return out.reshape(*deltas.shape)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip to image extent [0, W-1] x [0, H-1] (ref clip_boxes).

    `height`/`width` may be python ints or traced scalars (per-image im_info).
    Supports (..., 4) or (..., 4*K) layouts.
    """
    shape = boxes.shape
    b = boxes.reshape(*shape[:-1], -1, 4)
    x1 = jnp.clip(b[..., 0], 0.0, width - _ONE)
    y1 = jnp.clip(b[..., 1], 0.0, height - _ONE)
    x2 = jnp.clip(b[..., 2], 0.0, width - _ONE)
    y2 = jnp.clip(b[..., 3], 0.0, height - _ONE)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


def flip_boxes(boxes: jnp.ndarray, width) -> jnp.ndarray:
    """Horizontal flip (ref roidb 'flipped' augmentation)."""
    x1 = width - _ONE - boxes[..., 2]
    x2 = width - _ONE - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
