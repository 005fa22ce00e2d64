"""Anchor generation — trace-time constants, numerically identical to the
py-faster-rcnn recipe the reference inherits (ref: lib/model/rpn/generate_anchors.py).

Anchors are a pure function of static config (scales, ratios, feature-map
shape), so they are computed in NumPy once at trace time and baked into the
XLA program as constants — no per-step work, no dynamic shapes.
"""

from __future__ import annotations

import functools

import numpy as np


def _whctrs(anchor: np.ndarray):
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    x_ctr = anchor[0] + 0.5 * (w - 1.0)
    y_ctr = anchor[1] + 0.5 * (h - 1.0)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr) -> np.ndarray:
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        [
            x_ctr - 0.5 * (ws - 1.0),
            y_ctr - 0.5 * (hs - 1.0),
            x_ctr + 0.5 * (ws - 1.0),
            y_ctr + 0.5 * (hs - 1.0),
        ]
    )


def _ratio_enum(anchor, ratios) -> np.ndarray:
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales) -> np.ndarray:
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * scales
    hs = h * scales
    return _mkanchors(ws, hs, x_ctr, y_ctr)


@functools.lru_cache(maxsize=None)
def generate_base_anchors(base_size: int = 16,
                          ratios: tuple = (0.5, 1.0, 2.0),
                          scales: tuple = (8.0, 16.0, 32.0)) -> np.ndarray:
    """(A, 4) base anchors centered on one feature cell.

    Bit-identical to the reference recipe: ratio enumeration with rounding,
    then scale enumeration.
    """
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    base = np.array([0, 0, base_size - 1, base_size - 1], np.float64)
    ratio_anchors = _ratio_enum(base, ratios)
    anchors = np.vstack(
        [_scale_enum(ratio_anchors[i], scales) for i in range(ratio_anchors.shape[0])]
    )
    return anchors.astype(np.float32)


@functools.lru_cache(maxsize=None)
def grid_anchors(feat_height: int, feat_width: int, feat_stride: int = 16,
                 base_size: int = 16,
                 ratios: tuple = (0.5, 1.0, 2.0),
                 scales: tuple = (8.0, 16.0, 32.0)) -> np.ndarray:
    """All anchors over an H×W feature grid, layout (H*W*A, 4).

    Row-major over (y, x, a) — matching the (H, W, A·4) conv output layout so
    RPN predictions and anchors zip without a transpose.
    """
    base = generate_base_anchors(base_size, tuple(ratios), tuple(scales))
    shift_x = np.arange(feat_width, dtype=np.float32) * feat_stride
    shift_y = np.arange(feat_height, dtype=np.float32) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (H*W, 1, 4)
    all_anchors = shifts + base[None, :, :]                          # (H*W, A, 4)
    return np.ascontiguousarray(all_anchors.reshape(-1, 4))


def grid_anchors_for(cfg_anchors, feat_height: int, feat_width: int) -> np.ndarray:
    """Convenience: anchors from an AnchorConfig."""
    return grid_anchors(
        feat_height,
        feat_width,
        feat_stride=cfg_anchors.feat_stride,
        base_size=cfg_anchors.base_size,
        ratios=tuple(cfg_anchors.ratios),
        scales=tuple(cfg_anchors.scales),
    )
