"""RoI align / pool / crop — capability parity with the jwyang-lineage ops.

TPU-native replacements for the reference's CUDA extensions
(ref: lib/model/roi_align/src/, lib/model/roi_pooling/src/,
lib/model/roi_crop/src/ behind cfg.POOLING_MODE). The R-FCN/D&T path uses
PSRoI pooling (dtt.ops.psroi); these exist so every pooling mode of the
reference has an equivalent. All are pure-XLA gather formulations: static
shapes, differentiable, vmap-friendly — no need for Pallas here since none
of them is on the hot path.

Conventions:
* roi_align follows torchvision semantics (continuous coords, fixed
  sampling_ratio grid per bin, `aligned` flag for the -0.5 half-pixel fix).
* roi_pool follows the Caffe/torchvision integer-bin max pooling.
* roi_crop follows the spatial-transformer style bilinear crop of the
  reference (uniform grid across the RoI, optional 2x2 max-pool reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(features: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                    ) -> jnp.ndarray:
    """Bilinear interpolation of (H, W, C) at continuous points.

    Points outside [-1, H] / [-1, W] contribute zero (torchvision rule);
    in-range points are clamped to the valid pixel grid.
    """
    h, w, _ = features.shape
    outside = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    # single-axis gathers on flattened HW: multi-axis advanced indexing
    # lowers to a pathologically slow serial gather on TPU (measured 19 s
    # for 25k points at conv4 shapes; this form takes milliseconds).
    flat = features.reshape(h * w, features.shape[-1])
    v00 = flat[y0 * w + x0]
    v01 = flat[y0 * w + x1]
    v10 = flat[y1 * w + x0]
    v11 = flat[y1 * w + x1]
    val = ((1 - ly) * (1 - lx) * v00 + (1 - ly) * lx * v01
           + ly * (1 - lx) * v10 + ly * lx * v11)
    return jnp.where(outside[..., None], 0.0, val)


def roi_align(features: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              output_size: int, sampling_ratio: int = 2,
              aligned: bool = False) -> jnp.ndarray:
    """(H, W, C), (N, 4) -> (N, k, k, C) average of bilinear samples.

    `sampling_ratio` must be positive (static sample grid; the adaptive
    `ceil(roi/bin)` mode of torchvision is shape-dynamic and intentionally
    unsupported).
    """
    assert sampling_ratio > 0, "static shapes require a fixed sampling_ratio"
    k, sr = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / k
    bin_h = roi_h / k
    # sample lattice: (k*sr,) fractional positions within the roi
    idx = (jnp.arange(k * sr, dtype=features.dtype) // sr)
    sub = (jnp.arange(k * sr, dtype=features.dtype) % sr + 0.5) / sr
    ys = y1[:, None] + (idx + sub)[None, :] * bin_h[:, None]   # (N, k*sr)
    xs = x1[:, None] + (idx + sub)[None, :] * bin_w[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (ys.shape[0], k * sr, k * sr))
    xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], k * sr, k * sr))
    samples = bilinear_sample(features, yy, xx)                 # (N, k*sr, k*sr, C)
    n, _, _, c = samples.shape
    return samples.reshape(n, k, sr, k, sr, c).mean(axis=(2, 4))


def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
             output_size: int) -> jnp.ndarray:
    """(H, W, C), (N, 4) -> (N, k, k, C) exact integer-bin max pooling.

    Separable masked max: bin row/col membership is expressed as boolean
    one-hots, the rectangle max factorizes into a row-max then col-max —
    O(N*k*H*W*C) vector work, no dynamic shapes.
    """
    h, w, c = features.shape
    k = output_size
    n = rois.shape[0]
    x1 = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
    bin_w = roi_w / k
    bin_h = roi_h / k
    grid = jnp.arange(k, dtype=jnp.float32)
    hs = jnp.clip(jnp.floor(grid[None] * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, h)
    he = jnp.clip(jnp.ceil((grid[None] + 1) * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, h)
    ws = jnp.clip(jnp.floor(grid[None] * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, w)
    we = jnp.clip(jnp.ceil((grid[None] + 1) * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, w)

    yidx = jnp.arange(h)
    xidx = jnp.arange(w)
    row_in = (yidx[None, None, :] >= hs[:, :, None]) & (yidx[None, None, :] < he[:, :, None])  # (N, k, H)
    col_in = (xidx[None, None, :] >= ws[:, :, None]) & (xidx[None, None, :] < we[:, :, None])  # (N, k, W)

    neg = jnp.finfo(jnp.float32).min
    f = features.astype(jnp.float32)
    # row reduce: (N, k_h, W, C)
    rowmax = jnp.max(
        jnp.where(row_in[:, :, :, None, None], f[None, None, :, :, :], neg), axis=2)
    # col reduce: out[n, p, q, c] = max_x col_in[n, q, x] ? rowmax[n, p, x, c]
    out = jnp.max(
        jnp.where(col_in[:, None, :, :, None], rowmax[:, :, None, :, :], neg),
        axis=3)  # (N, k_h, k_w, C)
    empty = ((he <= hs)[:, :, None] | (we <= ws)[:, None, :])[..., None]
    return jnp.where(empty, 0.0, out).astype(features.dtype)


def roi_crop(features: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
             output_size: int, max_pool: bool = True) -> jnp.ndarray:
    """Spatial-transformer style bilinear crop (ref: lib/model/roi_crop).

    Builds a uniform (2k x 2k if max_pool else k x k) bilinear sample grid
    spanning the RoI (align-corners convention) and optionally reduces 2x2
    by max — the reference's CROP_RESIZE_WITH_MAX_POOL path.
    """
    g = output_size * 2 if max_pool else output_size
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    t = jnp.arange(g, dtype=features.dtype) / jnp.maximum(g - 1.0, 1.0)
    ys = y1[:, None] + t[None, :] * (y2 - y1)[:, None]
    xs = x1[:, None] + t[None, :] * (x2 - x1)[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (ys.shape[0], g, g))
    xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], g, g))
    samples = bilinear_sample(features, yy, xx)
    if max_pool:
        n, _, _, c = samples.shape
        k = output_size
        samples = samples.reshape(n, k, 2, k, 2, c).max(axis=(2, 4))
    return samples
