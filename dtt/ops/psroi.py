"""Position-sensitive RoI pooling (R-FCN core).

TPU-native replacement for the reference's CUDA op
(ref: lib/model/psroi_pooling/src/cuda/psroi_pooling_kernel.cu,
functions/psroi_pooling.py, modules/psroi_pool.py). Pooling math follows the
Caffe/R-FCN kernel exactly:

  roi_start = round(x1) * spatial_scale ; roi_end = round(x2 + 1) * spatial_scale
  roi_w/h   = max(end - start, 0.1)
  bin [ph, pw] spans rows [floor(ph*bin_h + start_h), ceil((ph+1)*bin_h + start_h))
  clipped to the map; output = mean over the bin; empty bins -> 0.

**Channel layout (dtt-native, differs from Caffe):** input channels are
bin-major, ``c = (ph*k + pw)*D + d``, so each bin's D-channel slab is a
*contiguous* channel slice — no strided gather, no transpose, and Pallas
BlockSpecs can map grid position (ph, pw) straight to a channel block. The
Caffe reference uses ``c = (d*k + ph)*k + pw``; the PyTorch checkpoint
importer permutes conv output channels accordingly, so numerics are
unaffected.

Both implementations ride a summed-area table (SAT): one 2-D cumsum over the
score map turns every bin average into 4 gathered corners — O(HWC) setup +
O(N*k^2*D) gathers, instead of re-reading each RoI's pixels.

* `psroi_pool_xla` — pure-XLA gathers; fully differentiable.
* `psroi_pool_pallas` — Pallas kernel gridded over the k×k bins: each program
  keeps its bin's (H+1, W+1, D) SAT slab in VMEM and resolves all N RoIs with
  scalar-prefetched integer bounds from SMEM. Backward is pinned to the XLA
  formulation via custom_vjp (transpose of gather = scatter-add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roi_bounds(rois: jnp.ndarray, spatial_scale: float, group_size: int,
                height: int, width: int):
    """Integer bin boundaries per RoI: (N, k) arrays hs, he, ws, we."""
    k = group_size
    start_w = jnp.round(rois[:, 0]) * spatial_scale
    start_h = jnp.round(rois[:, 1]) * spatial_scale
    end_w = jnp.round(rois[:, 2] + 1.0) * spatial_scale
    end_h = jnp.round(rois[:, 3] + 1.0) * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / k
    bin_h = roi_h / k
    grid = jnp.arange(k, dtype=jnp.float32)
    hs = jnp.floor(grid[None, :] * bin_h[:, None] + start_h[:, None])
    he = jnp.ceil((grid[None, :] + 1.0) * bin_h[:, None] + start_h[:, None])
    ws = jnp.floor(grid[None, :] * bin_w[:, None] + start_w[:, None])
    we = jnp.ceil((grid[None, :] + 1.0) * bin_w[:, None] + start_w[:, None])
    hs = jnp.clip(hs, 0, height).astype(jnp.int32)
    he = jnp.clip(he, 0, height).astype(jnp.int32)
    ws = jnp.clip(ws, 0, width).astype(jnp.int32)
    we = jnp.clip(we, 0, width).astype(jnp.int32)
    return hs, he, ws, we


def _sat(features: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded summed-area table: (H, W, C) -> (H+1, W+1, C) float32."""
    f = features.astype(jnp.float32)
    return jnp.pad(jnp.cumsum(jnp.cumsum(f, axis=0), axis=1),
                   ((1, 0), (1, 0), (0, 0)))


def psroi_pool_xla(features: jnp.ndarray, rois: jnp.ndarray,
                   spatial_scale: float, group_size: int) -> jnp.ndarray:
    """Integral-image PSRoI pooling.

    Args:
      features: (H, W, k*k*D) score maps, channel c = (ph*k + pw)*D + d.
      rois: (N, 4) boxes in image coordinates.
    Returns:
      (N, k, k, D) pooled averages.
    """
    h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    hs, he, ws, we = _roi_bounds(rois, spatial_scale, k, h, w)
    sat = _sat(features)

    outs = []
    for ph in range(k):
        row = []
        for pw in range(k):
            off = (ph * k + pw) * d
            slab = jax.lax.slice_in_dim(sat, off, off + d, axis=2)
            # flatten to single-axis gathers (fast path on TPU)
            flat = slab.reshape((h + 1) * (w + 1), d)
            a, b = hs[:, ph], he[:, ph]
            c0, c1 = ws[:, pw], we[:, pw]
            total = (flat[b * (w + 1) + c1] - flat[a * (w + 1) + c1]
                     - flat[b * (w + 1) + c0] + flat[a * (w + 1) + c0])
            area = ((b - a) * (c1 - c0)).astype(jnp.float32)
            row.append(jnp.where(area[:, None] > 0,
                                 total / jnp.maximum(area[:, None], 1.0), 0.0))
        outs.append(jnp.stack(row, axis=1))          # (N, k, D)
    return jnp.stack(outs, axis=1).astype(features.dtype)  # (N, k, k, D)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _psroi_kernel(bounds_ref,  # SMEM (N, 4k) int32: [hs | he | ws | we]
                  sat_ref,     # VMEM (1, H+1, W+1, D): this bin's SAT slab
                  out_ref,     # VMEM (1, 1, N, D)
                  *, num_rois: int, k: int):
    ph = pl.program_id(0)
    pw = pl.program_id(1)

    def body(n, _):
        a = bounds_ref[n, ph]
        b = bounds_ref[n, k + ph]
        c0 = bounds_ref[n, 2 * k + pw]
        c1 = bounds_ref[n, 3 * k + pw]
        total = (sat_ref[0, b, c1, :] - sat_ref[0, a, c1, :]
                 - sat_ref[0, b, c0, :] + sat_ref[0, a, c0, :])
        area = ((b - a) * (c1 - c0)).astype(jnp.float32)
        val = jnp.where(area > 0, total / jnp.maximum(area, 1.0), 0.0)
        out_ref[0, 0, n, :] = val.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_rois, body, 0)


def _psroi_pallas_raw(features: jnp.ndarray, rois: jnp.ndarray,
                      spatial_scale: float, group_size: int) -> jnp.ndarray:
    h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    n = rois.shape[0]
    hs, he, ws, we = _roi_bounds(rois, spatial_scale, k, h, w)
    bounds = jnp.concatenate([hs, he, ws, we], axis=1).astype(jnp.int32)  # (N, 4k)
    sat = _sat(features)  # (H+1, W+1, C); cumsum stays in XLA (no Mosaic lowering)
    # Bin to a leading axis so the block's trailing two dims are full-size
    # (Mosaic requires trailing block dims 8/128-aligned or whole-array).
    sat_binned = sat.reshape(h + 1, w + 1, k * k, d).transpose(2, 0, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k, k),
        in_specs=[
            # bin-major layout => the (ph, pw) slab is leading index ph*k+pw
            pl.BlockSpec((1, h + 1, w + 1, d),
                         lambda ph, pw, bounds: (ph * k + pw, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, d),
                               lambda ph, pw, bounds: (ph, pw, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_psroi_kernel, num_rois=n, k=k),
        out_shape=jax.ShapeDtypeStruct((k, k, n, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(bounds, sat_binned)
    return out.transpose(2, 0, 1, 3).astype(features.dtype)  # (N, k, k, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def psroi_pool_pallas(features, rois, spatial_scale: float, group_size: int):
    return _psroi_pallas_raw(features, rois, spatial_scale, group_size)


def _psroi_fwd(features, rois, spatial_scale, group_size):
    out = _psroi_pallas_raw(features, rois, spatial_scale, group_size)
    return out, (features, rois)


def _psroi_bwd(spatial_scale, group_size, res, g):
    features, rois = res
    # Backward pinned to the XLA formulation (transpose of gather = scatter-add).
    _, vjp = jax.vjp(lambda f: psroi_pool_xla(f, rois, spatial_scale, group_size),
                     features)
    (df,) = vjp(g.astype(features.dtype))
    return df, jnp.zeros_like(rois)


psroi_pool_pallas.defvjp(_psroi_fwd, _psroi_bwd)


def psroi_pool(features, rois, spatial_scale: float, group_size: int,
               impl: str = "auto") -> jnp.ndarray:
    """Dispatching entry point; (H, W, k*k*D), (N, 4) -> (N, k, k, D).

    impl="auto" selects the XLA formulation: with single-axis (flattened)
    gathers it measures 0.92 ms vs the Pallas kernel's 1.28 ms at production
    shapes (38x68x1519, 300 RoIs) on v5e — the Pallas kernel's serial
    per-RoI loop loses to XLA's batched gather. Both stay available and
    oracle-pinned; `impl="pallas"` opts into the kernel.
    """
    if impl == "auto":
        impl = "xla"
    if impl == "xla":
        return psroi_pool_xla(features, rois, spatial_scale, group_size)
    if impl == "pallas":
        return psroi_pool_pallas(features, rois, spatial_scale, group_size)
    raise ValueError(f"unknown psroi impl {impl!r}")
