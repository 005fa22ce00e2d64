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

NEGATIVE RESULT (round 2, measured, do not redo): fusing all (RoI, bin,
corner) lookups into ONE flat gather over the (pos, bin)-reshaped SAT is
1.6-3x SLOWER on v5e than the per-bin loop below (cls head B=16: 33.8 ms
vs 10.7 ms) — TPU gather throughput degrades with table size, and the
per-bin form's 49 small sliced tables (43k rows each) beat one 2.1M-row
table despite 49x more gather ops.

* `psroi_pool_mm` / `psroi_pool_pallas_mm` — matmul (MXU) formulation: the
  4-corner SAT difference is a bilinear form over one-hot row/col indicator
  vectors, so all RoIs of a bin become two dense contractions (see the
  "Matmul formulation" section). The Pallas variant runs one program per
  bin, rows contracted on the MXU.
* `psroi_pool_pallas` — Pallas kernel gridded over the k×k bins: each program
  keeps its bin's (H+1, W+1, D) SAT slab in VMEM and resolves all N RoIs with
  scalar-prefetched integer bounds from SMEM (serial per-RoI loop).

Backward of both Pallas kernels is pinned to the XLA formulation via
custom_vjp (transpose of gather = scatter-add). See `psroi_pool` for
measured times; "auto" = the XLA gather form.
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


def psroi_pool_batched(features: jnp.ndarray, rois: jnp.ndarray,
                       spatial_scale: float, group_size: int) -> jnp.ndarray:
    """Frame-batched PSRoI pooling: (B, H, W, k*k*D), (B, N, 4) -> (B, N, k, k, D).

    NOT a vmap of the per-frame form: under vmap the flattened single-axis
    gather acquires a batch dimension and XLA lowers it as a slow
    multi-axis gather (measured 5.6 ms vs 4.9 ms for the production cls
    head, and the in-pipeline gap is larger). Here the batch is folded into
    the gather index (b*(H+1)*(W+1) offset) so the hot path stays one flat
    single-axis gather. Differentiable (transpose of gather).
    """
    b, h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    n = rois.shape[1]
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    hs, he, ws, we = jax.vmap(
        lambda r: _roi_bounds(r, spatial_scale, k, h, w))(rois)  # (B, N, k)
    sat = jax.vmap(_sat)(features)                    # (B, H+1, W+1, C)
    h1, w1 = h + 1, w + 1
    base = (jnp.arange(b) * (h1 * w1))[:, None]       # (B, 1)

    outs = []
    for ph in range(k):
        row = []
        for pw in range(k):
            off = (ph * k + pw) * d
            flat = jax.lax.slice_in_dim(sat, off, off + d, axis=3)
            flat = flat.reshape(b * h1 * w1, d)
            a, bb = hs[:, :, ph], he[:, :, ph]
            c0, c1 = ws[:, :, pw], we[:, :, pw]
            i00 = (base + a * w1 + c0).reshape(-1)
            i01 = (base + a * w1 + c1).reshape(-1)
            i10 = (base + bb * w1 + c0).reshape(-1)
            i11 = (base + bb * w1 + c1).reshape(-1)
            total = flat[i11] - flat[i01] - flat[i10] + flat[i00]
            area = ((bb - a) * (c1 - c0)).astype(jnp.float32).reshape(-1)
            row.append(jnp.where(area[:, None] > 0,
                                 total / jnp.maximum(area[:, None], 1.0), 0.0))
        outs.append(jnp.stack(row, axis=1))           # (B*N, k, D)
    out = jnp.stack(outs, axis=1)                     # (B*N, k, k, D)
    return out.reshape(b, n, k, k, d).astype(features.dtype)


# ---------------------------------------------------------------------------
# Matmul (MXU) formulation
#
# The 4-corner SAT difference for bin (ph, pw) of RoI n factorizes as a
# bilinear form  (e_he - e_hs)^T · SAT_slab · (e_we - e_ws)  with one-hot
# row/col indicator vectors, so ALL RoIs of a bin reduce to two dense
# contractions: rows first (an (N, H+1) @ (H+1, (W+1)·D) matmul on the MXU),
# then the column indicator as a multiply-reduce. This replaces the serial
# per-RoI gather loop with MXU work — the TPU-native answer to the CUDA
# kernel's one-thread-per-output parallelism.
# ---------------------------------------------------------------------------

def _row_col_indicators(hs, he, ws, we, height: int, width: int):
    """One-hot difference indicators: R (N, k, H+1), C (N, k, W+1) f32."""
    yy = jnp.arange(height + 1)
    xx = jnp.arange(width + 1)
    r = ((he[..., None] == yy).astype(jnp.float32)
         - (hs[..., None] == yy).astype(jnp.float32))
    c = ((we[..., None] == xx).astype(jnp.float32)
         - (ws[..., None] == xx).astype(jnp.float32))
    return r, c


def _bin_areas(hs, he, ws, we):
    """(N, k, k) bin pixel counts (0 for empty bins)."""
    dh = (he - hs).astype(jnp.float32)          # (N, k)
    dw = (we - ws).astype(jnp.float32)          # (N, k)
    return jnp.maximum(dh, 0.0)[:, :, None] * jnp.maximum(dw, 0.0)[:, None, :]


def psroi_pool_mm(features: jnp.ndarray, rois: jnp.ndarray,
                  spatial_scale: float, group_size: int) -> jnp.ndarray:
    """XLA einsum form of the matmul formulation (differentiable).

    HIGHEST matmul precision is mandatory: SAT entries reach O(H*W) scale,
    and the TPU's default bf16-input f32 matmuls lose ~1e-2 of the pooled
    value (measured 1.4 absolute on production maps).
    """
    h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    hs, he, ws, we = _roi_bounds(rois, spatial_scale, k, h, w)
    sat = _sat(features).reshape(h + 1, w + 1, k, k, d)  # c = (ph*k + pw)*d + dd
    hi = jax.lax.Precision.HIGHEST
    r, cind = _row_col_indicators(hs, he, ws, we, h, w)
    t1 = jnp.einsum("npy,yxpqd->npqxd", r, sat, precision=hi)  # rows (MXU)
    sums = jnp.einsum("nqx,npqxd->npqd", cind, t1, precision=hi)
    area = _bin_areas(hs, he, ws, we)[..., None]
    out = jnp.where(area > 0, sums / jnp.maximum(area, 1.0), 0.0)
    return out.astype(features.dtype)


def _psroi_mm_kernel(r_ref,    # VMEM (1, N, H+1)  rows indicator, bin ph
                     c_ref,    # VMEM (1, N, W+1)  cols indicator, bin pw
                     sat_ref,  # VMEM (1, H+1, D*(W+1)) SAT slab, channel-major
                     out_ref,  # VMEM (1, 1, N, D) bin sums (area applied outside)
                     *, w1: int, d: int):
    r = r_ref[0]                                      # (N, H+1)
    slab = sat_ref[0]                                 # (H+1, D*(W+1))
    # HIGHEST precision: SAT entries are O(H*W)-scale; default bf16-input
    # matmuls lose ~1e-2 of the pooled value
    t1 = jnp.dot(r, slab, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)   # (N, D*(W+1))
    # column contraction without lane reshapes (Mosaic-friendly): the slab's
    # channel-major d*(W+1)+x layout means a whole-vector repeat of the col
    # indicator lines up with x; the x-sum per channel is then a constant
    # 0/1 selection matmul
    cind = pltpu.repeat(c_ref[0], d, axis=1)          # (N, D*(W+1))
    sel = (jax.lax.broadcasted_iota(jnp.int32, (w1 * d, d), 0) // w1
           == jax.lax.broadcasted_iota(jnp.int32, (w1 * d, d), 1))
    out_ref[0, 0] = jnp.dot(t1 * cind, sel.astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


def _psroi_pallas_mm_raw(features: jnp.ndarray, rois: jnp.ndarray,
                         spatial_scale: float, group_size: int) -> jnp.ndarray:
    h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    n = rois.shape[0]
    hs, he, ws, we = _roi_bounds(rois, spatial_scale, k, h, w)
    r, cind = _row_col_indicators(hs, he, ws, we, h, w)
    r = r.transpose(1, 0, 2)                          # (k, N, H+1) bin-major
    cind = cind.transpose(1, 0, 2)                    # (k, N, W+1)
    sat = _sat(features)                              # (H+1, W+1, C) f32
    # (bin, H+1, D*(W+1)) channel-major slabs — see _psroi_mm_kernel
    sat_binned = (sat.reshape(h + 1, w + 1, k * k, d)
                  .transpose(2, 0, 3, 1)
                  .reshape(k * k, h + 1, d * (w + 1)))

    sums = pl.pallas_call(
        functools.partial(_psroi_mm_kernel, w1=w + 1, d=d),
        grid=(k, k),
        in_specs=[
            pl.BlockSpec((1, n, h + 1), lambda ph, pw: (ph, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, w + 1), lambda ph, pw: (pw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 1, d * (w + 1)),
                         lambda ph, pw: (ph * k + pw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, d), lambda ph, pw: (ph, pw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k, n, d), jnp.float32),
        interpret=_use_interpret(),
    )(r, cind, sat_binned)

    area = _bin_areas(hs, he, ws, we)[..., None]      # (N, k, k, 1)
    sums = sums.transpose(2, 0, 1, 3)                 # (N, k, k, D)
    out = jnp.where(area > 0, sums / jnp.maximum(area, 1.0), 0.0)
    return out.astype(features.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def psroi_pool_pallas_mm(features, rois, spatial_scale: float, group_size: int):
    return _psroi_pallas_mm_raw(features, rois, spatial_scale, group_size)


def _psroi_mm_fwd(features, rois, spatial_scale, group_size):
    out = _psroi_pallas_mm_raw(features, rois, spatial_scale, group_size)
    return out, (features, rois)


def _psroi_mm_bwd(spatial_scale, group_size, res, g):
    features, rois = res
    _, vjp = jax.vjp(lambda f: psroi_pool_xla(f, rois, spatial_scale, group_size),
                     features)
    (df,) = vjp(g.astype(features.dtype))
    return df, jnp.zeros_like(rois)


psroi_pool_pallas_mm.defvjp(_psroi_mm_fwd, _psroi_mm_bwd)


def _psroi_mm_kernel_b(r_ref,    # VMEM (1, 1, N, H+1)
                       c_ref,    # VMEM (1, 1, N, W+1)
                       sat_ref,  # VMEM (1, 1, H+1, D*(W+1))
                       out_ref,  # VMEM (1, 1, 1, N, D)
                       *, w1: int, d: int):
    r = r_ref[0, 0]
    slab = sat_ref[0, 0]
    t1 = jnp.dot(r, slab, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)   # (N, D*(W+1))
    cind = pltpu.repeat(c_ref[0, 0], d, axis=1)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (w1 * d, d), 0) // w1
           == jax.lax.broadcasted_iota(jnp.int32, (w1 * d, d), 1))
    out_ref[0, 0, 0] = jnp.dot(t1 * cind, sel.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def psroi_pool_batched_pallas_mm(features: jnp.ndarray, rois: jnp.ndarray,
                                 spatial_scale: float, group_size: int
                                 ) -> jnp.ndarray:
    """Frame-batched Pallas MXU pooling: (B, H, W, k*k*D), (B, N, 4) ->
    (B, N, k, k, D).

    The (frame, bin) grid runs _psroi_mm_kernel's bilinear-form matmuls per
    program — an MXU alternative to psroi_pool_batched's gather-row-bound
    form (the gather moves ~1 GB of 128-lane-padded rows per 32-frame chunk
    regardless of D; see tools/profile_heads.py). Inference-only form (no
    custom_vjp): eval pools detection RoIs, which carry no gradient.
    """
    b, h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    n = rois.shape[1]
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    hs, he, ws, we = jax.vmap(
        lambda r: _roi_bounds(r, spatial_scale, k, h, w))(rois)  # (B, N, k)
    r, cind = jax.vmap(
        lambda a, bb, c0, c1: _row_col_indicators(a, bb, c0, c1, h, w)
    )(hs, he, ws, we)                                  # (B, N, k, H+1/W+1)
    r = r.transpose(0, 2, 1, 3)                        # (B, k, N, H+1)
    cind = cind.transpose(0, 2, 1, 3)                  # (B, k, N, W+1)
    sat = jax.vmap(_sat)(features)                     # (B, H+1, W+1, C) f32
    sat_binned = (sat.reshape(b, h + 1, w + 1, k * k, d)
                  .transpose(0, 3, 1, 4, 2)
                  .reshape(b, k * k, h + 1, d * (w + 1)))

    sums = pl.pallas_call(
        functools.partial(_psroi_mm_kernel_b, w1=w + 1, d=d),
        grid=(b, k, k),
        in_specs=[
            pl.BlockSpec((1, 1, n, h + 1), lambda bi, ph, pw: (bi, ph, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, w + 1), lambda bi, ph, pw: (bi, pw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h + 1, d * (w + 1)),
                         lambda bi, ph, pw: (bi, ph * k + pw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, n, d),
                               lambda bi, ph, pw: (bi, ph, pw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, k, n, d), jnp.float32),
        interpret=_use_interpret(),
    )(r, cind, sat_binned)

    area = jax.vmap(_bin_areas)(hs, he, ws, we)[..., None]  # (B, N, k, k, 1)
    sums = sums.transpose(0, 3, 1, 2, 4)               # (B, N, k, k, D)
    out = jnp.where(area > 0, sums / jnp.maximum(area, 1.0), 0.0)
    return out.astype(features.dtype)


def _psroi_direct_kernel(r_ref,    # VMEM (1, 1, N, H)   row interval indicator
                         c_ref,    # VMEM (1, 1, N, W)   col interval indicator
                         map_ref,  # VMEM (1, 1, H, D*W) bin slab, channel-major
                         out_ref,  # VMEM (1, 1, 1, N, D) bin SUMS (area outside)
                         *, w: int, d: int):
    """Interval-indicator bilinear form over the RAW map (no SAT).

    bin_sum[n, d] = Σ_y Σ_x 1[hs<=y<he] M[y, x, d] 1[ws<=x<we] — two MXU
    contractions per (frame, bin) program. Unlike the SAT kernels, operands
    are O(1) map values, so bf16 maps run at the MXU's native bf16 rate; the
    SAT's O(H*W)-magnitude entries are what forced the 6-pass precision
    there. float32 maps get Precision.HIGHEST so hardware results stay
    f32-exact like the oracle (the TPU default would silently truncate f32
    operands to ~bf16 — advisor round-3 finding).
    """
    dt = map_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    slab = map_ref[0, 0]                               # (H, D*W), d*W + x
    t1 = jnp.dot(r_ref[0, 0].astype(dt), slab,
                 preferred_element_type=jnp.float32,
                 precision=prec)                       # (N, D*W) f32
    cind = pltpu.repeat(c_ref[0, 0], d, axis=1)        # (N, D*W)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (w * d, d), 0) // w
           == jax.lax.broadcasted_iota(jnp.int32, (w * d, d), 1))
    # t1 entries are bin-row sums (<=H terms of O(1)); casting back to the
    # map dtype costs less precision than the conv that produced the maps
    out_ref[0, 0, 0] = jnp.dot((t1 * cind).astype(dt), sel.astype(dt),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _interval_indicators(hs, he, ws, we, height: int, width: int):
    """0/1 interval indicators: R (N, k, H), C (N, k, W) float32."""
    yy = jnp.arange(height)
    xx = jnp.arange(width)
    r = ((yy >= hs[..., None]) & (yy < he[..., None]))
    c = ((xx >= ws[..., None]) & (xx < we[..., None]))
    return r.astype(jnp.float32), c.astype(jnp.float32)


def psroi_pool_batched_direct(features: jnp.ndarray, rois: jnp.ndarray,
                              spatial_scale: float, group_size: int
                              ) -> jnp.ndarray:
    """Frame-batched MXU pooling straight off the RAW maps (no SAT):
    (B, H, W, k*k*D), (B, N, 4) -> (B, N, k, k, D).

    vs psroi_pool_batched (SAT + flat gathers): skips the 2-D cumsum and
    replaces the gather-row-bound corner reads with dense per-(frame, bin)
    matmuls against 0/1 interval indicators (see _psroi_direct_kernel).
    bf16 maps run the MXU at full rate — the precision loss is bounded by
    the maps' own conv-output precision (pooled means are averages of O(1)
    values; no O(H*W) SAT cancellation). Inference-only (no custom_vjp):
    eval pools detection RoIs, which carry no gradient.
    """
    b, h, w, c = features.shape
    k = group_size
    d = c // (k * k)
    n = rois.shape[1]
    assert d * k * k == c, f"channels {c} not divisible by k^2={k * k}"
    hs, he, ws, we = jax.vmap(
        lambda r: _roi_bounds(r, spatial_scale, k, h, w))(rois)   # (B, N, k)
    r, cind = jax.vmap(
        lambda a, bb, c0, c1: _interval_indicators(a, bb, c0, c1, h, w)
    )(hs, he, ws, we)                                  # (B, N, k, H/W)
    r = r.transpose(0, 2, 1, 3)                        # (B, k, N, H)
    cind = cind.transpose(0, 2, 1, 3)                  # (B, k, N, W)
    # channel-major (d*W + x) slabs per bin: one XLA transpose of the map
    slabs = (features.reshape(b, h, w, k * k, d)
             .transpose(0, 3, 1, 4, 2)
             .reshape(b, k * k, h, d * w))

    sums = pl.pallas_call(
        functools.partial(_psroi_direct_kernel, w=w, d=d),
        grid=(b, k, k),
        in_specs=[
            pl.BlockSpec((1, 1, n, h), lambda bi, ph, pw: (bi, ph, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, w), lambda bi, ph, pw: (bi, pw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, d * w),
                         lambda bi, ph, pw: (bi, ph * k + pw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, n, d),
                               lambda bi, ph, pw: (bi, ph, pw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, k, n, d), jnp.float32),
        interpret=_use_interpret(),
    )(r, cind, slabs)

    area = jax.vmap(_bin_areas)(hs, he, ws, we)[..., None]  # (B, N, k, k, 1)
    sums = sums.transpose(0, 3, 1, 2, 4)               # (B, N, k, k, D)
    out = jnp.where(area > 0, sums / jnp.maximum(area, 1.0), 0.0)
    return out.astype(features.dtype)


def _psroi_direct_bwd_kernel(r_ref,    # VMEM (1, 1, N, H)   row indicator
                             c_ref,    # VMEM (1, 1, N, W)   col indicator
                             g_ref,    # VMEM (1, 1, 1, N, D) ghat = g/area
                             out_ref,  # VMEM (1, 1, H, D*W) dL/d(bin slab)
                             *, w: int, d: int):
    """Transpose of _psroi_direct_kernel — itself two MXU contractions.

    d slab[y, (dd, x)] = Σ_n R[n, y] * ghat[n, dd] * C[n, x]: expand ghat
    along x (constant 0/1 selection matmul, mirroring the forward's channel
    reduce), mask with the repeated column indicator, then contract the RoI
    axis against R on the MXU. This replaces the gather form's scatter-add
    backward — the measured 64.5 ms of the batch-8 train step
    (BASELINE.md round-5 train profile) — with dense matmul work.
    """
    dt = out_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    g = g_ref[0, 0, 0]                                 # (N, D) f32
    # selT[dd, i] = 1 iff i // w == dd  => (g @ selT)[n, dd*w + x] = g[n, dd]
    sel_t = (jax.lax.broadcasted_iota(jnp.int32, (d, w * d), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (d, w * d), 1) // w)
    gexp = jnp.dot(g.astype(dt), sel_t.astype(dt),
                   preferred_element_type=jnp.float32,
                   precision=prec)                     # (N, D*W)
    m2 = gexp * pltpu.repeat(c_ref[0, 0], d, axis=1)   # (N, D*W)
    dslab = jax.lax.dot_general(                       # contract N: (H, D*W)
        r_ref[0, 0].astype(dt), m2.astype(dt),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    out_ref[0, 0] = dslab.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def psroi_pool_batched_direct_ad(features, rois, spatial_scale: float,
                                 group_size: int):
    """Differentiable psroi_pool_batched_direct (training form).

    Forward is the interval-indicator MXU kernel unchanged; backward is its
    mirror-image bilinear contraction (_psroi_direct_bwd_kernel) instead of
    relying on AD — the direct forward is a Pallas kernel with no JVP rule,
    and the gather form's transpose (scatter-add) was the train-step
    bottleneck it replaces. RoIs get zero gradient like every other impl
    (bin bounds are integer-valued, piecewise constant in the box).
    """
    return psroi_pool_batched_direct(features, rois, spatial_scale,
                                     group_size)


def _direct_ad_fwd(features, rois, spatial_scale, group_size):
    out = psroi_pool_batched_direct(features, rois, spatial_scale, group_size)
    # zero-size carrier for the feature shape/dtype (custom_vjp residuals
    # must be jax types; the maps themselves are NOT needed for the bwd)
    ref = jnp.zeros((0,) + features.shape[1:], features.dtype)
    return out, (rois, ref)


def _direct_ad_bwd(spatial_scale, group_size, res, g):
    rois, ref = res
    h, w, c = ref.shape[1:]
    fdtype = ref.dtype
    b = rois.shape[0]
    k = group_size
    d = c // (k * k)
    n = rois.shape[1]
    hs, he, ws, we = jax.vmap(
        lambda r: _roi_bounds(r, spatial_scale, k, h, w))(rois)
    r, cind = jax.vmap(
        lambda a, bb, c0, c1: _interval_indicators(a, bb, c0, c1, h, w)
    )(hs, he, ws, we)
    r = r.transpose(0, 2, 1, 3)                        # (B, k, N, H)
    cind = cind.transpose(0, 2, 1, 3)                  # (B, k, N, W)
    area = jax.vmap(_bin_areas)(hs, he, ws, we)[..., None]  # (B, N, k, k, 1)
    ghat = jnp.where(area > 0,
                     g.astype(jnp.float32) / jnp.maximum(area, 1.0), 0.0)
    ghat = ghat.transpose(0, 2, 3, 1, 4)               # (B, k, k, N, D)

    dslabs = pl.pallas_call(
        functools.partial(_psroi_direct_bwd_kernel, w=w, d=d),
        grid=(b, k, k),
        in_specs=[
            pl.BlockSpec((1, 1, n, h), lambda bi, ph, pw: (bi, ph, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, w), lambda bi, ph, pw: (bi, pw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n, d),
                         lambda bi, ph, pw: (bi, ph, pw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, d * w),
                               lambda bi, ph, pw: (bi, ph * k + pw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k * k, h, d * w), fdtype),
        interpret=_use_interpret(),
    )(r, cind, ghat)
    # inverse of the forward's slab transpose: (B, k^2, H, (d, x)) -> NHWC
    df = (dslabs.reshape(b, k * k, h, d, w).transpose(0, 2, 4, 1, 3)
          .reshape(b, h, w, c))
    return df, jnp.zeros_like(rois)


psroi_pool_batched_direct_ad.defvjp(_direct_ad_fwd, _direct_ad_bwd)


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

    Implementations (all oracle-pinned to the same Caffe kernel math);
    v5e chained-iteration times at the production shapes (300 RoIs, 38x68
    map; cls k^2*31 / bbox k^2*8 / track k^2*4 channels):

    | impl      | cls   | bbox  | track | notes                            |
    |-----------|-------|-------|-------|----------------------------------|
    | xla       | 0.387 | 0.285 | 0.317 | SAT + flattened gathers (auto)   |
    | mm        | 0.510 |   —   |   —   | SAT bilinear-form einsum         |
    | pallas_mm | 0.453 | 0.214 | 0.379 | per-bin MXU matmul kernel        |
    | pallas    | 0.547 | 0.465 | 0.468 | serial per-RoI gather kernel     |

    "auto" = xla: it wins the dominant cls head and is within noise
    elsewhere; the matmul kernel (pallas_mm) is the vectorized-over-RoIs
    kernel design and stays selectable. All ~0.3-0.5 ms figures are
    dispatch-overhead-dominated (SAT HBM traffic alone is ~20 us), so PSRoI
    is <2% of the video-mode pipeline either way.
    """
    if impl == "auto":
        impl = "xla"
    if impl == "xla":
        return psroi_pool_xla(features, rois, spatial_scale, group_size)
    if impl == "mm":
        return psroi_pool_mm(features, rois, spatial_scale, group_size)
    if impl == "pallas_mm":
        return psroi_pool_pallas_mm(features, rois, spatial_scale, group_size)
    if impl == "pallas":
        return psroi_pool_pallas(features, rois, spatial_scale, group_size)
    raise ValueError(f"unknown psroi impl {impl!r}")
