"""FlowNet-style cross-frame correlation.

TPU-native replacement for the reference's CUDA correlation extension
(ref: lib/model/correlation/src/corr_cuda_kernel.cu, functions/correlation.py,
modules/correlation.py — the flownet2 lineage with pad_size=8, kernel_size=1,
max_displacement=8, stride1=1, stride2=2). For each spatial position the op
computes the channel-mean dot product between frame-t features and frame-t+τ
features at every displacement in the (2*d/s+1)^2 window:

  corr[y, x, j(dy,dx)] = (1/C) * sum_c f1[y, x, c] * f2[y+dy, x+dx, c]

with dy, dx ∈ {-d, -d+s, ..., d} and zero padding outside f2. D&T paper §3.2
uses d=8, s=2 => 81 correlation channels per feature scale.

Two implementations:

* `correlation_xla` — shifted multiply-reduce over the displacement window
  (the parity oracle; 81 fused slice-multiply-reduces).
* `correlation_pallas` — fused kernel: grid over channel blocks; each program
  holds an f1 block and the zero-padded f2 block in VMEM and accumulates the
  full 81-channel correlation volume in-place, reading each input byte from
  HBM exactly once (the XLA form re-reads both feature maps per
  displacement). Backward is pinned to the XLA oracle via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _offsets(max_displacement: int, stride: int):
    return list(range(-max_displacement, max_displacement + 1, stride))


def num_corr_channels(max_displacement: int, stride: int) -> int:
    return len(_offsets(max_displacement, stride)) ** 2


def correlation_mm(f1: jnp.ndarray, f2: jnp.ndarray,
                   max_displacement: int = 8, stride: int = 2) -> jnp.ndarray:
    """MXU (banded-matmul) correlation. (H, W, C) x2 -> (H, W, D^2).

    For each row y and vertical displacement dy, the row-vs-shifted-row
    product matrix Cm[y] = f1[y] @ f2[y+dy]^T (a (W, C) x (C, W+2d) matmul
    — MXU work) contains every horizontal displacement as a diagonal; the
    needed diagonals are extracted with a constant 0/1 selection
    contraction (no gathers). ~(2d/s+1) x FLOP overcompute vs the pointwise
    form, but MXU FLOPs are ~20x cheaper than VPU ones, and the whole op
    becomes two dense contractions per dy instead of 81 shifted
    multiply-reduces.
    """
    h, w, c = f1.shape
    d = max_displacement
    offs = _offsets(d, stride)
    nd = len(offs)
    v = w + 2 * d
    f2p = jnp.pad(f2, ((d, d), (d, d), (0, 0)))
    # sel[x, vv, i] = 1 iff vv == x + offs[i] + d  (diagonal selector)
    sel = (jnp.arange(v)[None, :, None]
           == jnp.arange(w)[:, None, None]
           + (jnp.asarray(offs) + d)[None, None, :]).astype(jnp.float32)
    outs = []
    for dy in offs:
        b = jax.lax.slice(f2p, (d + dy, 0, 0), (d + dy + h, v, c))
        cm = jnp.einsum("ywc,yvc->ywv", f1, b,
                        preferred_element_type=jnp.float32)   # (H, W, V)
        outs.append(jnp.einsum("ywv,wvj->ywj", cm, sel,
                               precision=jax.lax.Precision.HIGHEST))
    out = jnp.concatenate(outs, axis=-1)                      # dy-major order
    return (out / jnp.float32(c)).astype(f1.dtype)


def correlation_mm_diag(f1: jnp.ndarray, f2: jnp.ndarray,
                        max_displacement: int = 8, stride: int = 2
                        ) -> jnp.ndarray:
    """Banded-matmul correlation with STRIDED-SLICE diagonal extraction.

    Same per-dy MXU band as correlation_mm, but the horizontal-displacement
    diagonals are read out with strided slices instead of the 0/1 selector
    contraction: band[y, x, x + dx + d] flattens to index x*(V+1) + (dx+d)
    of band.reshape(H, W*V) — constant stride V+1, one lax.slice per dx.
    The selector einsum was the mm form's cost center (a (W,V)x(V,J)
    per-row contraction at HIGHEST precision); a strided slice moves no
    FLOPs at all.
    """
    h, w, c = f1.shape
    d = max_displacement
    offs = _offsets(d, stride)
    v = w + 2 * d
    f2p = jnp.pad(f2, ((d, d), (d, d), (0, 0)))
    outs = []
    for dy in offs:
        b = jax.lax.slice(f2p, (d + dy, 0, 0), (d + dy + h, v, c))
        band = jnp.einsum("ywc,yvc->ywv", f1, b,
                          preferred_element_type=jnp.float32)  # (H, W, V)
        flat = band.reshape(h, w * v)
        for dx in offs:
            k = dx + d
            outs.append(jax.lax.slice(flat, (0, k),
                                      (h, k + (w - 1) * (v + 1) + 1),
                                      (1, v + 1)))             # (H, W)
    out = jnp.stack(outs, axis=-1)                             # dy-major
    return (out / jnp.float32(c)).astype(f1.dtype)


def correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray,
                    max_displacement: int = 8, stride: int = 2) -> jnp.ndarray:
    """Shifted multiply-reduce correlation. (H, W, C) x2 -> (H, W, D^2)."""
    h, w, c = f1.shape
    d = max_displacement
    offs = _offsets(d, stride)
    f2p = jnp.pad(f2, ((d, d), (d, d), (0, 0)))
    acc = f1.astype(jnp.float32)
    outs = []
    for dy in offs:
        for dx in offs:
            sl = jax.lax.slice(f2p, (d + dy, d + dx, 0), (d + dy + h, d + dx + w, c))
            outs.append(jnp.mean(acc * sl.astype(jnp.float32), axis=-1))
    return jnp.stack(outs, axis=-1).astype(f1.dtype)


# ---------------------------------------------------------------------------
# Pallas MXU kernel: banded matmul with VMEM-resident intermediates
# ---------------------------------------------------------------------------

def _corr_mm_kernel(f1_ref,   # VMEM (TH, W, C) one row tile of f1
                    f2p_ref,  # VMEM (1, TH + 2d, V, C) f2 tile w/ halo, V = W + 2d
                    out_ref,  # VMEM (D^2, TH, W) this tile's output
                    *, w: int, dmax: int, stride: int, th: int):
    """correlation_mm's algorithm INSIDE one kernel: per vertical
    displacement dy, a row-batched MXU contraction f1[y] @ f2p[y+dy]^T
    produces the (TH, W, V) product band, and each horizontal displacement
    is read off as a diagonal via a constant 0/1 mask-reduce (VPU). The
    band never leaves VMEM — the XLA mm form materializes all 9 of them
    plus the selector contraction through HBM, which is where its time
    goes (VERDICT round-2 weak #5).

    Grid is over ROW TILES, each program reading its own halo-padded f2
    tile: output tiles are disjoint, so programs run without cross-step
    accumulation. The first cut tiled CHANNELS instead — its shared out_ref
    accumulator serialized the grid and re-staged the band per block:
    1.7 ms at c4 vs 0.5 ms for this form (and >16 MB VMEM at
    channel_block=512 -> remote-compile 500s)."""
    offs = _offsets(dmax, stride)
    nd = len(offs)
    v = w + 2 * dmax
    f1 = f1_ref[:]                                     # (TH, W, C) bf16 ok
    # diag[x, vv] per dx is constant: vv == x + dx + d
    xs = jax.lax.broadcasted_iota(jnp.int32, (w, v), 0)
    vs = jax.lax.broadcasted_iota(jnp.int32, (w, v), 1)
    for iy, dy in enumerate(offs):
        # tile-local rows aligned with this tile's f1 rows, shifted by dy
        # (static slice: the tile carries a 2d-row halo)
        f2s = f2p_ref[0, dy + dmax:dy + dmax + th, :, :]     # (TH, V, C)
        band = jax.lax.dot_general(
            f1, f2s,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (TH, W, V) on MXU
        for ix, dx in enumerate(offs):
            mask = (vs == xs + dx + dmax).astype(jnp.float32)  # (W, V)
            out_ref[iy * nd + ix] = jnp.sum(band * mask[None], axis=-1)


_VMEM_LIMIT = 100 << 20   # v5e VMEM is 128 MB; the default scoped limit (16
                          # MB) forced 8-row tiles with a 2d-row halo, and the
                          # resulting 5-deep grid + stacked overlapping f2
                          # tiles ran 4-8x slower than whole-frame tiles
                          # (BASELINE.md round 4: c3p rb=8 1.21 ms vs
                          # whole-frame 0.18 ms at 8 frames)


def _auto_row_block(h: int, w: int, c: int, nd2: int, d: int,
                    itemsize: int) -> int:
    """Largest row tile whose working set fits scoped VMEM.

    Whole-frame tiles (ht=1) kill both the halo overcompute and the stacked
    overlapping-tile materialization; fall back to multiples of 8 only when
    a frame genuinely cannot fit (not the case at any production scale).

    Buffer model: a grid of 1 has no revolving pipeline, so the whole-frame
    candidate is charged single-buffered; multi-tile candidates pay the 2x
    double-buffer. The minimum (th=8) tile is accepted against the full
    hard limit — and if even that exceeds it, fail loudly at trace time
    instead of as an opaque Mosaic VMEM error (ADVICE round 4)."""
    v = w + 2 * d
    budget = (_VMEM_LIMIT * 3) // 4

    def need(th, buffers):
        tile = (th * w * c + (th + 2 * d) * v * c) * itemsize + nd2 * th * w * 4
        return buffers * tile + th * w * v * 4        # + the (TH, W, V) band
    if need(h, 1) <= budget:                          # grid of 1: no pipeline
        return h
    for th in range((h // 8) * 8, 0, -8):             # multiple-of-8 fallback
        if need(th, 2) <= budget:
            return th
    if need(8, 2) > _VMEM_LIMIT:
        raise ValueError(
            f"correlation_pallas_mm: no row tile of ({h}, {w}, {c}) x "
            f"itemsize {itemsize} fits the {_VMEM_LIMIT >> 20} MB VMEM "
            f"limit (min tile needs {need(8, 2) >> 20} MB); use impl='mm'")
    return 8


def _correlation_pallas_mm_raw(f1: jnp.ndarray, f2: jnp.ndarray,
                               max_displacement: int, stride: int,
                               row_block: int | None = None) -> jnp.ndarray:
    h, w, c = f1.shape
    d = max_displacement
    nd2 = len(_offsets(d, stride)) ** 2
    # Mosaic constraint: the out block's sublane dim (th) must be a
    # multiple of 8 or the whole padded dim — whole-frame th (auto) and
    # multiples of 8 both satisfy it
    if row_block is None:
        row_block = _auto_row_block(h, w, c, nd2, d, f1.dtype.itemsize)
    th = min(row_block, h)
    ht = -(-h // th)                                  # row tiles (ceil)
    hp = ht * th
    v = w + 2 * d
    # bottom-pad so the last tile's shifted f2 reads stay in bounds
    f2p = jnp.pad(f2, ((d, hp - h + d), (d, d), (0, 0)))
    if ht == 1:
        # whole-frame tile: no overlap to materialize
        f2tiles = f2p[None]
    else:
        # overlapping row tiles with a 2d halo (static slices, ~(th+2d)/th x
        # the f2 bytes, written + re-read through HBM — why ht=1 is preferred)
        f2tiles = jnp.stack([jax.lax.slice(f2p, (i * th, 0, 0),
                                           (i * th + th + 2 * d, v, c))
                             for i in range(ht)])     # (HT, TH+2d, V, C)

    out = pl.pallas_call(
        functools.partial(_corr_mm_kernel, w=w, dmax=d, stride=stride, th=th),
        grid=(ht,),
        in_specs=[
            pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th + 2 * d, v, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nd2, th, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd2, hp, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_use_interpret(),
    )(f1, f2tiles)
    out = out[:, :h]                                  # drop row padding
    # channel-first accumulation (aligned (H, W) tile writes) -> channel-last
    return (out.transpose(1, 2, 0) / jnp.float32(c)).astype(f1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas_mm(f1, f2, max_displacement: int = 8, stride: int = 2):
    return _correlation_pallas_mm_raw(f1, f2, max_displacement, stride)


def _corr_mm_fwd(f1, f2, max_displacement, stride):
    return _correlation_pallas_mm_raw(f1, f2, max_displacement, stride), (f1, f2)

# (defvjp registered below, after the shared _corr_bwd is defined)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _corr_kernel(f1_ref,   # VMEM (H, W, CB)
                 f2p_ref,  # VMEM (H + 2d, W + 2d, CB)
                 out_ref,  # VMEM (D^2, H, W) float32 accumulator
                 *, h: int, w: int, dmax: int, stride: int):
    cb = pl.program_id(0)

    @pl.when(cb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f1 = f1_ref[:].astype(jnp.float32)
    offs = _offsets(dmax, stride)
    j = 0
    for dy in offs:
        for dx in offs:
            f2s = f2p_ref[dy + dmax:dy + dmax + h,
                          dx + dmax:dx + dmax + w, :].astype(jnp.float32)
            out_ref[j, :, :] += jnp.sum(f1 * f2s, axis=-1)
            j += 1


def _correlation_pallas_raw(f1: jnp.ndarray, f2: jnp.ndarray,
                            max_displacement: int, stride: int,
                            channel_block: int = 128) -> jnp.ndarray:
    h, w, c = f1.shape
    d = max_displacement
    nd = len(_offsets(d, stride)) ** 2
    cb = min(channel_block, c)
    if c % cb:  # zero-pad channels; zeros are inert under sum
        pad = cb - c % cb
        f1 = jnp.pad(f1, ((0, 0), (0, 0), (0, pad)))
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, pad)))
    n_blocks = f1.shape[2] // cb
    f2p = jnp.pad(f2, ((d, d), (d, d), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_corr_kernel, h=h, w=w, dmax=d, stride=stride),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((h, w, cb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h + 2 * d, w + 2 * d, cb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nd, h, w), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd, h, w), jnp.float32),
        interpret=_use_interpret(),
    )(f1, f2p)
    # channel-first accumulation (aligned (H, W) tile writes) -> channel-last
    return (out.transpose(1, 2, 0) / jnp.float32(c)).astype(f1.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1, f2, max_displacement: int = 8, stride: int = 2):
    return _correlation_pallas_raw(f1, f2, max_displacement, stride)


def _corr_fwd(f1, f2, max_displacement, stride):
    return _correlation_pallas_raw(f1, f2, max_displacement, stride), (f1, f2)


def _corr_bwd(max_displacement, stride, res, g):
    # mm-form vjp: einsum AD keeps the backward on the MXU (the xla shifted
    # form's vjp materializes 81 slice products and its forward already
    # exceeds the remote compile service at the c4/c5 production shape)
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_mm(a, b, max_displacement, stride), f1, f2)
    return vjp(g.astype(f1.dtype))


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)
correlation_pallas_mm.defvjp(_corr_mm_fwd, _corr_bwd)


def correlation(f1, f2, max_displacement: int = 8, stride: int = 2,
                impl: str = "auto") -> jnp.ndarray:
    """Dispatching entry point; (H, W, C) x2 -> (H, W, (2d/s+1)^2).

    auto on TPU = "pallas_mm" (the banded-matmul algorithm INSIDE a Pallas
    kernel, row-tiled with the product band VMEM-resident). v5e, 8-frame
    vmapped bf16 chunks (tools/bench_correlation.py; BASELINE.md round 3):
      chained timing — c4/c5 38x68x1024: pallas_mm 1.03 ms vs mm 1.19-1.27
      vs pallas (VPU) 3.5 ms; c3p 19x34x512: pallas_mm 0.53 vs mm 0.79,
      pallas 0.69. (xla exceeds the remote compile service at c4/c5.)
      A forced-fetch spot check in a quieter tunnel window gave a larger
      margin (0.48 vs 2.7 ms at c4); the chained numbers are the
      conservative ones. pallas_mm <= mm at every scale in every window.
    Backward for both Pallas kernels rides correlation_mm's einsum AD (MXU).
    The XLA shifted form remains the parity oracle.
    """
    assert f1.shape == f2.shape, (f1.shape, f2.shape)
    if impl == "auto":
        impl = "pallas_mm" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return correlation_xla(f1, f2, max_displacement, stride)
    if impl == "mm":
        return correlation_mm(f1, f2, max_displacement, stride)
    if impl == "mm_diag":
        return correlation_mm_diag(f1, f2, max_displacement, stride)
    if impl == "pallas":
        return correlation_pallas(f1, f2, max_displacement, stride)
    if impl == "pallas_mm":
        return correlation_pallas_mm(f1, f2, max_displacement, stride)
    raise ValueError(f"unknown correlation impl {impl!r}")
