"""Profile the PSRoI-heads stage internals at video-chunk scale (round-3
VERDICT task 2: the heads stage is ~26% of the inference step — find what
inside it dominates before optimizing).

Times, at the production 32-pair video-chunk shape (32 frames, 300 RoIs,
38x68 stride-16 maps):
  - SAT construction per head (the 2-D cumsum over the f32 score maps)
  - psroi_pool_batched per head (SAT + flat 4-corner gathers)
  - a SIMULATED fused-heads pool: one gather pass over a single
    (B, H, W, k^2*(31+8+4)) map — what a conv-level head fusion would buy
    (each gather row pads to the 128-lane tile, so three D=31/8/4 gathers
    move ~3x the bytes of one D=43 gather)
  - the vote (bin mean) + softmax + decode + per-class NMS tail

Chained-iteration timing (dtt.utils.timing.chained_time — see CLAUDE.md on
the deferring tunnel runtime). All operands go through chained_time's
`args` (closures become compile-request constants -> HTTP 413 at these
sizes). Run on the TPU host:
  python tools/profile_heads.py [--frames 32] [--rois 300]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dtt.core.config import Config
from dtt.ops.psroi import _sat, psroi_pool_batched
from dtt.utils.timing import chained_time

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=32)
p.add_argument("--rois", type=int, default=300)
p.add_argument("--iters", type=int, default=10)
p.add_argument("--only", default=None, help="substring filter on probe names")
args = p.parse_args()

cfg = Config()
k = cfg.model.roi.ps_grid
h, w = cfg.input.canvas_height // 16, cfg.input.canvas_width // 16
B, N = args.frames, args.rois
scale = 1.0 / 16.0
rng = np.random.RandomState(0)

HEADS = {"cls": cfg.model.num_classes, "bbox": 8, "track": 4}
maps = {name: jnp.asarray(rng.randn(B, h, w, k * k * d).astype(np.float32))
        for name, d in HEADS.items()}
fused_d = sum(HEADS.values())
maps["fused43"] = jnp.asarray(
    rng.randn(B, h, w, k * k * fused_d).astype(np.float32))
maps["fused39"] = jnp.asarray(
    rng.randn(B, h, w, k * k * 39).astype(np.float32))

x1 = rng.uniform(0, (w - 8) * 16, (B, N))
y1 = rng.uniform(0, (h - 8) * 16, (B, N))
rois = np.stack([x1, y1, x1 + rng.uniform(32, 500, (B, N)),
                 y1 + rng.uniform(32, 300, (B, N))], axis=-1)
rois = jnp.asarray(rois.astype(np.float32))


def t(name, fn, iters=args.iters):
    if args.only and args.only not in name:
        return None
    ms = chained_time(fn, iters=iters, args=(maps, rois)) * 1e3
    print(f"{name:34s} {ms:7.2f} ms", flush=True)
    return ms


print(f"heads-stage profile: B={B} frames, N={N} RoIs, {h}x{w} maps", flush=True)

# SAT construction alone (vmapped 2-D cumsum, f32)
for name in ("cls", "fused43"):
    t(f"SAT only [{name}]",
      lambda c, m, r, name=name: jnp.sum(
          jax.vmap(_sat)(m[name] + c * 1e-20)) * 1e-12 + c * 1e-9)

# full batched pool per head (SAT + gathers + area div)
for name in ("cls", "bbox", "track", "fused43", "fused39"):
    t(f"psroi_pool_batched [{name}]",
      lambda c, m, r, name=name: jnp.sum(
          psroi_pool_batched(m[name] + c * 1e-20, r, scale, k)) * 1e-9 + c * 1e-9)

# three separate heads vs the simulated fused pass
def three_heads(c, m, r):
    s = 0.0
    for name in ("cls", "bbox", "track"):
        s += jnp.sum(psroi_pool_batched(m[name] + c * 1e-20, r, scale, k))
    return s * 1e-9 + c * 1e-9

t("three heads (today)", three_heads)

# fused39 (one conv for cls+bbox) + separate track pool: the zero-interleave
# candidate — cls/bbox share the `reduced` input so their convs can fuse at
# the WEIGHT level; track comes from a different input
def fused39_plus_track(c, m, r):
    s = jnp.sum(psroi_pool_batched(m["fused39"] + c * 1e-20, r, scale, k))
    s += jnp.sum(psroi_pool_batched(m["track"] + c * 1e-20, r, scale, k))
    return s * 1e-9 + c * 1e-9

t("fused39 + track (2 pools)", fused39_plus_track)

# pooled -> vote -> softmax tail (cheap check)
def vote_softmax(c, m, r):
    pooled = psroi_pool_batched(m["cls"] + c * 1e-20, r, scale, k)
    return jnp.sum(jax.nn.softmax(pooled.mean(axis=(2, 3)), -1)) * 1e-6 + c * 1e-9
t("cls pool + vote + softmax", vote_softmax)

# fused pass INCLUDING the bin-interleave of three separate conv outputs
# (what map-level fusion costs without conv-weight-level fusion)
def interleave_then_pool(c, m, r):
    per_bin = [m[n].reshape(B, h, w, k * k, HEADS[n]) for n in HEADS]
    fused = jnp.concatenate(per_bin, axis=-1).reshape(B, h, w, -1)
    return jnp.sum(psroi_pool_batched(fused + c * 1e-20, r, scale,
                                      k)) * 1e-9 + c * 1e-9
t("interleave + fused pool", interleave_then_pool)

# 2-way interleave: fused39 conv output + track maps -> one D=43 pool
def interleave2_then_pool(c, m, r):
    fb = m["fused39"].reshape(B, h, w, k * k, 39)
    tb = m["track"].reshape(B, h, w, k * k, 4)
    fused = jnp.concatenate([fb, tb], axis=-1).reshape(B, h, w, -1)
    return jnp.sum(psroi_pool_batched(fused + c * 1e-20, r, scale,
                                      k)) * 1e-9 + c * 1e-9
t("interleave2(39+4) + fused pool", interleave2_then_pool)

# bf16 maps into the SAT (halves the cumsum input read traffic)
t("psroi_pool_batched [cls, bf16 in]",
  lambda c, m, r: jnp.sum(psroi_pool_batched(
      m["cls"].astype(jnp.bfloat16) + c * jnp.bfloat16(1e-8), r, scale, k)
      ) * 1e-9 + c * 1e-9)

# corner-fused gathers: per bin ONE gather with 4x indices (same d-channel
# table — round 2's negative result fused across BINS, growing the table
# 49x; this keeps the table and cuts 196 gather dispatches to 49)
def pool_corner_fused(feats, r, c):
    from dtt.ops.psroi import _roi_bounds, _sat
    b_, h_, w_, ch = feats.shape
    d_ = ch // (k * k)
    hs, he, ws, we = jax.vmap(
        lambda rr: _roi_bounds(rr, scale, k, h_, w_))(r)
    sat = jax.vmap(_sat)(feats)
    h1, w1 = h_ + 1, w_ + 1
    base = (jnp.arange(b_) * (h1 * w1))[:, None]
    s = 0.0
    for ph in range(k):
        for pw in range(k):
            off = (ph * k + pw) * d_
            flat = jax.lax.slice_in_dim(sat, off, off + d_, axis=3)
            flat = flat.reshape(b_ * h1 * w1, d_)
            a, bb = hs[:, :, ph], he[:, :, ph]
            c0, c1 = ws[:, :, pw], we[:, :, pw]
            idx = jnp.stack([(base + bb * w1 + c1).reshape(-1),
                             (base + a * w1 + c1).reshape(-1),
                             (base + bb * w1 + c0).reshape(-1),
                             (base + a * w1 + c0).reshape(-1)])  # (4, B*N)
            g = flat[idx.reshape(-1)].reshape(4, -1, d_)
            total = g[0] - g[1] - g[2] + g[3]
            area = ((bb - a) * (c1 - c0)).astype(jnp.float32).reshape(-1)
            s += jnp.sum(jnp.where(area[:, None] > 0,
                                   total / jnp.maximum(area[:, None], 1.0), 0.0))
    return s


t("corner-fused pool [cls]",
  lambda c, m, r: pool_corner_fused(m["cls"] + c * 1e-20, r, c) * 1e-9 + c * 1e-9)
t("corner-fused pool [fused43]",
  lambda c, m, r: pool_corner_fused(m["fused43"] + c * 1e-20, r, c) * 1e-9 + c * 1e-9)


def corner_fused_three(c, m, r):
    s = 0.0
    for name in ("cls", "bbox", "track"):
        s += pool_corner_fused(m[name] + c * 1e-20, r, c)
    return s * 1e-9 + c * 1e-9

t("corner-fused three heads", corner_fused_three)


def interleave_corner_fused(c, m, r):
    per_bin = [m[n].reshape(B, h, w, k * k, HEADS[n]) for n in HEADS]
    fused = jnp.concatenate(per_bin, axis=-1).reshape(B, h, w, -1)
    return pool_corner_fused(fused + c * 1e-20, r, c) * 1e-9 + c * 1e-9

t("interleave + corner-fused pool", interleave_corner_fused)

# frame-batched Pallas MXU pooling (bilinear-form matmuls per (frame, bin))
from dtt.ops.psroi import psroi_pool_batched_pallas_mm
for name in ("cls", "track", "fused43"):
    t(f"batched_pallas_mm [{name}]",
      lambda c, m, r, name=name: jnp.sum(
          psroi_pool_batched_pallas_mm(m[name] + c * 1e-20, r, scale, k)
          ) * 1e-9 + c * 1e-9)

# SAT-free interval-indicator MXU kernel (psroi_pool_batched_direct):
# raw maps, bf16-capable — no cumsum, no f32-HIGHEST matmuls
from dtt.ops.psroi import psroi_pool_batched_direct
for name in ("cls", "fused43"):
    t(f"batched_direct [{name}, f32]",
      lambda c, m, r, name=name: jnp.sum(
          psroi_pool_batched_direct(m[name] + c * 1e-20, r, scale, k)
          ) * 1e-9 + c * 1e-9)
    t(f"batched_direct [{name}, bf16]",
      lambda c, m, r, name=name: jnp.sum(
          psroi_pool_batched_direct(
              m[name].astype(jnp.bfloat16) + c * jnp.bfloat16(1e-8),
              r, scale, k).astype(jnp.float32)) * 1e-9 + c * 1e-9)
