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
the deferring tunnel runtime). Run on the TPU host:
  python tools/profile_heads.py [--frames 32] [--rois 300]
"""

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
maps["fused(43)"] = jnp.asarray(
    rng.randn(B, h, w, k * k * fused_d).astype(np.float32))

x1 = rng.uniform(0, (w - 8) * 16, (B, N))
y1 = rng.uniform(0, (h - 8) * 16, (B, N))
rois = np.stack([x1, y1, x1 + rng.uniform(32, 500, (B, N)),
                 y1 + rng.uniform(32, 300, (B, N))], axis=-1)
rois = jnp.asarray(rois.astype(np.float32))


def t(name, fn, iters=args.iters):
    ms = chained_time(fn, iters=iters) * 1e3
    print(f"{name:34s} {ms:7.2f} ms", flush=True)
    return ms


print(f"heads-stage profile: B={B} frames, N={N} RoIs, {h}x{w} maps", flush=True)

# SAT construction alone (vmapped 2-D cumsum, f32)
for name in ("cls", "fused(43)"):
    m = maps[name]
    t(f"SAT only [{name}]",
      lambda c, m=m: jnp.sum(jax.vmap(_sat)(m + c * 1e-20)) * 1e-12 + c * 1e-9)

# full batched pool per head (SAT + gathers + area div)
for name in ("cls", "bbox", "track", "fused(43)"):
    m = maps[name]
    t(f"psroi_pool_batched [{name}]",
      lambda c, m=m: jnp.sum(
          psroi_pool_batched(m + c * 1e-20, rois, scale, k)) * 1e-9 + c * 1e-9)

# three separate heads vs the simulated fused pass
def three_heads(c):
    s = 0.0
    for name in ("cls", "bbox", "track"):
        s += jnp.sum(psroi_pool_batched(maps[name] + c * 1e-20, rois, scale, k))
    return s * 1e-9 + c * 1e-9

t("three heads (today)", three_heads)

# pooled -> vote -> softmax tail (cheap check)
def vote_softmax(c):
    pooled = psroi_pool_batched(maps["cls"] + c * 1e-20, rois, scale, k)
    return jnp.sum(jax.nn.softmax(pooled.mean(axis=(2, 3)), -1)) * 1e-6 + c * 1e-9
t("cls pool + vote + softmax", vote_softmax)

# bf16 maps into the SAT (halves the cumsum input read traffic)
maps_bf = {n: m.astype(jnp.bfloat16) for n, m in maps.items()}
t("psroi_pool_batched [cls, bf16 in]",
  lambda c: jnp.sum(psroi_pool_batched(
      maps_bf["cls"] + c * jnp.bfloat16(1e-8), rois, scale, k)) * 1e-9 + c * 1e-9)
