#!/usr/bin/env python
"""Benchmark PSRoI over a BATCH of frames (the video-pipeline shape).

The pipeline calls psroi under jax.vmap over 8 frames; profiling shows that
costs ~26 ms per chunk (the batched gather lowers badly). Candidates:
vmap(xla) [status quo], flat-gather with batch-offset indices, vmap(mm),
vmap(pallas_mm).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dtt.ops import psroi as ps
    from dtt.utils.timing import chained_time

    print(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    b, h, w, k, n = 8, 38, 68, 7, 300

    rois = jnp.asarray(np.stack([
        rng.uniform(0, 900, (b, n)), rng.uniform(0, 500, (b, n)),
        rng.uniform(100, 1080, (b, n)), rng.uniform(100, 600, (b, n)),
    ], axis=2).astype(np.float32))

    def batched_flat(features, rois, spatial_scale, k):
        """Single gather over the flattened (B*(H+1)*(W+1)) axis."""
        bb, hh, ww, c = features.shape
        d = c // (k * k)
        sat = jax.vmap(ps._sat)(features)              # (B, H+1, W+1, C)
        hs, he, ws, we = jax.vmap(
            lambda r: ps._roi_bounds(r, spatial_scale, k, hh, ww))(rois)
        h1, w1 = hh + 1, ww + 1
        base = (jnp.arange(bb) * (h1 * w1))[:, None]
        outs = []
        for ph in range(k):
            row = []
            for pw in range(k):
                off = (ph * k + pw) * d
                flat = jax.lax.slice_in_dim(sat, off, off + d, axis=3)
                flat = flat.reshape(bb * h1 * w1, d)
                a2, b2 = hs[:, :, ph], he[:, :, ph]
                c0, c1 = ws[:, :, pw], we[:, :, pw]
                i00 = (base + a2 * w1 + c0).reshape(-1)
                i01 = (base + a2 * w1 + c1).reshape(-1)
                i10 = (base + b2 * w1 + c0).reshape(-1)
                i11 = (base + b2 * w1 + c1).reshape(-1)
                total = (flat[i11] - flat[i01] - flat[i10] + flat[i00])
                area = ((b2 - a2) * (c1 - c0)).astype(jnp.float32).reshape(-1)
                row.append(jnp.where(area[:, None] > 0,
                                     total / jnp.maximum(area[:, None], 1.0),
                                     0.0))
            outs.append(jnp.stack(row, axis=1))
        out = jnp.stack(outs, axis=1)                   # (B*N, k, k, D)
        return out.reshape(bb, n, k, k, d).astype(features.dtype)

    for name, d in [("cls31", 31), ("bbox8", 8)]:
        feats = jnp.asarray(rng.randn(b, h, w, k * k * d).astype(np.float32))
        variants = {
            "vmap_xla": lambda f, r: jax.vmap(
                lambda ff, rr: ps.psroi_pool_xla(ff, rr, 1 / 16.0, k))(f, r),
            "flat_gather": lambda f, r: batched_flat(f, r, 1 / 16.0, k),
            "vmap_mm": lambda f, r: jax.vmap(
                lambda ff, rr: ps.psroi_pool_mm(ff, rr, 1 / 16.0, k))(f, r),
            "vmap_pallas_mm": lambda f, r: jax.vmap(
                lambda ff, rr: ps.psroi_pool_pallas_mm(ff, rr, 1 / 16.0, k))(f, r),
        }
        ref = None
        for vn, fn in variants.items():
            try:
                out = jax.jit(fn)(feats, rois)
                out_np = np.asarray(out)
                if ref is None:
                    ref = out_np
                else:
                    np.testing.assert_allclose(out_np, ref, rtol=2e-4,
                                               atol=2e-4)
                def step(c, fn=fn):
                    o = fn(feats + c * 1e-12, rois)
                    return c + jnp.sum(o) * 1e-9
                t = chained_time(step, iters=10)
                print(f"{name} {vn:16s} {t * 1e3:8.3f} ms")
            except Exception as e:
                print(f"{name} {vn:16s} FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
