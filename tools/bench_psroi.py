#!/usr/bin/env python
"""Benchmark every PSRoI implementation at production shapes on the TPU.

Production shape: conv5 cls maps 38x68 x k^2*(C=31) = 1519 channels,
300 RoIs (and the bbox/track head shapes). Chained-iteration timing
(dtt.utils.timing) — the axon tunnel defers programs, so each iteration's
output feeds the next iteration's carry.
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
    from dtt.ops.psroi import psroi_pool
    from dtt.utils.timing import chained_time

    print(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    h, w, k = 38, 68, 7
    rois = jnp.asarray(np.stack([
        rng.uniform(0, 900, 300), rng.uniform(0, 500, 300),
        rng.uniform(100, 1080, 300), rng.uniform(100, 600, 300),
    ], axis=1).astype(np.float32))

    for name, d in [("cls C=31", 31), ("bbox 4nb=8", 8), ("track 4", 4)]:
        feats = jnp.asarray(rng.randn(h, w, k * k * d).astype(np.float32))
        for impl in ("xla", "mm", "pallas", "pallas_mm"):
            def step(c, feats=feats, impl=impl):
                out = psroi_pool(feats + c * 1e-12, rois, 1 / 16.0, k, impl)
                return c + jnp.sum(out) * 1e-9
            try:
                t = chained_time(step, iters=20)
                print(f"{name:12s} {impl:10s} {t * 1e3:7.3f} ms")
            except Exception as e:
                print(f"{name:12s} {impl:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
