#!/usr/bin/env python
"""Benchmark correlation implementations at the video-chunk shape.

The pipeline correlates 3 scales over an 8-pair chunk (vmapped); profiling
attributed ~12 ms/chunk to correlation+track maps. Compares xla / pallas /
mm per scale, vmapped over 8 frames, with cosine-normalized bf16 inputs
(the production dtype).
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
    from dtt.ops.correlation import (correlation_mm, correlation_pallas,
                                     correlation_pallas_mm, correlation_xla)
    from dtt.utils.timing import chained_time

    print(f"backend={jax.default_backend()}")
    rng = np.random.RandomState(0)
    b = 8
    scales = [("c3p 19x34x512", 19, 34, 512),
              ("c4  38x68x1024", 38, 68, 1024),
              ("c5  38x68x1024", 38, 68, 1024)]
    impls = {"xla": correlation_xla, "pallas": correlation_pallas,
             "mm": correlation_mm, "pallas_mm": correlation_pallas_mm}

    for name, h, w, c in scales:
        f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        ref = None
        for iname, fn in impls.items():
            bat = jax.jit(jax.vmap(lambda a, b2: fn(a, b2, 8, 2)))
            try:
                out = np.asarray(bat(f1, f2), np.float32)
                if ref is None:
                    ref = out
                else:
                    err = np.abs(out - ref).max()
                    if err > 0.05:
                        print(f"{name} {iname:7s} MISMATCH max|d|={err:.4f}")
                def step(cc, bat=bat):
                    # cc-dependent input so the loop body can't be hoisted
                    o = bat(f1 + cc.astype(jnp.bfloat16) * 1e-12, f2)
                    return cc + jnp.sum(o.astype(jnp.float32)) * 1e-9
                t = chained_time(step, iters=10)
                print(f"{name} {iname:7s} {t * 1e3:8.3f} ms  (8 frames)")
            except Exception as e:
                print(f"{name} {iname:7s} FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
