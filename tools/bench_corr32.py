#!/usr/bin/env python
"""Decompose the 33-frame in-graph correlation cost (round-5 lever).

profile_video33 measured the 3-scale correlation stage at ~35 ms/32 pairs
while the 8-frame microbench predicted ~10 ms. This probes, at the REAL
32-pair batch on staged inputs: each impl per scale, the prep->corr chain
exactly as _track_input builds it (slices of a 33-frame stack feeding the
Pallas kernel), and prep materialization alone.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dtt.ops.correlation import correlation
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=32)
    p.add_argument("--impls", nargs="*",
                   default=["pallas_mm", "mm"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--c3p", action="store_true")
    args = p.parse_args()

    print(f"backend={jax.default_backend()} pairs={args.pairs}")
    rng = np.random.RandomState(0)
    b = args.pairs
    scales = [("c4  38x68x1024", 38, 68, 1024)]
    if args.c3p:
        scales.insert(0, ("c3p 19x34x512", 19, 34, 512))

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

    for name, h, w, c in scales:
        # materialize on device BEFORE timing: axon defers the H2D transfer,
        # and a deferred host constant gets EMBEDDED in the next program
        # upload (HTTP 413 at the 169 MB c4 batch)
        up = jax.jit(lambda x: x.astype(jnp.bfloat16) * 1.0)
        f1 = jax.block_until_ready(up(rng.randn(b, h, w, c).astype(np.float32)))
        f2 = jax.block_until_ready(up(rng.randn(b, h, w, c).astype(np.float32)))
        stack = jax.block_until_ready(
            up(rng.randn(b + 1, h, w, c).astype(np.float32)))
        for iname in args.impls:
            fn = lambda a, b2: correlation(a, b2, 8, 2, impl=iname)

            def staged(cc, f1, f2, stack):
                o = jax.vmap(fn)(f1 + cc.astype(jnp.bfloat16) * 1e-12, f2)
                return cc + jnp.sum(o.astype(jnp.float32)) * 1e-9

            def chained_from_stack(cc, f1, f2, stack):
                s = stack + cc.astype(jnp.bfloat16) * 1e-12
                o = jax.vmap(fn)(prep(s[:-1]), prep(s[1:]))
                return cc + jnp.sum(o.astype(jnp.float32)) * 1e-9

            ops = (f1, f2, stack)
            t1 = chained_time(staged, iters=args.iters, args=ops) * 1e3
            t2 = chained_time(chained_from_stack, iters=args.iters,
                              args=ops) * 1e3
            print(f"{name} {iname:9s} staged {t1:8.2f} ms | "
                  f"prep+slices {t2:8.2f} ms", flush=True)

        def prep_only(cc, f1, f2, stack):
            s = stack + cc.astype(jnp.bfloat16) * 1e-12
            a, b2 = prep(s[:-1]), prep(s[1:])
            # force materialization without a consumer kernel
            return cc + (jnp.sum(a.astype(jnp.float32))
                         + jnp.sum(b2.astype(jnp.float32))) * 1e-9

        tp = chained_time(prep_only, iters=args.iters,
                          args=(f1, f2, stack)) * 1e3
        print(f"{name} prep-only(summed)    {tp:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
