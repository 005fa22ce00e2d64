#!/usr/bin/env python
"""All-3-scale correlation in ONE program, production form (round-5 lever).

bench_corr32 measured the per-scale staged cost (c4 3.6, c3p 0.5 ms/32
pairs) but profile_video33 attributes ~35 ms to the 3-scale stage in-graph.
This times the exact _corr_volumes computation (prep + slices + 3 vmapped
kernels) from staged trunk-shaped stacks, isolating the multi-kernel
interaction from the backbone.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse
    import jax, jax.numpy as jnp, numpy as np
    from dtt.ops.correlation import correlation
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=32)
    p.add_argument("--impl", default="pallas_mm")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    print(f"backend={jax.default_backend()} pairs={args.pairs} impl={args.impl}")
    rng = np.random.RandomState(0)
    f = args.pairs + 1
    up = jax.jit(lambda x: x.astype(jnp.bfloat16) * 1.0)
    c3p = jax.block_until_ready(up(rng.randn(f, 19, 34, 512).astype(np.float32)))
    c4 = jax.block_until_ready(up(rng.randn(f, 38, 68, 1024).astype(np.float32)))
    c5 = jax.block_until_ready(up(rng.randn(f, 38, 68, 1024).astype(np.float32)))

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

    fn = lambda a, b: correlation(a, b, 8, 2, impl=args.impl)

    def three(cc, c3p, c4, c5):
        tot = cc
        for s in (c3p, c4, c5):
            ss = s + cc.astype(jnp.bfloat16) * 1e-12
            v = jax.vmap(fn)(prep(ss[:-1]), prep(ss[1:]))
            tot = tot + jnp.sum(v.astype(jnp.float32)) * 1e-9
        return tot

    t = chained_time(three, iters=args.iters, args=(c3p, c4, c5)) * 1e3
    print(f"3-scale in one program: {t:8.2f} ms / {args.pairs} pairs", flush=True)

if __name__ == "__main__":
    main()
