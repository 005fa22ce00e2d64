#!/usr/bin/env python
"""Find WHERE the 25 ms appears when trunk + correlation share a program.

bench_corr3scale: 3-scale correlation on staged inputs = 10.6 ms/32 pairs.
profile_video33: (trunk+corr) - (trunk+prep) = 35.4 ms. Three probes:
  I1 trunk + staged-input correlation (coexistence, no dependency)
  I2 trunk + correlation on trunk outputs (the production dependency)
  I3 trunk + correlation on trunk outputs FORCED through a copy
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse
    import jax, jax.numpy as jnp, numpy as np
    from dtt.core.config import Config
    from dtt.models.dnt import DnT, make_model
    from dtt.ops.correlation import correlation
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--only", default=None)
    args = p.parse_args()
    cfg = Config()
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model = make_model(mcfg)
    rng = np.random.RandomState(0)
    F = args.frames
    frames = jnp.asarray(rng.randn(F, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None, :2])
    up = jax.jit(lambda x: x.astype(jnp.bfloat16) * 1.0)
    sc3 = jax.block_until_ready(up(rng.randn(F, h // 32, w // 32, 512).astype(np.float32)))
    sc4 = jax.block_until_ready(up(rng.randn(F, h // 16, w // 16, 1024).astype(np.float32)))
    sc5 = jax.block_until_ready(up(rng.randn(F, h // 16, w // 16, 1024).astype(np.float32)))

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

    corr = lambda a, b: correlation(a, b, 8, 2)

    def corr3(maps):
        tot = 0.0
        for s in maps:
            v = jax.vmap(corr)(prep(s[:-1]), prep(s[1:]))
            tot = tot + jnp.sum(v.astype(jnp.float32)) * 1e-9
        return tot

    def trunk_feats(c, frames):
        feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
        return feats

    def i1(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        base = (jnp.sum(feats.reduced) + jnp.sum(feats.corr_feats["c3"])
                + jnp.sum(feats.corr_feats["c4"]) * 1e-3) * 1e-9
        eps = 1 + c * 1e-12
        return base + corr3((sc3 * eps, sc4 * eps, sc5 * eps)) + c * 1e-9

    def i2(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        cf = feats.corr_feats
        return corr3((cf["c3"], cf["c4"], cf["c5"])) + c * 1e-9

    def i3(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        cp = jax.lax.optimization_barrier(
            tuple(feats.corr_feats[k] for k in ("c3", "c4", "c5")))
        return corr3(cp) + c * 1e-9

    for name, fn in (("I1 trunk + corr(staged)", i1),
                     ("I2 trunk + corr(trunk)  [production]", i2),
                     ("I3 trunk + barrier + corr(trunk)", i3)):
        if args.only and args.only not in name:
            continue
        ms = chained_time(fn, iters=args.iters,
                          args=(frames, sc3, sc4, sc5)) * 1e3
        print(f"{name:42s} {ms:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
