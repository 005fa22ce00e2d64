#!/usr/bin/env python
"""Find WHERE the 25 ms appears when trunk + correlation share a program.

bench_corr3scale: 3-scale correlation on staged inputs = 10.6 ms/32 pairs.
profile_video33: (trunk+corr) - (trunk+prep) = 35.4 ms. Probes:
  I1 trunk + staged-input correlation (coexistence, no dependency)
  I2 trunk + correlation on trunk outputs (the production dependency)
  I3 trunk + correlation on trunk outputs behind optimization_barrier
  I4 trunk + correlation on eps-multiplied COPIES of trunk outputs
     (fresh buffers whose layout XLA picks for the consumer)
  I5 trunk + staged-input correlation at TRUE production shapes
     (I1's sc3 was 19x34 but production c3p is 38x68x512)
  I6 I2 but impl='mm' (XLA banded matmul; is the Pallas call the
     layout-sensitive part?)

Round-5 measured (33 frames, v5e): I1 102.3 / I2 124.3 / I3 124.4.
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

    def corr3(maps, impl=None):
        fn = corr if impl is None else (
            lambda a, b: correlation(a, b, 8, 2, impl=impl))
        tot = 0.0
        for s in maps:
            v = jax.vmap(fn)(prep(s[:-1]), prep(s[1:]))
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

    def i4(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        eps = (1 + c * 1e-12).astype(jnp.bfloat16)
        cp = tuple(feats.corr_feats[k] * eps for k in ("c3", "c4", "c5"))
        return corr3(cp) + c * 1e-9

    sc3p = jax.block_until_ready(
        up(rng.randn(F, h // 16, w // 16, 512).astype(np.float32)))

    def i5(c, frames, sc3, sc4, sc5):
        # sc3 here is the TRUE-shape 38x68x512 staged stack (see arg table)
        feats = trunk_feats(c, frames)
        base = (jnp.sum(feats.reduced) + jnp.sum(feats.corr_feats["c3"])
                + jnp.sum(feats.corr_feats["c4"]) * 1e-3) * 1e-9
        eps = 1 + c * 1e-12
        return base + corr3((sc3 * eps, sc4 * eps, sc5 * eps)) + c * 1e-9

    def i6(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        cf = feats.corr_feats
        return corr3((cf["c3"], cf["c4"], cf["c5"]), impl="mm") + c * 1e-9

    def i10(c, frames, sc3, sc4, sc5):
        # production dependency, but operands CAST TO F32 before correlation
        # (i5's accidental discovery: its eps multiply promoted the staged
        # bf16 arrays to f32, and the f32 kernel ran ~2x faster in-program)
        feats = trunk_feats(c, frames)
        cp = tuple(feats.corr_feats[k].astype(jnp.float32)
                   for k in ("c3", "c4", "c5"))
        return corr3(cp) + c * 1e-9

    def i11(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        cp = tuple(feats.corr_feats[k].astype(jnp.float32)
                   for k in ("c3", "c4", "c5"))
        return corr3(cp, impl="mm") + c * 1e-9

    def one_scale(key_name):
        def fn(c, frames, sc3, sc4, sc5):
            feats = trunk_feats(c, frames)
            base = (jnp.sum(feats.reduced) + jnp.sum(feats.corr_feats["c3"])
                    + jnp.sum(feats.corr_feats["c4"]) * 1e-3) * 1e-9
            return base + corr3((feats.corr_feats[key_name],)) + c * 1e-9
        return fn

    for name, fn, probe_args in (
            ("I1 trunk + corr(staged)", i1, (frames, sc3, sc4, sc5)),
            ("I2 trunk + corr(trunk)  [production]", i2,
             (frames, sc3, sc4, sc5)),
            ("I3 trunk + barrier + corr(trunk)", i3,
             (frames, sc3, sc4, sc5)),
            ("I4 trunk + corr(eps-copy of trunk)", i4,
             (frames, sc3, sc4, sc5)),
            ("I5 trunk + corr(staged, true shapes)", i5,
             (frames, sc3p, sc4, sc5)),
            ("I6 trunk + corr(trunk) impl=mm", i6,
             (frames, sc3, sc4, sc5)),
            ("I7 trunk + corr(trunk c3 only)", one_scale("c3"),
             (frames, sc3, sc4, sc5)),
            ("I8 trunk + corr(trunk c4 only)", one_scale("c4"),
             (frames, sc3, sc4, sc5)),
            ("I9 trunk + corr(trunk c5 only)", one_scale("c5"),
             (frames, sc3, sc4, sc5)),
            ("I10 trunk + corr(f32(trunk))", i10,
             (frames, sc3, sc4, sc5)),
            ("I11 trunk + corr(f32(trunk)) impl=mm", i11,
             (frames, sc3, sc4, sc5))):
        if args.only and args.only not in name:
            continue
        ms = chained_time(fn, iters=args.iters, args=probe_args) * 1e3
        print(f"{name:42s} {ms:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
