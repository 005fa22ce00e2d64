#!/usr/bin/env python
"""Dump optimized HLO for the trunk+corr probes (I2 vs I5 divergence).

bench_trunk_corr_interaction measured correlation ~18 ms slower when its
inputs are trunk outputs (I2 124.3 ms) than when they are program inputs
(I5 105.9 ms), with eps-copies and optimization_barrier NOT closing the gap
(I4 125.1 / I3 124.4) — pointing at a compiler-level difference (layout
propagation into the backbone, fusion shape changes, extra transposes).
This AOT-compiles the same two probe programs and writes their optimized
HLO to /tmp/corr_hlo_{i2,i5}.txt for structural diffing: look at the
layouts of the pallas custom-call operands and at any `copy`/`transpose`
fusions near them.

Run on the TPU host (compile only, no execution):
  python tools/dump_corr_hlo.py [--frames 33]
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

    from dtt.core.config import Config
    from dtt.models.dnt import DnT, make_model
    from dtt.ops.correlation import correlation

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--out", default="/tmp")
    args = p.parse_args()
    cfg = Config()
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model = make_model(cfg.model)
    F = args.frames
    rng = np.random.RandomState(0)
    frames = jnp.zeros((F, h, w, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            frames[None, :2])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    sc3 = jnp.zeros((F, h // 16, w // 16, 512), jnp.bfloat16)
    sc4 = jnp.zeros((F, h // 16, w // 16, 1024), jnp.bfloat16)
    sc5 = jnp.zeros((F, h // 16, w // 16, 1024), jnp.bfloat16)

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
        return model.apply(params, frames + c * 1e-12,
                           method=DnT.frame_trunk)

    def i2(c, frames):
        feats = trunk_feats(c, frames)
        cf = feats.corr_feats
        return corr3((cf["c3"], cf["c4"], cf["c5"])) + c * 1e-9

    def i5(c, frames, sc3, sc4, sc5):
        feats = trunk_feats(c, frames)
        base = (jnp.sum(feats.reduced) + jnp.sum(feats.corr_feats["c3"])
                + jnp.sum(feats.corr_feats["c4"]) * 1e-3) * 1e-9
        eps = 1 + c * 1e-12
        return base + corr3((sc3 * eps, sc4 * eps, sc5 * eps)) + c * 1e-9

    for name, fn, a in (("i2", i2, (jnp.float32(0.0), frames)),
                        ("i5", i5, (jnp.float32(0.0), frames,
                                    sc3, sc4, sc5))):
        compiled = jax.jit(fn).lower(*a).compile()
        txt = compiled.as_text()
        path = os.path.join(args.out, f"corr_hlo_{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt.splitlines())} HLO lines -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
