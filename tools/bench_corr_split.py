#!/usr/bin/env python
"""Can a program SPLIT recover the staged-speed correlation?

Round-5 finding (bench_trunk_corr_interaction, BASELINE.md): the identical
3-scale correlation costs ~33 ms when its inputs are produced by the trunk
in the SAME program, vs 10-15 ms when they are program inputs — regardless
of dtype (I10 f32 131.5 ms), optimization_barrier (I3), or fresh copies
(I4), and for BOTH the Pallas and the XLA-mm kernels. Whatever the
scheduler/memory cause, physically splitting the dispatch reproduces the
fast staged regime by construction. Probes:

  S1 trunk-only program, chained                      (baseline T1)
  S2 corr3-only program on device-resident trunk outs (true shapes, bf16)
  S3 host-pipelined split: trunk program then corr program, forced-fetch
     per chunk (the production-realistic two-dispatch cost)
  S4 single program (I2 form) with _VMEM_LIMIT monkeypatched to 40 MB
     (does shrinking the Pallas scoped-VMEM reservation fix scheduling?)

Run on the TPU host: python tools/bench_corr_split.py [--frames 33]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtt.core.config import Config
    from dtt.models.dnt import DnT, make_model
    import importlib
    # NOT `import dtt.ops.correlation as X`: dtt/ops/__init__ rebinds the
    # `correlation` attribute of the package to the FUNCTION, and the
    # `import ... as` form resolves the attribute, not the submodule
    corr_lib = importlib.import_module("dtt.ops.correlation")
    from dtt.utils.timing import chained_time, sync_latency

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--iters", type=int, default=6)
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

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(
            float(x.shape[-1])).astype(x.dtype)

    def corr3(c, maps):
        tot = 0.0
        for s in maps:
            ss = s + c.astype(s.dtype) * 1e-12
            v = jax.vmap(lambda a, b: corr_lib.correlation(a, b, 8, 2))(
                prep(ss[:-1]), prep(ss[1:]))
            tot = tot + jnp.sum(v.astype(jnp.float32)) * 1e-9
        return tot + c * 1e-9

    def sel(name):
        return not args.only or args.only in name

    # --- S1: trunk-only program -------------------------------------------
    def trunk_probe(c, params, frames):
        feats = model.apply(params, frames + c * 1e-12,
                            method=DnT.frame_trunk)
        return (jnp.sum(feats.reduced) + jnp.sum(feats.corr_feats["c3"])
                + jnp.sum(feats.corr_feats["c4"]) * 1e-3) * 1e-9 + c * 1e-9

    if sel("S1"):
        ms = chained_time(trunk_probe, iters=args.iters,
                          args=(params, frames)) * 1e3
        print(f"{'S1 trunk-only program':46s} {ms:8.2f} ms", flush=True)

    # --- S2: corr3-only program on device-resident trunk outputs ----------
    trunk_out = jax.jit(lambda p, fr: model.apply(
        p, fr, method=DnT.frame_trunk).corr_feats)
    cf = jax.block_until_ready(trunk_out(params, frames))
    c3, c4, c5 = cf["c3"], cf["c4"], cf["c5"]

    if sel("S2"):
        ms = chained_time(lambda c, a, b, d: corr3(c, (a, b, d)),
                          iters=args.iters, args=(c3, c4, c5)) * 1e3
        print(f"{'S2 corr3-only program (trunk-produced bufs)':46s} "
              f"{ms:8.2f} ms", flush=True)

    # --- S3: host-pipelined two-program split ------------------------------
    trunk_feats_jit = jax.jit(lambda p, fr: model.apply(
        p, fr, method=DnT.frame_trunk))

    corr_only = jax.jit(lambda c3_, c4_, c5_: corr3(
        jnp.float32(0.0), (c3_, c4_, c5_)))

    if sel("S3"):
        # warm both programs
        f0 = trunk_feats_jit(params, frames)
        float(corr_only(f0.corr_feats["c3"], f0.corr_feats["c4"],
                        f0.corr_feats["c5"]))
        lat = sync_latency()
        times = []
        for i in range(10):
            fr = frames + np.float32(i) * 1e-6
            jax.block_until_ready(fr)
            t0 = time.perf_counter()
            ft = trunk_feats_jit(params, fr)
            v = corr_only(ft.corr_feats["c3"], ft.corr_feats["c4"],
                          ft.corr_feats["c5"])
            # force BOTH the corr scalar and a trunk output the production
            # step would consume downstream
            float(v + jnp.sum(ft.rpn_cls) * 1e-12)
            times.append(time.perf_counter() - t0)
        times.sort()
        ms = (times[len(times) // 4] - lat) * 1e3
        print(f"{'S3 split trunk->corr two-dispatch (forced)':46s} "
              f"{ms:8.2f} ms", flush=True)

    # --- S4: single program, 40 MB scoped-VMEM limit -----------------------
    if sel("S4"):
        old = corr_lib._VMEM_LIMIT
        corr_lib._VMEM_LIMIT = 40 << 20
        try:
            def i2(c, params, frames):
                feats = model.apply(params, frames + c * 1e-12,
                                    method=DnT.frame_trunk)
                kf = feats.corr_feats
                return corr3(c, (kf["c3"], kf["c4"], kf["c5"]))

            ms = chained_time(i2, iters=args.iters,
                              args=(params, frames)) * 1e3
            print(f"{'S4 one program, 40MB scoped-VMEM pallas':46s} "
                  f"{ms:8.2f} ms", flush=True)
        finally:
            corr_lib._VMEM_LIMIT = old


if __name__ == "__main__":
    main()
