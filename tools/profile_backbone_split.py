#!/usr/bin/env python
"""Backbone in-program inflation probe (round 5, BENCH lever).

Round-2 data showed isolated backbone stages summing to ~29 ms at 17 frames
while the one-program backbone ran 48.6 — the same compiler-scheduling
inflation the round-5 trunk|post split cashed for the correlation. This
tool measures, at the production 33-frame chunk:

  stage-isolated times (chained, staged inputs at the true shapes):
    T0 stem+pool   T1 layer1   T2 layer2   T3 layer3   T4 layer4
  program-split probes:
    P1 one-program full backbone                      (baseline, = S1 trunk)
    P2 front program (stem..layer2) alone
    P3 back program (layer3+layer4) on staged c3
    P4 two-dispatch front->back (forced-fetch minus sync, incl. overhead)
    P5 three-dispatch stem..layer1 -> layer2..layer3 -> layer4

Run on the TPU host: python tools/profile_backbone_split.py [--frames 33]
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

    from dtt.models.resnet import ResNetBackbone
    from dtt.utils.timing import chained_time, sync_latency

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default=None)
    args = p.parse_args()

    F = args.frames
    h, w = 608, 1088
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(F, h, w, 3).astype(np.float32))

    # the real backbone, and front/back sub-stacks built from the same
    # module classes (independent inits — timing only depends on shapes)
    full = ResNetBackbone((3, 4, 23, 3), frozen_stages=2)
    import flax.linen as nn
    from dtt.models.resnet import FrozenAffine, ResNetStage, StemConv

    class Front(nn.Module):        # stem + layer1 + layer2 -> c3
        cut: int = 2               # stages included after the stem

        @nn.compact
        def __call__(self, x):
            x = x.astype(jnp.bfloat16)
            x = StemConv(64, jnp.bfloat16, name="conv1")(x)
            x = FrozenAffine(64, jnp.bfloat16, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
            if self.cut >= 1:
                x = ResNetStage(64, 3, stride=1, name="layer1")(x)
            if self.cut >= 2:
                x = ResNetStage(128, 4, stride=2, name="layer2")(x)
            return x

    class Back(nn.Module):         # layer3 + layer4 from c3
        start: int = 3

        @nn.compact
        def __call__(self, c3):
            x = c3
            if self.start <= 2:
                x = ResNetStage(128, 4, stride=2, name="layer2")(x)
            if self.start <= 3:
                x = ResNetStage(256, 23, stride=2, name="layer3")(x)
            c5 = ResNetStage(512, 3, stride=1, dilation=2, name="layer4")(x)
            return x, c5

    class Stage(nn.Module):
        planes: int
        blocks: int
        stride: int
        dilation: int = 1

        @nn.compact
        def __call__(self, x):
            return ResNetStage(self.planes, self.blocks, stride=self.stride,
                               dilation=self.dilation, name="s")(x)

    key = jax.random.PRNGKey(0)
    params_full = jax.jit(full.init)(key, frames[:2])

    def red(x):
        if isinstance(x, tuple):
            return sum(jnp.sum(v.astype(jnp.float32)) * 1e-9 for v in x)
        return jnp.sum(x.astype(jnp.float32)) * 1e-9

    def t(name, mod, params, x, iters=args.iters):
        if args.only and args.only not in name:
            return None
        fn = lambda c, p, xx: red(mod.apply(p, xx + c.astype(xx.dtype) * 1e-12))
        ms = chained_time(fn, iters=iters, args=(params, x)) * 1e3
        print(f"{name:46s} {ms:8.2f} ms", flush=True)
        return ms

    # staged stage inputs at true shapes/dtypes
    x_stem = frames
    x_l1 = jnp.asarray(rng.randn(F, h // 4, w // 4, 64).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x_l2 = jnp.asarray(rng.randn(F, h // 4, w // 4, 256).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x_l3 = jnp.asarray(rng.randn(F, h // 8, w // 8, 512).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x_l4 = jnp.asarray(rng.randn(F, h // 16, w // 16, 1024).astype(np.float32)
                       ).astype(jnp.bfloat16)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.astype(jnp.bfloat16)
            x = StemConv(64, jnp.bfloat16, name="conv1")(x)
            x = FrozenAffine(64, jnp.bfloat16, name="bn1")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    stem = Stem()
    l1 = Stage(64, 3, 1)
    l2 = Stage(128, 4, 2)
    l3 = Stage(256, 23, 2)
    l4 = Stage(512, 3, 1, dilation=2)
    print(f"backbone split probe: {F} frames 608x1088 bf16", flush=True)
    t("T0 stem+pool (isolated)", stem, jax.jit(stem.init)(key, x_stem[:2]), x_stem)
    t("T1 layer1 (isolated)", l1, jax.jit(l1.init)(key, x_l1[:2]), x_l1)
    t("T2 layer2 (isolated)", l2, jax.jit(l2.init)(key, x_l2[:2]), x_l2)
    t("T3 layer3 (isolated)", l3, jax.jit(l3.init)(key, x_l3[:2]), x_l3)
    t("T4 layer4 (isolated)", l4, jax.jit(l4.init)(key, x_l4[:2]), x_l4)

    t("P1 full backbone one program", full, params_full, frames)

    front = Front()
    back = Back()
    pf = jax.jit(front.init)(key, frames[:2])
    pb = jax.jit(back.init)(key, x_l3[:2])
    t("P2 front (stem..layer2) program", front, pf, frames)
    t("P3 back (layer3+layer4) program", back, pb, x_l3)

    if not args.only or "P4" in args.only:
        f_front = jax.jit(lambda p, x: front.apply(p, x))
        f_back = jax.jit(lambda p, x: back.apply(p, x))
        f_red = jax.jit(red)
        float(f_red(f_back(pb, f_front(pf, frames))))
        lat = sync_latency()
        ts = []
        for i in range(12):
            v = frames + np.float32(i) * 1e-6
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            float(f_red(f_back(pb, f_front(pf, v))))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = max(ts[len(ts) // 4] - lat, 1e-9)
        print(f"{'P4 split front->back forced (incl overhead)':46s} "
              f"{dt * 1e3:8.2f} ms", flush=True)

    if not args.only or "P5" in args.only:
        fr1 = Front(cut=1)
        mid = nn.Sequential([Stage(128, 4, 2), Stage(256, 23, 2)])

        class Mid(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = ResNetStage(128, 4, stride=2, name="layer2")(x)
                return ResNetStage(256, 23, stride=2, name="layer3")(x)

        midm = Mid()
        p1 = jax.jit(fr1.init)(key, frames[:2])
        pm = jax.jit(midm.init)(key, x_l2[:2])
        p4 = jax.jit(l4.init)(key, x_l4[:2])
        g1 = jax.jit(lambda p, x: fr1.apply(p, x))
        g2 = jax.jit(lambda p, x: midm.apply(p, x))
        g3 = jax.jit(lambda p, x: l4.apply(p, x))
        f_red = jax.jit(red)
        float(f_red(g3(p4, g2(pm, g1(p1, frames)))))
        lat = sync_latency()
        ts = []
        for i in range(12):
            v = frames + np.float32(i) * 1e-6
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            float(f_red(g3(p4, g2(pm, g1(p1, v)))))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = max(ts[len(ts) // 4] - lat, 1e-9)
        print(f"{'P5 split stem+l1 -> l2+l3 -> l4 forced':46s} "
              f"{dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
