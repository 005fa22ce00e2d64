"""Track-maps stage micro-bench: is the 2291-channel concat -> 1x1 conv the
right formulation, or should the conv be split per input part (sum of
per-part 1x1 convs, no concat materialization)?

The two are mathematically identical (1x1 conv is linear in channels):
  conv(concat[a, b, c]) = conv_a(a) + conv_b(b) + conv_c(c)
with conv_x taking the matching kernel slice. XLA may or may not fuse the
concat away on TPU; this measures it. Also times the cosine-normalize prep
and the correlation calls to locate the stage's real cost.

Run on the TPU host: python tools/bench_trackmaps.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtt.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dtt.core.config import Config  # noqa: E402
from dtt.ops.correlation import correlation  # noqa: E402
from dtt.utils.timing import chained_time  # noqa: E402

B, H, W = 8, 38, 68
RED = 1024


def main():
    cfg = Config().model
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    f_red_t = jnp.asarray(rng.randn(B, H, W, RED).astype(np.float32)).astype(dt)
    f_red_tau = jnp.asarray(rng.randn(B, H, W, RED).astype(np.float32)).astype(dt)
    f_c4_t = jnp.asarray(rng.randn(B, H, W, 1024).astype(np.float32)).astype(dt)
    f_c4_tau = jnp.asarray(rng.randn(B, H, W, 1024).astype(np.float32)).astype(dt)
    f_c3_t = jnp.asarray(rng.randn(B, H, W, 512).astype(np.float32)).astype(dt)
    f_c3_tau = jnp.asarray(rng.randn(B, H, W, 512).astype(np.float32)).astype(dt)
    ncorr = cfg.track.num_corr_channels
    n_in = 2 * RED + 3 * ncorr
    n_out = cfg.roi.ps_grid ** 2 * 4
    kern = jnp.asarray(rng.randn(1, 1, n_in, n_out).astype(np.float32)).astype(dt) * 0.01
    bias = jnp.zeros((n_out,), dt)

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

    corr = lambda a, b: jax.vmap(
        lambda u, v: correlation(u, v, cfg.track.max_displacement,
                                 cfg.track.stride))(prep(a), prep(b))

    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)

    def stage_concat(c):
        corrs = [corr(f_c3_t, f_c3_tau), corr(f_c4_t, f_c4_tau),
                 corr(f_red_t + c.astype(dt) * 1e-8, f_red_tau)]
        stacked = jnp.concatenate([f_red_t, f_red_tau]
                                  + [x.astype(dt) for x in corrs], axis=-1)
        out = conv(stacked, kern) + bias
        return jnp.sum(out.astype(jnp.float32))

    def stage_split(c):
        corrs = [corr(f_c3_t, f_c3_tau), corr(f_c4_t, f_c4_tau),
                 corr(f_red_t + c.astype(dt) * 1e-8, f_red_tau)]
        parts = [f_red_t, f_red_tau] + [x.astype(dt) for x in corrs]
        o = 0
        acc = None
        for p in parts:
            kslice = jax.lax.dynamic_slice_in_dim(kern, o, p.shape[-1], axis=2)
            y = conv(p, kslice)
            acc = y if acc is None else acc + y
            o += p.shape[-1]
        return jnp.sum((acc + bias).astype(jnp.float32))

    def corr_only(c):
        corrs = [corr(f_c3_t, f_c3_tau), corr(f_c4_t, f_c4_tau),
                 corr(f_red_t + c.astype(dt) * 1e-8, f_red_tau)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in corrs)

    def prep_only(c):
        outs = [prep(x + c.astype(dt) * 1e-8)
                for x in (f_c3_t, f_c3_tau, f_c4_t, f_c4_tau, f_red_t, f_red_tau)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in outs)

    for name, fn in [("full stage, concat->conv", stage_concat),
                     ("full stage, split convs ", stage_split),
                     ("correlations (+prep)    ", corr_only),
                     ("prep (cosine norm) only ", prep_only)]:
        t = chained_time(lambda c, f=fn: f(c) * 1e-9 + c * 0.0, iters=10)
        print(f"{name}: {t * 1e3:.2f} ms / {B}-frame chunk", flush=True)


if __name__ == "__main__":
    main()
