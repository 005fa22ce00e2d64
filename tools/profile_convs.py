"""Profiling tool (run on the TPU host): conv-shape micro-benchmarks vs MXU peak

Uses deferral-proof forced-fetch timing (see dtt/utils/timing.py and
CLAUDE.md). Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_convs.py
"""
from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp, time
from dtt.utils.timing import sync_latency

lat = sync_latency()
rng = np.random.RandomState(0)

def bench(name, fn, x, flops):
    g = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
    float(g(x))
    ts = []
    for i in range(8):
        t0 = time.perf_counter(); float(g((x.astype(jnp.float32) + np.float32(i*1e-6)).astype(x.dtype))); ts.append(time.perf_counter()-t0)
    ts.sort(); dt = max(ts[2] - lat, 1e-9)
    print(f"{name}: {dt*1e3:.2f} ms -> {flops/dt/1e12:.0f} TFLOP/s", flush=True)

B = 8
# layer3-style 3x3 conv, 1024ch, 38x68
x = jnp.asarray(rng.randn(B, 38, 68, 1024).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.randn(3, 3, 1024, 1024).astype(np.float32)).astype(jnp.bfloat16) * 0.01
conv = lambda x: jax.lax.conv_general_dilated(x, k, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
bench("3x3 1024->1024 @38x68 bf16", conv, x, B*38*68*9*1024*1024*2)

# dilated version (layer4 style, 512ch in 2048 out? use 512->512 d=2)
x2 = jnp.asarray(rng.randn(B, 38, 68, 512).astype(np.float32)).astype(jnp.bfloat16)
k2 = jnp.asarray(rng.randn(3, 3, 512, 512).astype(np.float32)).astype(jnp.bfloat16) * 0.01
conv_d = lambda x: jax.lax.conv_general_dilated(x, k2, (1,1), [(2,2),(2,2)], rhs_dilation=(2,2), dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
bench("3x3 512->512 dilated2 @38x68", conv_d, x2, B*38*68*9*512*512*2)

# 1x1 1024->1519 (cls ps maps)
k3 = jnp.asarray(rng.randn(1, 1, 1024, 1519).astype(np.float32)).astype(jnp.bfloat16) * 0.01
conv_1 = lambda x: jax.lax.conv_general_dilated(x, k3, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
bench("1x1 1024->1519 @38x68", conv_1, x, B*38*68*1024*1519*2)

# stem-style: 7x7 stride2 on 608x1088
xs = jnp.asarray(rng.randn(2, 608, 1088, 3).astype(np.float32)).astype(jnp.bfloat16)
ks = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32)).astype(jnp.bfloat16) * 0.01
conv_s = lambda x: jax.lax.conv_general_dilated(x, ks, (2,2), [(3,3),(3,3)], dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
bench("7x7/2 3->64 @608x1088", conv_s, xs, 2*304*544*49*3*64*2)

# layer2-style: 3x3 128ch @ 152x272
x4 = jnp.asarray(rng.randn(B, 152, 272, 128).astype(np.float32)).astype(jnp.bfloat16)
k4 = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32)).astype(jnp.bfloat16) * 0.01
conv4 = lambda x: jax.lax.conv_general_dilated(x, k4, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.bfloat16)
bench("3x3 128->128 @152x272", conv4, x4, B*152*272*9*128*128*2)
