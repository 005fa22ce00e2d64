"""Honest device timing on remote/deferred PJRT backends.

The axon-tunneled TPU runtime defers program execution until a result is
actually demanded (scalar fetch or a block on that buffer's producer);
blocking on only the last iteration of a timing loop therefore executes ONE
program, inflating throughput ~iters-fold. Verified empirically on this
machine: an 8192^3 matmul measures a plausible 125 TFLOP/s when every
iteration's scalar is forced, while a ResNet-101 forward "measured" an
impossible 580+ TFLOP/s with last-output blocking.

`chained_time` defeats deferral structurally: the N iterations run inside
one jitted fori_loop whose carry feeds iteration i's (reduced) output into
iteration i+1's input, so every iteration is on the critical path of the
single fetched scalar. Host<->device sync latency (~25 ms on the tunnel) is
measured separately and subtracted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def sync_latency(samples: int = 5) -> float:
    """Seconds for a trivial jitted scalar round-trip (tunnel sync cost)."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0.0)))  # compile
    ts = []
    for i in range(samples):
        t0 = time.perf_counter()
        float(f(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0]  # min: sync noise is one-sided positive


def chained_time(make_scalar_step, iters: int = 10, repeats: int = 3,
                 args: tuple = ()) -> float:
    """Mean seconds per iteration of `make_scalar_step`.

    make_scalar_step: fn(carry_scalar, *args) -> new_scalar where the
    computation of interest runs inside and its result contributes to the
    new scalar. Large operands MUST go through `args` (not closures): a
    closed-over device array becomes a jit constant, and this machine's
    remote compile service ships constants in the compile request —
    hundreds of MB of maps turn into an HTTP 413.
    """

    @jax.jit
    def run(c0, *ops):
        return jax.lax.fori_loop(0, iters,
                                 lambda i, c: make_scalar_step(c, *ops), c0)

    float(run(jnp.float32(0.0), *args))  # compile + warm
    lat = sync_latency()
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(jnp.float32(r) * 1e-6, *args))
        best = min(best, time.perf_counter() - t0 - lat)
    return max(best, 0.0) / iters
