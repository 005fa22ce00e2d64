"""PSRoI pooling vs a direct-summation NumPy oracle (Caffe kernel semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.ops.psroi import (psroi_pool, psroi_pool_mm, psroi_pool_pallas,
                           psroi_pool_pallas_mm, psroi_pool_xla)

ALL_IMPLS = {"xla": psroi_pool_xla, "mm": psroi_pool_mm,
             "pallas": psroi_pool_pallas, "pallas_mm": psroi_pool_pallas_mm}


def np_psroi(features, rois, spatial_scale, k):
    """Direct re-implementation of psroi_pooling_kernel.cu math."""
    h, w, c = features.shape
    d = c // (k * k)
    n = rois.shape[0]
    out = np.zeros((n, k, k, d), np.float32)
    for i in range(n):
        sw = round(rois[i, 0]) * spatial_scale
        sh = round(rois[i, 1]) * spatial_scale
        ew = round(rois[i, 2] + 1.0) * spatial_scale
        eh = round(rois[i, 3] + 1.0) * spatial_scale
        roi_w = max(ew - sw, 0.1)
        roi_h = max(eh - sh, 0.1)
        bw, bh = roi_w / k, roi_h / k
        for ph in range(k):
            for pw in range(k):
                hs = int(np.floor(ph * bh + sh))
                he = int(np.ceil((ph + 1) * bh + sh))
                ws = int(np.floor(pw * bw + sw))
                we = int(np.ceil((pw + 1) * bw + sw))
                hs, he = min(max(hs, 0), h), min(max(he, 0), h)
                ws, we = min(max(ws, 0), w), min(max(we, 0), w)
                if he <= hs or we <= ws:
                    continue
                for dd in range(d):
                    ch = (ph * k + pw) * d + dd  # dtt bin-major layout
                    region = features[hs:he, ws:we, ch]
                    out[i, ph, pw, dd] = region.sum() / ((he - hs) * (we - ws))
    return out


@pytest.fixture
def case(rng):
    h, w, k, d = 12, 16, 3, 5
    feats = rng.randn(h, w, d * k * k).astype(np.float32)
    rois = np.array(
        [
            [8.0, 8.0, 120.0, 80.0],     # normal
            [0.0, 0.0, 255.0, 191.0],    # whole image
            [50.0, 50.0, 52.0, 52.0],    # tiny (sub-bin)
            [-20.0, -20.0, 30.0, 30.0],  # partially outside
            [200.0, 150.0, 400.0, 300.0],  # clipped at far edge
        ],
        np.float32,
    )
    return feats, rois, 1.0 / 16.0, k


def test_xla_matches_oracle(case):
    feats, rois, scale, k = case
    want = np_psroi(feats, rois, scale, k)
    got = np.asarray(psroi_pool_xla(jnp.asarray(feats), jnp.asarray(rois), scale, k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["mm", "pallas", "pallas_mm"])
def test_other_impls_match_oracle(case, impl):
    feats, rois, scale, k = case
    want = np_psroi(feats, rois, scale, k)
    got = np.asarray(ALL_IMPLS[impl](jnp.asarray(feats), jnp.asarray(rois),
                                     scale, k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_impls_agree_random(rng):
    h, w, k, d, n = 19, 23, 7, 4, 12
    feats = rng.randn(h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 200, n), rng.uniform(0, 150, n),
        rng.uniform(200, 360, n), rng.uniform(150, 300, n),
    ], axis=1).astype(np.float32)
    a = np.asarray(psroi_pool_xla(jnp.asarray(feats), jnp.asarray(rois), 1 / 16.0, k))
    for impl in ("mm", "pallas", "pallas_mm"):
        b = np.asarray(ALL_IMPLS[impl](jnp.asarray(feats), jnp.asarray(rois),
                                       1 / 16.0, k))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=impl)


def test_gradients_match(case):
    feats, rois, scale, k = case
    f = jnp.asarray(feats)
    r = jnp.asarray(rois)

    def loss_xla(f):
        return jnp.sum(jnp.sin(psroi_pool_xla(f, r, scale, k)))

    g_xla = jax.grad(loss_xla)(f)
    for impl in ("mm", "pallas", "pallas_mm"):
        g_other = jax.grad(
            lambda f: jnp.sum(jnp.sin(ALL_IMPLS[impl](f, r, scale, k))))(f)
        np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_other),
                                   rtol=1e-4, atol=1e-5, err_msg=impl)
    # finite-difference spot check
    eps = 1e-3
    probe = np.zeros_like(feats)
    probe[5, 7, 3] = 1.0
    fd = (loss_xla(f + eps * probe) - loss_xla(f - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float((g_xla * probe).sum()),
                               rtol=1e-2, atol=1e-3)


def test_jit_and_vmap(case):
    feats, rois, scale, k = case
    batched_f = jnp.stack([jnp.asarray(feats)] * 2)
    batched_r = jnp.stack([jnp.asarray(rois)] * 2)
    fn = jax.jit(jax.vmap(lambda f, r: psroi_pool_xla(f, r, scale, k)))
    out = fn(batched_f, batched_r)
    assert out.shape == (2, rois.shape[0], k, k, feats.shape[-1] // (k * k))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_batched_matches_vmap(rng):
    from dtt.ops.psroi import psroi_pool_batched
    b, h, w, k, d, n = 3, 12, 16, 3, 5, 6
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 150, (b, n)), rng.uniform(0, 100, (b, n)),
        rng.uniform(150, 250, (b, n)), rng.uniform(100, 190, (b, n)),
    ], axis=2).astype(np.float32)
    want = jax.vmap(lambda f, r: psroi_pool_xla(f, r, 1 / 16.0, k))(
        jnp.asarray(feats), jnp.asarray(rois))
    got = psroi_pool_batched(jnp.asarray(feats), jnp.asarray(rois), 1 / 16.0, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # and it differentiates like the vmap form
    g1 = jax.grad(lambda f: jnp.sum(jnp.sin(psroi_pool_batched(
        f, jnp.asarray(rois), 1 / 16.0, k))))(jnp.asarray(feats))
    g2 = jax.grad(lambda f: jnp.sum(jnp.sin(jax.vmap(
        lambda ff, rr: psroi_pool_xla(ff, rr, 1 / 16.0, k))(
        f, jnp.asarray(rois)))))(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_batched_pallas_mm_matches_oracle(rng):
    from dtt.ops.psroi import psroi_pool_batched_pallas_mm
    b, h, w, k, d, n = 3, 12, 16, 3, 5, 6
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 150, (b, n)), rng.uniform(0, 100, (b, n)),
        rng.uniform(150, 250, (b, n)), rng.uniform(100, 190, (b, n)),
    ], axis=2).astype(np.float32)
    want = jax.vmap(lambda f, r: psroi_pool_xla(f, r, 1 / 16.0, k))(
        jnp.asarray(feats), jnp.asarray(rois))
    got = psroi_pool_batched_pallas_mm(jnp.asarray(feats), jnp.asarray(rois),
                                       1 / 16.0, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_batched_direct_matches_oracle(rng):
    """The SAT-free interval-indicator MXU kernel equals the gather oracle
    (f32 exactly; bf16 maps to the maps' own precision)."""
    from dtt.ops.psroi import psroi_pool_batched_direct
    b, h, w, k, d, n = 3, 12, 16, 3, 5, 6
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 150, (b, n)), rng.uniform(0, 100, (b, n)),
        rng.uniform(150, 250, (b, n)), rng.uniform(100, 190, (b, n)),
    ], axis=2).astype(np.float32)
    want = jax.vmap(lambda f, r: psroi_pool_xla(f, r, 1 / 16.0, k))(
        jnp.asarray(feats), jnp.asarray(rois))
    got = psroi_pool_batched_direct(jnp.asarray(feats), jnp.asarray(rois),
                                    1 / 16.0, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # bf16 maps: tolerance set by bf16 itself, not the algorithm
    got16 = psroi_pool_batched_direct(jnp.asarray(feats, jnp.bfloat16),
                                      jnp.asarray(rois), 1 / 16.0, k)
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(want), rtol=0.04, atol=0.05)


def test_batched_direct_empty_and_edge_bins(rng):
    """Degenerate RoIs (empty bins, off-map clips) match the oracle's zeros."""
    from dtt.ops.psroi import psroi_pool_batched_direct
    b, h, w, k, d = 2, 10, 14, 3, 4
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.asarray([[[0.0, 0.0, 1.0, 1.0],        # sub-bin-size box
                        [-50.0, -50.0, -10.0, -10.0],  # fully off-map
                        [100.0, 80.0, 400.0, 400.0]],  # clipped at edges
                       [[5.0, 5.0, 200.0, 140.0],
                        [0.0, 0.0, 223.0, 159.0],      # full map
                        [30.0, 30.0, 31.0, 31.0]]], np.float32)
    want = jax.vmap(lambda f, r: psroi_pool_xla(f, r, 1 / 16.0, k))(
        jnp.asarray(feats), jnp.asarray(rois))
    got = psroi_pool_batched_direct(jnp.asarray(feats), jnp.asarray(rois),
                                    1 / 16.0, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_batched_direct_ad_gradient_matches_gather(rng):
    """psroi_pool_batched_direct_ad's mirror matmul backward equals AD of
    the exact gather form (both f32): the custom_vjp is a hand-derived
    transpose, so pin it to the known-correct transpose-of-gather. A
    nonlinear readout makes the cotangent nonuniform per (roi, bin, d)."""
    from dtt.ops.psroi import psroi_pool_batched, psroi_pool_batched_direct_ad
    b, h, w, k, d, n = 2, 10, 14, 3, 4, 5
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 120, (b, n)), rng.uniform(0, 80, (b, n)),
        rng.uniform(120, 220, (b, n)), rng.uniform(80, 155, (b, n)),
    ], axis=2).astype(np.float32)
    # include a degenerate roi: empty bins must backprop exact zeros
    rois[0, 0] = [-40.0, -40.0, -20.0, -20.0]

    def loss(pool_fn, f):
        return jnp.sum(jnp.sin(pool_fn(f, jnp.asarray(rois), 1 / 16.0, k)))

    v1, g1 = jax.value_and_grad(
        lambda f: loss(psroi_pool_batched_direct_ad, f))(jnp.asarray(feats))
    v2, g2 = jax.value_and_grad(
        lambda f: loss(psroi_pool_batched, f))(jnp.asarray(feats))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_batched_direct_ad_zero_roi_gradient(rng):
    """RoIs take zero gradient from the pool (integer bin bounds), matching
    every other impl."""
    from dtt.ops.psroi import psroi_pool_batched_direct_ad
    b, h, w, k, d, n = 1, 8, 8, 2, 3, 4
    feats = rng.randn(b, h, w, d * k * k).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 60, (b, n)), rng.uniform(0, 60, (b, n)),
        rng.uniform(60, 120, (b, n)), rng.uniform(60, 120, (b, n)),
    ], axis=2).astype(np.float32)
    g = jax.grad(lambda r: jnp.sum(psroi_pool_batched_direct_ad(
        jnp.asarray(feats), r, 1 / 16.0, k)))(jnp.asarray(rois))
    np.testing.assert_array_equal(np.asarray(g), 0.0)
