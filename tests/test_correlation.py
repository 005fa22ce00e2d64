"""Correlation vs a direct NumPy oracle (flownet2 kernel_size=1 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.ops.correlation import (correlation, correlation_pallas,
                                 correlation_xla, num_corr_channels)


def np_correlation(f1, f2, d, s):
    h, w, c = f1.shape
    offs = list(range(-d, d + 1, s))
    f2p = np.pad(f2, ((d, d), (d, d), (0, 0)))
    out = np.zeros((h, w, len(offs) ** 2), np.float32)
    j = 0
    for dy in offs:
        for dx in offs:
            sl = f2p[d + dy:d + dy + h, d + dx:d + dx + w]
            out[:, :, j] = (f1 * sl).mean(-1)
            j += 1
    return out


@pytest.fixture
def feats(rng):
    h, w, c = 10, 14, 24
    return (rng.randn(h, w, c).astype(np.float32),
            rng.randn(h, w, c).astype(np.float32))


def test_num_channels():
    assert num_corr_channels(8, 2) == 81
    assert num_corr_channels(4, 1) == 81
    assert num_corr_channels(2, 2) == 9


@pytest.mark.parametrize("d,s", [(2, 1), (4, 2), (8, 2)])
def test_xla_matches_oracle(feats, d, s):
    f1, f2 = feats
    want = np_correlation(f1, f2, d, s)
    got = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), d, s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d,s", [(2, 1), (4, 2)])
def test_pallas_matches_oracle(feats, d, s):
    f1, f2 = feats
    want = np_correlation(f1, f2, d, s)
    got = np.asarray(correlation_pallas(jnp.asarray(f1), jnp.asarray(f2), d, s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identical_frames_center_is_norm(feats):
    f1, _ = feats
    out = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f1), 2, 2))
    center = out[:, :, out.shape[-1] // 2]
    np.testing.assert_allclose(center, (f1 * f1).mean(-1), rtol=1e-5)


def test_shifted_frame_peaks_at_shift(rng):
    """A pure translation of f1 must put the correlation max at that offset."""
    h, w, c = 16, 16, 8
    f1 = rng.rand(h, w, c).astype(np.float32) + 0.5
    dy_true, dx_true = 2, -4
    f2 = np.roll(np.roll(f1, dy_true, axis=0), dx_true, axis=1)
    out = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), 4, 2))
    offs = list(range(-4, 5, 2))
    inner = out[6:-6, 6:-6]  # away from the wrap/pad boundary
    j_best = np.asarray(inner.mean((0, 1))).argmax()
    assert (offs[j_best // len(offs)], offs[j_best % len(offs)]) == (dy_true, dx_true)


def test_gradients_match(feats):
    f1, f2 = feats
    a1, a2 = jnp.asarray(f1), jnp.asarray(f2)

    def loss(fn):
        return lambda x, y: jnp.sum(jnp.cos(fn(x, y, 2, 1)))

    gx = jax.grad(loss(correlation_xla), argnums=(0, 1))(a1, a2)
    gp = jax.grad(loss(correlation_pallas), argnums=(0, 1))(a1, a2)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # coarse FD probe: eps must be large enough that the loss delta clears
    # f32 resolution of the O(3500)-magnitude loss
    eps, probe = 0.25, np.zeros_like(f1)
    probe[3, 5, 2] = 1.0
    f = loss(correlation_xla)
    fd = (f(a1 + eps * probe, a2) - f(a1 - eps * probe, a2)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float((gx[0] * probe).sum()),
                               rtol=0.1, atol=5e-3)


def test_channel_padding_path(rng):
    """C not a multiple of the channel block must still be exact."""
    f1 = rng.randn(6, 7, 5).astype(np.float32)
    f2 = rng.randn(6, 7, 5).astype(np.float32)
    want = np_correlation(f1, f2, 2, 2)
    got = np.asarray(correlation_pallas(jnp.asarray(f1), jnp.asarray(f2), 2, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vmap_batch(feats):
    f1, f2 = feats
    b1 = jnp.stack([jnp.asarray(f1), jnp.asarray(f2)])
    b2 = jnp.stack([jnp.asarray(f2), jnp.asarray(f1)])
    out = jax.vmap(lambda a, b: correlation(a, b, 2, 1, impl="xla"))(b1, b2)
    assert out.shape == (2, 10, 14, 25)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np_correlation(f1, f2, 2, 1), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d,s", [(2, 1), (4, 2), (8, 2)])
def test_mm_matches_oracle(feats, d, s):
    from dtt.ops.correlation import correlation_mm
    f1, f2 = feats
    want = np_correlation(f1, f2, d, s)
    got = np.asarray(correlation_mm(jnp.asarray(f1), jnp.asarray(f2), d, s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mm_gradients_match(feats):
    from dtt.ops.correlation import correlation_mm
    f1, f2 = feats
    a1, a2 = jnp.asarray(f1), jnp.asarray(f2)
    loss = lambda fn: lambda x, y: jnp.sum(jnp.sin(fn(x, y, 2, 1)))
    gx = jax.grad(loss(correlation_xla), argnums=(0, 1))(a1, a2)
    gm = jax.grad(loss(correlation_mm), argnums=(0, 1))(a1, a2)
    for a, b in zip(gx, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d,s", [(2, 1), (4, 2), (8, 2)])
def test_pallas_mm_matches_oracle(feats, d, s):
    from dtt.ops.correlation import correlation_pallas_mm
    f1, f2 = feats
    want = np_correlation(f1, f2, d, s)
    got = np.asarray(correlation_pallas_mm(jnp.asarray(f1), jnp.asarray(f2),
                                           d, s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_mm_row_tiling(rng):
    """multi-tile row grid (h=6, row_block=4 -> 2 tiles w/ padding) matches
    the oracle, including the shifted f2 reads across tile boundaries."""
    from dtt.ops.correlation import _correlation_pallas_mm_raw
    f1 = rng.randn(6, 9, 40).astype(np.float32)
    f2 = rng.randn(6, 9, 40).astype(np.float32)
    want = np_correlation(f1, f2, 2, 2)
    got = np.asarray(_correlation_pallas_mm_raw(
        jnp.asarray(f1), jnp.asarray(f2), 2, 2, row_block=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_mm_gradients_match(feats):
    from dtt.ops.correlation import correlation_pallas_mm
    f1, f2 = feats
    a1, a2 = jnp.asarray(f1), jnp.asarray(f2)

    def loss(fn):
        return lambda x, y: jnp.sum(fn(x, y, 2, 2) ** 2)

    gx = jax.grad(loss(correlation_xla), argnums=(0, 1))(a1, a2)
    gp = jax.grad(loss(correlation_pallas_mm), argnums=(0, 1))(a1, a2)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_mm_vmap(feats):
    from dtt.ops.correlation import correlation_pallas_mm
    f1, f2 = feats
    b1 = jnp.stack([jnp.asarray(f1)] * 3)
    b2 = jnp.stack([jnp.asarray(f2)] * 3)
    out = jax.vmap(lambda a, b: correlation_pallas_mm(a, b, 2, 2))(b1, b2)
    want = np_correlation(f1, f2, 2, 2)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out[i]), want,
                                   rtol=1e-5, atol=1e-5)


def test_auto_row_block_production_shapes():
    """The auto picker must choose whole-frame tiles (ht=1) at every
    production correlation scale — the 8-row tiling it replaces measured
    3.5-12.7x slower on v5e (BASELINE.md round 4) — and fall back to
    multiple-of-8 tiles only when a frame cannot fit scoped VMEM."""
    from dtt.ops.correlation import _auto_row_block, _VMEM_LIMIT
    for h, w, c in ((19, 34, 512), (38, 68, 1024)):  # c3p, c4/c5
        assert _auto_row_block(h, w, c, 81, 8, 2) == h
    # a pathologically tall/wide map must fall back to a multiple of 8,
    # and the returned tile must genuinely fit the hard VMEM limit
    # (ADVICE round 4: the old fallback returned 8 unchecked)
    rb = _auto_row_block(512, 512, 1024, 81, 8, 2)
    assert rb < 512 and rb % 8 == 0
    tile = (rb * 512 * 1024 + (rb + 16) * 528 * 1024) * 2 + 81 * rb * 512 * 4
    assert 2 * tile + rb * 512 * 528 * 4 <= _VMEM_LIMIT
    # a shape whose MINIMUM tile exceeds the hard limit fails loudly at
    # trace time instead of as an opaque Mosaic VMEM error
    with pytest.raises(ValueError, match="VMEM"):
        _auto_row_block(512, 1024, 2048, 81, 8, 4)


@pytest.mark.parametrize("d,s", [(2, 1), (4, 2), (8, 2)])
def test_mm_diag_matches_oracle(feats, d, s):
    """Strided-slice diagonal extraction equals the selector-einsum band
    readout (and hence the oracle)."""
    from dtt.ops.correlation import correlation_mm_diag
    f1, f2 = feats
    want = np_correlation(f1, f2, d, s)
    got = np.asarray(correlation_mm_diag(jnp.asarray(f1), jnp.asarray(f2),
                                         d, s))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
