"""Space-to-depth stem: exact rearrangement of the 7x7/2 conv."""

import jax
import jax.numpy as jnp
import numpy as np

from dtt.models.resnet import StemConv


def test_s2d_stem_matches_direct_conv(rng):
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    direct = StemConv(16, jnp.float32, s2d=False)
    s2d = StemConv(16, jnp.float32, s2d=True)
    params = direct.init(jax.random.PRNGKey(0), x)
    y0 = direct.apply(params, x)
    y1 = s2d.apply(params, x)  # same params: kernel tree is identical
    assert y0.shape == y1.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_falls_back_on_odd_sizes(rng):
    x = jnp.asarray(rng.randn(1, 33, 47, 3).astype(np.float32))
    s2d = StemConv(8, jnp.float32, s2d=True)
    params = s2d.init(jax.random.PRNGKey(0), x)
    y = s2d.apply(params, x)
    assert y.shape == (1, 17, 24, 8)


def test_s2d_matches_reference_nn_conv(rng):
    """StemConv(s2d or not) == flax nn.Conv 7x7/2 with the same kernel."""
    import flax.linen as nn
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    ref = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    for flag in (False, True):
        y = StemConv(8, jnp.float32, s2d=flag).apply(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
