"""uint8 image transfer + device-side normalization is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtt.core.config import load_config
from dtt.core.anchors import grid_anchors_for
from dtt.data.synthetic import synthetic_batch
from dtt.models.dnt import normalize_device_images
from dtt.train.losses import batch_loss
from dtt.train.trainer import create_train_state


def test_normalize_device_images_matches_host(rng):
    means = (102.98, 115.95, 122.77)
    img = rng.randint(0, 256, (2, 32, 48, 3)).astype(np.uint8)
    im_size = jnp.asarray([32.0, 48.0])
    dev = normalize_device_images(jnp.asarray(img), im_size, means)
    host = img.astype(np.float32) - np.asarray(means, np.float32)
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_normalize_device_images_zeroes_padding(rng):
    means = (10.0, 20.0, 30.0)
    img = rng.randint(1, 256, (16, 24, 3)).astype(np.uint8)
    dev = np.asarray(normalize_device_images(jnp.asarray(img),
                                             jnp.asarray([12.0, 20.0]), means))
    assert (dev[12:] == 0).all() and (dev[:, 20:] == 0).all()
    np.testing.assert_array_equal(
        dev[:12, :20], img[:12, :20].astype(np.float32) - np.asarray(means, np.float32))


def test_normalize_passthrough_float(rng):
    x = jnp.asarray(rng.randn(4, 4, 3).astype(np.float32))
    out = normalize_device_images(x, jnp.asarray([4.0, 4.0]), (1.0, 2.0, 3.0))
    assert out is x


@pytest.mark.slow
def test_uint8_batch_loss_equals_float_loss(rng):
    cfg = load_config("configs/tiny_synth.yml")
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32))
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, h // 16, w // 16))

    b_u8 = synthetic_batch(np.random.RandomState(3), 2, h, w,
                           cfg.model.num_classes, cfg.input.max_gt_boxes,
                           cfg.input.pixel_means, uint8=True)
    b_f32 = dict(b_u8)
    b_f32["images"] = (b_u8["images"].astype(np.float32)
                       - np.asarray(cfg.input.pixel_means, np.float32))

    key = jax.random.PRNGKey(1)
    loss_u8, lb_u8 = jax.jit(batch_loss, static_argnums=(0, 1))(
        cfg, model, state.params, anchors, b_u8, key)
    loss_f, lb_f = jax.jit(batch_loss, static_argnums=(0, 1))(
        cfg, model, state.params, anchors, b_f32, key)
    np.testing.assert_allclose(float(loss_u8), float(loss_f), rtol=1e-6)
