"""Device-side synthetic rendering: pixel parity with the host renderer,
background distribution, and the render_fn train-step path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtt.data import device_synth, synthetic


def _params(rng, h, w, num_classes=7, max_gt=5):
    return synthetic.sample_pair_params(rng, h, w, num_classes, max_gt,
                                        num_objects=(2, 4))


def test_device_render_matches_host_pixels(rng):
    """Same boxes + same background => same uint8 pixels (objects included).
    jnp.sin vs np.sin may flip the round() of a handful of texture pixels
    by 1 — bound it; everything else must be exact."""
    h, w = 64, 96
    for trial in range(3):
        p = _params(rng, h, w)
        background = np.full((h, w, 3), 29, np.uint8)
        for f in range(2):
            host = synthetic.render_frame(background.copy(),
                                          p["gt_boxes"][f], p["gt_labels"],
                                          p["gt_valid"][f])
            dev = np.asarray(device_synth.render_frame(
                jnp.asarray(p["gt_boxes"][f]), jnp.asarray(p["gt_labels"]),
                jnp.asarray(p["gt_valid"][f]), jnp.asarray(background)))
            diff = np.abs(host.astype(int) - dev.astype(int))
            assert diff.max() <= 1, diff.max()
            assert (diff == 0).mean() > 0.999


def test_class_codes_pairwise_separable():
    """Every class pair 1..30 differs by >= 70 on some channel — more than
    2x the stripe amplitude (20), so no two classes can collapse onto the
    same appearance after downscale/quantization. Regression for the
    round-2 code where 5<->20 and 17<->2 differed by only 30 on one
    channel and both scored persistent AP 0.0 in the flagship run."""
    yy = np.zeros((1, 1), np.float32)
    bases = np.array([synthetic.object_texture(c, yy, yy)[0, 0]
                      for c in range(1, 31)])     # stripe is shared at (0,0)
    for i in range(30):
        for j in range(i + 1, 30):
            assert np.abs(bases[i] - bases[j]).max() >= 70.0 - 1e-4, (i, j)


def test_device_render_skips_invalid_and_degenerate(rng):
    h, w = 32, 32
    boxes = np.array([[5, 5, 20, 20], [8, 8, 8, 8], [2, 2, 25, 25]],
                     np.float32)
    labels = np.array([1, 2, 3], np.int32)
    background = np.zeros((h, w, 3), np.uint8)
    # slot 1 degenerate, slot 2 invalid -> only slot 0 drawn
    valid = np.array([True, True, False])
    dev = np.asarray(device_synth.render_frame(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        jnp.asarray(background)))
    host = synthetic.render_frame(background.copy(), boxes, labels, valid)
    np.testing.assert_array_equal(dev, host)
    assert (dev[:, 28:] == 0).all()       # slot 2's area untouched


def test_render_pairs_background_distribution():
    h, w = 24, 40
    out = np.asarray(device_synth.render_pairs(
        jnp.zeros((2, 2, 3, 4)), jnp.zeros((2, 3), jnp.int32),
        jnp.zeros((2, 2, 3), bool), jax.random.PRNGKey(0), h, w))
    assert out.shape == (2, 2, h, w, 3) and out.dtype == np.uint8
    assert out.min() >= 23 and out.max() <= 37   # host generator's range
    assert 28 < out.mean() < 32


@pytest.mark.slow
def test_device_render_train_step_runs(rng):
    """make_train_step(render_fn=...) trains from KB-scale scene params:
    finite loss, and the rendered path's loss matches a host-rendered batch
    of the same scene (backgrounds differ -> compare only finiteness here;
    exactness is covered by the pixel-parity test)."""
    from dtt.core.config import load_config
    from dtt.data.device_synth import make_pair_render_fn
    from dtt.data.synthetic import sample_params_batch
    from dtt.train.trainer import create_train_state, make_train_step

    cfg = load_config("configs/tiny_synth.yml")
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32))
    step = make_train_step(cfg, model, (h // 16, w // 16),
                           render_fn=make_pair_render_fn(h, w))
    batch = sample_params_batch(np.random.RandomState(0), 2, h, w,
                                cfg.model.num_classes, cfg.input.max_gt_boxes)
    assert "images" not in batch
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert int(state2.step) == 1
