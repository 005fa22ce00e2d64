"""Inference driver tests (pair step, single-frame step, snippet eval)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.data.synthetic import synthetic_snippet
from dtt.eval.inference import (evaluate_snippet, link_snippet,
                                make_pair_step, make_single_frame_step)
from dtt.models.dnt import make_model
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = cfg.replace(input=cfg.input.replace(canvas_height=64, canvas_width=96,
                                              max_gt_boxes=4))
    model = make_model(cfg.model)
    pairs = jnp.zeros((1, 2, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pairs)
    return cfg, model, params


def test_pair_step_shapes(setup):
    cfg, model, params = setup
    step = make_pair_step(cfg, model)
    pair = jnp.asarray(np.random.RandomState(0)
                       .randn(1, 2, 64, 96, 3).astype(np.float32))
    out = step(params, pair)
    c = cfg.model.num_classes - 1
    m = cfg.eval.max_per_class
    assert out.boxes.shape == (c, m, 4)
    assert out.scores.shape == (c, m)
    assert out.tracked.shape == (c, m, 4)
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_single_frame_step(setup):
    """Driver config #1: single-frame R-FCN detection."""
    cfg, model, params = setup
    step = make_single_frame_step(cfg, model)
    img = jnp.asarray(np.random.RandomState(1)
                      .randn(1, 64, 96, 3).astype(np.float32))
    boxes, scores, valid = step(params, img)
    c = cfg.model.num_classes - 1
    assert boxes.shape == (c, cfg.eval.max_per_class, 4)
    assert np.isfinite(np.asarray(scores)).all()
    # kept boxes stay inside the image
    b = np.asarray(boxes)[np.asarray(valid)]
    if b.size:
        assert b[:, 0].min() >= 0 and b[:, 2].max() <= 95


def test_snippet_eval_and_linking(setup):
    cfg, model, params = setup
    imgs, *_ = synthetic_snippet(np.random.RandomState(0), 4, 64, 96,
                                 cfg.model.num_classes, 4)
    step = make_pair_step(cfg, model)
    boxes, scores, valid, tracked = evaluate_snippet(cfg, step, params,
                                                     imgs - 120.0)
    c = cfg.model.num_classes - 1
    assert boxes.shape == (c, 4, cfg.eval.max_per_class, 4)
    rescored, tubes = link_snippet(cfg, boxes, scores, tracked, valid)
    assert rescored.shape == scores.shape
    assert (rescored >= scores - 1e-5).all()
