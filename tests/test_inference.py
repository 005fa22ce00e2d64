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
    pairs = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 2, 64, 96, 3).astype(np.float32))
    out = step(params, pairs, jnp.asarray([64.0, 96.0]), jnp.float32(1.0))
    c = cfg.model.num_classes - 1
    m = cfg.eval.max_per_class
    assert out.boxes.shape == (2, c, m, 4)
    assert out.scores.shape == (2, c, m)
    assert out.tracked.shape == (2, c, m, 4)
    assert np.isfinite(np.asarray(out.boxes)).all()
    # boxes clip to the TRUE extent, not the canvas
    out2 = step(params, pairs, jnp.asarray([32.0, 48.0]), jnp.float32(1.0))
    b = np.asarray(out2.boxes)[np.asarray(out2.valid)]
    if b.size:
        assert b[:, 2].max() <= 47.0 and b[:, 3].max() <= 31.0


def test_split_step_matches_single_program(setup):
    """EvalConfig.split_video_step (two-dispatch trunk|post split, the
    round-5 TPU scheduling fix) must be bit-identical to the one-program
    form for BOTH the video step and the pair step: the split only moves
    the jit boundary, never the math."""
    from dtt.eval.inference import make_video_step
    cfg, model, params = setup
    assert cfg.eval.split_video_step          # default exercises the split
    cfg_one = cfg.replace(eval=cfg.eval.replace(split_video_step=False))
    frames = jnp.asarray(np.random.RandomState(5)
                         .randn(5, 64, 96, 3).astype(np.float32))
    hw = jnp.asarray([64.0, 96.0])
    for mk, inp in ((make_video_step, frames),
                    (make_pair_step, frames[:4].reshape(2, 2, 64, 96, 3))):
        split_out = mk(cfg, model, 5)(params, inp, hw, jnp.float32(1.0)) \
            if mk is make_video_step else mk(cfg, model)(
                params, inp, hw, jnp.float32(1.0))
        one_out = mk(cfg_one, model, 5)(params, inp, hw, jnp.float32(1.0)) \
            if mk is make_video_step else mk(cfg_one, model)(
                params, inp, hw, jnp.float32(1.0))
        for a, b, name in zip(split_out, one_out,
                              ("boxes", "scores", "valid", "tracked")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


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


def test_interpolate_tubes_fills_skipped_frames():
    from types import SimpleNamespace
    # one class, one tube over keyframes t=0,2 (eval_ts), boxes move +10px
    det_idx = np.zeros((1, 1, 2), np.int64)
    tubes = SimpleNamespace(
        det_idx=det_idx,
        tube_valid=np.array([[True]]),
        det_in_tube=np.ones((1, 2, 1), bool),
        rescored=np.array([[[0.8], [0.6]]], np.float32),
    )
    boxes = np.zeros((1, 2, 1, 4), np.float32)
    boxes[0, 0, 0] = [0, 0, 10, 10]
    boxes[0, 1, 0] = [10, 0, 20, 10]
    from dtt.eval.inference import interpolate_tubes
    ts, cls0, sc, bx = interpolate_tubes(tubes, boxes, eval_ts=[0, 2],
                                         t_total=3)
    assert sorted(ts.tolist()) == [0, 1, 2]   # every frame covered once
    assert (cls0 == 0).all()
    mid = ts == 1
    np.testing.assert_allclose(bx[mid][0], [5, 0, 15, 10])  # midpoint box
    np.testing.assert_allclose(sc[mid][0], 0.7, rtol=1e-6)  # midpoint score
    np.testing.assert_allclose(bx[ts == 2][0], [10, 0, 20, 10])


def test_interpolate_tubes_bounded_trailing_extension():
    """With tau given, a tube's last keyframe extends <= tau-1 trailing
    frames (the stride gap), NOT to the snippet end: unbounded extension
    turned every 1-keyframe false-positive tube into T/tau detections
    (round-5 hard-bench tau=2 collapse)."""
    from types import SimpleNamespace
    from dtt.eval.inference import interpolate_tubes
    # one tube with a SINGLE keyframe at t=2 of a 16-frame snippet
    det_idx = np.zeros((1, 1, 8), np.int64)
    on = np.zeros((1, 8, 1), bool)
    on[0, 1, 0] = True                       # eval_ts index 1 -> frame 2
    tubes = SimpleNamespace(
        det_idx=det_idx, tube_valid=np.array([[True]]), det_in_tube=on,
        rescored=np.full((1, 8, 1), 0.9, np.float32))
    boxes = np.tile(np.asarray([0, 0, 10, 10], np.float32), (1, 8, 1, 1))
    eval_ts = list(range(0, 16, 2))
    ts, _, _, _ = interpolate_tubes(tubes, boxes, eval_ts, 16, tau=2)
    assert sorted(ts.tolist()) == [2, 3]     # keyframe + one skipped frame
    # without tau (backward-compat) the old unbounded behavior remains
    ts_old, *_ = interpolate_tubes(tubes, boxes, eval_ts, 16)
    assert sorted(ts_old.tolist()) == list(range(2, 16))


def test_video_step_matches_pair_step(setup):
    """Feature-sharing video path must equal the pair path exactly (τ=1)."""
    from dtt.eval.inference import evaluate_snippet_video, make_video_step
    cfg, model, params = setup
    imgs, *_ = synthetic_snippet(np.random.RandomState(2), 6, 64, 96,
                                 cfg.model.num_classes, 4)
    frames = imgs - 120.0
    pair_out = evaluate_snippet(cfg, make_pair_step(cfg, model), params,
                                frames, im_hw=(64, 96), scale=1.0)
    video_out = evaluate_snippet_video(cfg, make_video_step(cfg, model, 4),
                                       params, frames,
                                       im_hw=(64, 96), scale=1.0)
    for a, b, name in zip(pair_out, video_out,
                          ("boxes", "scores", "valid", "tracked")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["align", "pool", "crop"])
def test_pooling_mode_dispatch(mode):
    """cfg.roi.pooling_mode switches the live head (ref cfg.POOLING_MODE):
    the non-psroi modes pool plain score maps and must run end-to-end."""
    cfg = tiny_config()
    cfg = cfg.replace(
        model=cfg.model.replace(roi=cfg.model.roi.replace(pooling_mode=mode)),
        input=cfg.input.replace(canvas_height=64, canvas_width=96,
                                max_gt_boxes=4))
    model = make_model(cfg.model)
    pairs = jnp.asarray(np.random.RandomState(2)
                        .randn(1, 2, 64, 96, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pairs)
    # head convs emit ONE channel group in non-psroi modes
    kern = params["params"]["cls_maps"]["kernel"]
    assert kern.shape[-1] == cfg.model.num_classes
    step = make_pair_step(cfg, model)
    out = step(params, pairs, jnp.asarray([64.0, 96.0]), jnp.float32(1.0))
    assert np.isfinite(np.asarray(out.scores)).all()
    assert np.isfinite(np.asarray(out.tracked)).all()

    # and the training path (targets + OHEM + backward) compiles and is finite
    from dtt.data.synthetic import synthetic_batch
    from dtt.train.trainer import create_train_state, make_train_step
    batch = synthetic_batch(np.random.RandomState(0), 1, 64, 96,
                            cfg.model.num_classes, cfg.input.max_gt_boxes)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model2, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                       batch["images"][:1])
    tstep = make_train_step(cfg, model2, (4, 6))
    state, metrics = tstep(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))


@pytest.mark.slow
def test_uint8_eval_matches_float(rng):
    """uint8 frames into the jitted eval steps == host-normalized float32
    (device normalization is exact on integer pixels): tunnel uploads drop
    4x with identical detections."""
    import jax
    import jax.numpy as jnp
    from dtt.core.config import load_config
    from dtt.eval.inference import evaluate_snippet_video, make_video_step
    from dtt.train.trainer import create_train_state

    cfg = load_config("configs/tiny_synth.yml")
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32))
    step = make_video_step(cfg, model, frames_per_chunk=5)

    u8 = rng.randint(0, 256, (6, h, w, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) - np.asarray(cfg.input.pixel_means,
                                             np.float32)
    out_u8 = evaluate_snippet_video(cfg, step, state.params, u8)
    out_f = evaluate_snippet_video(cfg, step, state.params, f32)
    for a, b in zip(out_u8, out_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
