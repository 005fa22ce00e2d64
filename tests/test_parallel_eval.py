"""Data-parallel video inference over a device mesh (make_video_step_parallel).

The serial video step is the oracle: sharding frames over the mesh with a
one-frame ppermute halo must reproduce the single-device pipeline exactly
(per-frame work is batch-independent; the halo carries the identical
neighbor features the serial shift reads). Runs on the conftest-provided
8-virtual-CPU-device backend — the standard no-pod shard_map test setup
(SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.data.synthetic import synthetic_snippet
from dtt.eval.inference import (evaluate_snippet_video, make_video_step,
                                make_video_step_parallel)
from dtt.models.dnt import make_model
from dtt.parallel.mesh import data_mesh
from tests.test_models import tiny_config


pytestmark = pytest.mark.slow  # compiles production-ish models; run via `pytest -m slow`


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = cfg.replace(input=cfg.input.replace(canvas_height=64,
                                              canvas_width=96,
                                              max_gt_boxes=4))
    model = make_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 64, 96, 3), jnp.float32))
    return cfg, model, params


@pytest.mark.parametrize("pooling_mode", ["psroi", "align"])
def test_parallel_matches_serial(setup, pooling_mode):
    """8-way sharded chunk == serial chunk, both fused and plain head paths."""
    cfg, model, params = setup
    cfg = cfg.replace(model=cfg.model.replace(
        roi=cfg.model.roi.replace(pooling_mode=pooling_mode)))
    mesh = data_mesh(jax.devices()[:8])
    pstep = make_video_step_parallel(cfg, model, mesh, frames_per_device=1)
    f = pstep.frames_per_chunk
    assert f == 8
    sstep = make_video_step(cfg, model, f)

    frames = jnp.asarray(np.random.RandomState(3)
                         .randn(f, 64, 96, 3).astype(np.float32) * 40.0)
    im_hw = jnp.asarray([64.0, 96.0])
    ser = sstep(params, frames, im_hw, jnp.float32(1.0))
    par = pstep(params, frames, im_hw, jnp.float32(1.0))
    # serial yields f-1 pairs; parallel yields f, the last wrapping the mesh
    assert par.boxes.shape[0] == f
    # conv tiling differs between batch f and batch f/8, so results match to
    # float noise, not bitwise; `valid` flips would exceed any atol<1
    for s, p, name in ((ser.boxes, par.boxes, "boxes"),
                       (ser.scores, par.scores, "scores"),
                       (ser.valid, par.valid, "valid"),
                       (ser.tracked, par.tracked, "tracked")):
        np.testing.assert_allclose(np.asarray(p)[:f - 1], np.asarray(s),
                                   rtol=1e-4, atol=5e-3, err_msg=name)


def test_parallel_snippet_eval_end_to_end(setup):
    """evaluate_snippet_video drives the parallel step unchanged: chunking,
    overlap, tail padding and the wrap-around garbage pair all reconcile."""
    cfg, model, params = setup
    mesh = data_mesh(jax.devices()[:4])
    pstep = make_video_step_parallel(cfg, model, mesh, frames_per_device=2)
    sstep = make_video_step(cfg, model, pstep.frames_per_chunk)

    imgs, *_ = synthetic_snippet(np.random.RandomState(0), 11, 64, 96,
                                 cfg.model.num_classes, 4)
    frames = imgs - 120.0  # mean-subtracted float path
    ser = evaluate_snippet_video(cfg, sstep, params, frames)
    par = evaluate_snippet_video(cfg, pstep, params, frames)
    for s, p, name in zip(ser, par, ("boxes", "scores", "valid", "tracked")):
        assert p.shape == s.shape
        np.testing.assert_allclose(p, s, rtol=1e-4, atol=5e-3, err_msg=name)


def test_parallel_uint8_normalization(setup):
    """uint8 chunks are normalized per shard with the exact-zero padding
    invariant intact (im_hw smaller than the canvas)."""
    cfg, model, params = setup
    mesh = data_mesh(jax.devices()[:4])
    pstep = make_video_step_parallel(cfg, model, mesh, frames_per_device=1)
    sstep = make_video_step(cfg, model, pstep.frames_per_chunk)
    frames = np.random.RandomState(1).randint(
        0, 256, (pstep.frames_per_chunk, 64, 96, 3), np.uint8)
    frames[:, 48:, :, :] = 0
    frames[:, :, 80:, :] = 0
    im_hw = jnp.asarray([48.0, 80.0])
    ser = sstep(params, jnp.asarray(frames), im_hw, jnp.float32(1.0))
    par = pstep(params, jnp.asarray(frames), im_hw, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(par.scores)[:-1],
                               np.asarray(ser.scores), rtol=1e-4, atol=5e-3)


def test_parallel_pair_step_matches_serial(setup):
    """τ-strided path: pair batch sharded over the mesh == serial batches
    (pairs are independent; no halo involved)."""
    from dtt.eval.inference import evaluate_snippet, make_pair_step, \
        make_pair_step_parallel
    cfg, model, params = setup
    mesh = data_mesh(jax.devices()[:4])
    pstep = make_pair_step_parallel(cfg, model, mesh, pairs_per_device=1)
    assert pstep.batch == 4

    imgs, *_ = synthetic_snippet(np.random.RandomState(5), 9, 64, 96,
                                 cfg.model.num_classes, 4)
    frames = imgs - 120.0
    sstep = make_pair_step(cfg, model)
    ser = evaluate_snippet(cfg, sstep, params, frames, tau=2, batch=4)
    par = evaluate_snippet(cfg, pstep, params, frames, tau=2,
                           batch=pstep.batch)
    assert ser[-1] == par[-1]  # same evaluated keyframes
    for s, p, name in zip(ser[:4], par[:4],
                          ("boxes", "scores", "valid", "tracked")):
        np.testing.assert_allclose(p, s, rtol=1e-4, atol=5e-3, err_msg=name)
