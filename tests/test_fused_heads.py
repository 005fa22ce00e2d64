"""Fused-heads eval path parity (DnT.fused_psmaps / detect_track_fused).

The fused path assembles the cls/bbox/track 1x1 kernels into ONE conv over
the tracking input and pools ONCE (per-bin [cls | bbox | track] layout); it
must match the three-conv + three-pool path exactly up to float accumulation
order (ref: test_net.py computes the same quantities as separate ops).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtt.core.anchors import grid_anchors_for
from dtt.models.dnt import (DnT, detect_frames_batched, detect_track_fused,
                            make_model, track_rois_batched)
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = cfg.replace(input=cfg.input.replace(canvas_height=64, canvas_width=96,
                                              max_gt_boxes=4))
    model = make_model(cfg.model)
    pairs = jnp.zeros((2, 2, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pairs)
    rng = np.random.RandomState(3)
    pairs = jnp.asarray(rng.randn(2, 2, 64, 96, 3).astype(np.float32))
    return cfg, model, params, pairs


def _frame_split(model, params, pairs, method):
    flat = pairs.reshape(-1, *pairs.shape[2:])
    feats = model.apply(params, flat, method=method)
    f_t = jax.tree.map(lambda x: x[0::2], feats)
    f_tau = jax.tree.map(lambda x: x[1::2], feats)
    return f_t, f_tau


def test_fused_psmaps_layout(setup):
    """Fused maps == per-bin interleave of the three separate head maps."""
    cfg, model, params, pairs = setup
    mc = cfg.model
    k2 = mc.roi.ps_grid ** 2
    dc = mc.num_classes
    db = 8 if mc.roi.class_agnostic else 4 * mc.num_classes

    f_t, f_tau = _frame_split(model, params, pairs, DnT.frame_features)
    track_maps = model.apply(params, f_t, f_tau, method=DnT.track_psmaps)
    t_t, t_tau = _frame_split(model, params, pairs, DnT.frame_trunk)
    fused = model.apply(params, t_t, t_tau, method=DnT.fused_psmaps)

    b, h, w, _ = fused.shape
    fb = fused.reshape(b, h, w, k2, dc + db + 4)
    np.testing.assert_allclose(
        np.asarray(fb[..., :dc]),
        np.asarray(f_t.cls_maps.reshape(b, h, w, k2, dc)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fb[..., dc:dc + db]),
        np.asarray(f_t.bbox_maps.reshape(b, h, w, k2, db)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fb[..., dc + db:]),
        np.asarray(track_maps.reshape(b, h, w, k2, 4)),
        rtol=1e-5, atol=1e-4)


def test_detect_track_fused_parity(setup):
    """detect_track_fused == detect_frames_batched + track_rois_batched."""
    cfg, model, params, pairs = setup
    mc = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    anchors = jnp.asarray(grid_anchors_for(mc.anchors, h // 16, w // 16))

    f_t, f_tau = _frame_split(model, params, pairs, DnT.frame_features)
    props, det = detect_frames_batched(mc, f_t, anchors, h, w, 1.0)
    deltas = track_rois_batched(
        mc, model.apply(params, f_t, f_tau, method=DnT.track_psmaps),
        det.rois)

    t_t, t_tau = _frame_split(model, params, pairs, DnT.frame_trunk)
    fused_maps = model.apply(params, t_t, t_tau, method=DnT.fused_psmaps)
    props2, det2, deltas2 = detect_track_fused(mc, t_t, fused_maps, anchors,
                                               h, w, 1.0)

    np.testing.assert_array_equal(np.asarray(props.rois), np.asarray(props2.rois))
    np.testing.assert_allclose(np.asarray(det.cls_prob),
                               np.asarray(det2.cls_prob), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(det.bbox_pred),
                               np.asarray(det2.bbox_pred), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas), np.asarray(deltas2),
                               rtol=1e-5, atol=1e-4)


def test_fused_path_class_specific_boxes():
    """class_agnostic=False: per-class bbox regression flows through the
    fused heads AND the per-class decode branch (boxes reshaped (N, C, 4),
    bg column dropped) — fused decode == separate-heads decode."""
    from dtt.models.dnt import decode_detections_batched

    cfg = tiny_config()
    cfg = cfg.replace(
        input=cfg.input.replace(canvas_height=64, canvas_width=96),
        model=cfg.model.replace(
            roi=cfg.model.roi.replace(class_agnostic=False)))
    mc = cfg.model
    model = make_model(mc)
    rng = np.random.RandomState(5)
    pairs = jnp.asarray(rng.randn(2, 2, 64, 96, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros_like(pairs))

    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    anchors = jnp.asarray(grid_anchors_for(mc.anchors, h // 16, w // 16))

    f_t, f_tau = _frame_split(model, params, pairs, DnT.frame_features)
    assert f_t.bbox_maps.shape[-1] == mc.roi.ps_grid ** 2 * 4 * mc.num_classes
    props, det = detect_frames_batched(mc, f_t, anchors, h, w, 1.0)
    deltas = track_rois_batched(
        mc, model.apply(params, f_t, f_tau, method=DnT.track_psmaps),
        det.rois)

    t_t, t_tau = _frame_split(model, params, pairs, DnT.frame_trunk)
    fused_maps = model.apply(params, t_t, t_tau, method=DnT.fused_psmaps)
    props2, det2, deltas2 = detect_track_fused(mc, t_t, fused_maps, anchors,
                                               h, w, 1.0)
    np.testing.assert_allclose(np.asarray(det.bbox_pred),
                               np.asarray(det2.bbox_pred), rtol=1e-5, atol=1e-4)

    b1 = decode_detections_batched(mc, det, h, w, 0.0, 0.5, 8,
                                   track_deltas=deltas)
    b2 = decode_detections_batched(mc, det2, h, w, 0.0, 0.5, 8,
                                   track_deltas=deltas2)
    n_frames, c_fg = pairs.shape[0], mc.num_classes - 1
    assert b1[0].shape == (n_frames, c_fg, 8, 4)
    for a, b in zip(b1, b2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["pallas_mm", "direct"])
def test_detect_track_fused_pool_impls(setup, impl):
    """roi.eval_pool_impl variants match the gather pool through the full
    fused detection path (f32 model on CPU -> tight tolerance)."""
    cfg, model, params, pairs = setup
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, h // 16, w // 16))
    t_t, t_tau = _frame_split(model, params, pairs, DnT.frame_trunk)
    fused_maps = model.apply(params, t_t, t_tau, method=DnT.fused_psmaps)

    base = detect_track_fused(cfg.model, t_t, fused_maps, anchors, h, w, 1.0)
    mc = cfg.model.replace(roi=cfg.model.roi.replace(eval_pool_impl=impl))
    alt = detect_track_fused(mc, t_t, fused_maps, anchors, h, w, 1.0)
    np.testing.assert_array_equal(np.asarray(base[0].rois),
                                  np.asarray(alt[0].rois))
    np.testing.assert_allclose(np.asarray(base[1].cls_prob),
                               np.asarray(alt[1].cls_prob),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(base[1].bbox_pred),
                               np.asarray(alt[1].bbox_pred),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(base[2]), np.asarray(alt[2]),
                               rtol=1e-4, atol=1e-3)
