"""Model-layer tests: backbone, RPN/proposals, target assignment, full D&T."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.core.config import Config
from dtt.core.anchors import grid_anchors_for
from dtt.models.resnet import ResNetBackbone, tiny_resnet
from dtt.models.rpn import RPNHead, proposal_layer, smooth_l1
from dtt.models.targets import anchor_target, label_all_rois, proposal_target
from dtt.models.dnt import (decode_frame_detections, detect_frame, make_model,
                            track_rois)


def tiny_config():
    cfg = Config()
    return cfg.replace(model=cfg.model.replace(
        backbone="tiny", dtype="float32", frozen_stages=0, reduced_channels=64,
        num_classes=4,
        rpn=cfg.model.rpn.replace(channels=32, pre_nms_top_n_test=64,
                                  post_nms_top_n_test=16,
                                  pre_nms_top_n_train=64,
                                  post_nms_top_n_train=32),
        roi=cfg.model.roi.replace(ps_grid=3, batch_size=16),
        track=cfg.model.track.replace(max_displacement=2, stride=1),
    ))


# ---------------------------------------------------------------- backbone

def test_backbone_strides(rng):
    m = tiny_resnet()
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = m.apply(params, x)
    assert c3.shape == (1, 8, 12, 512)
    assert c4.shape == (1, 4, 6, 1024)
    assert c5.shape == (1, 4, 6, 2048)   # dilated: same stride as c4


def test_frozen_stages_and_bn_take_no_grad(rng):
    m = ResNetBackbone((1, 1, 1, 1), frozen_stages=2, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        c3, c4, c5 = m.apply(p, x)
        return jnp.sum(c5 ** 2) + jnp.sum(c3 ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in flat:
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        l = np.asarray(leaf)
        if "conv1" == name.split("/")[1] or "/layer1/" in name or "bn" in name \
           or "downsample_bn" in name:
            assert not l.any(), f"frozen param {name} got gradient"
        elif "/layer3/" in name and "conv" in name:
            assert l.any(), f"trainable param {name} has zero gradient"


# ---------------------------------------------------------------- proposals

def test_proposal_layer_recovers_planted_box(rng):
    """Plant one high-score anchor with known deltas; it must come out first."""
    cfg = tiny_config()
    h, w = 8, 8
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, h, w))
    a = cfg.model.anchors.num_anchors
    cls = np.full((h, w, 2 * a), -5.0, np.float32)
    cls[..., 1::2] = -10.0        # every fg logit low
    target_cell, target_a = (3, 4), 2
    cls[target_cell[0], target_cell[1], 2 * target_a + 1] = 10.0
    bbox = np.zeros((h, w, 4 * a), np.float32)
    props = proposal_layer(jnp.asarray(cls), jnp.asarray(bbox), anchors,
                           128, 128, 1.0, cfg.model.rpn, train=False)
    assert bool(props.valid[0])
    flat_idx = (target_cell[0] * w + target_cell[1]) * a + target_a
    expect = np.asarray(
        jnp.clip(anchors[flat_idx], 0, 127))
    got = np.asarray(props.rois[0])
    np.testing.assert_allclose(got, [expect[0], expect[1],
                                     min(expect[2], 127), min(expect[3], 127)],
                               atol=1e-4)
    # padding slots zeroed
    assert np.all(np.asarray(props.rois)[~np.asarray(props.valid)] == 0)


def test_proposal_layer_detached_at_train(rng):
    """Train-mode proposals carry NO gradient to the RPN outputs (reference
    parity: the lineage's proposal layer runs on .data/numpy, so regression
    TARGETS built from rois must be constants — round-4 fix; without the
    detach, encode(rois, gt) backprops into the RPN bbox head with the
    wrong sign)."""
    cfg = tiny_config()
    h, w = 8, 8
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, h, w))
    a = cfg.model.anchors.num_anchors
    cls = jnp.asarray(rng.randn(h, w, 2 * a).astype(np.float32))
    bbox = jnp.asarray(rng.randn(h, w, 4 * a).astype(np.float32) * 0.1)

    def roi_sum(rc, rb, train):
        p = proposal_layer(rc, rb, anchors, 128, 128, 1.0, cfg.model.rpn,
                           train=train)
        return jnp.sum(p.rois) + jnp.sum(p.scores)

    g_cls, g_bbox = jax.grad(lambda rc, rb: roi_sum(rc, rb, True),
                             argnums=(0, 1))(cls, bbox)
    assert not np.asarray(g_cls).any()
    assert not np.asarray(g_bbox).any()
    # eval mode keeps the (unused) differentiable path intact
    g_cls_e, _ = jax.grad(lambda rc, rb: roi_sum(rc, rb, False),
                          argnums=(0, 1))(cls, bbox)
    assert np.asarray(g_cls_e).any()


def test_smooth_l1_values():
    pred = jnp.asarray([0.0, 2.0])
    tgt = jnp.asarray([0.05, 0.0])
    out = np.asarray(smooth_l1(pred, tgt, sigma=1.0))
    np.testing.assert_allclose(out, [0.5 * 0.05 ** 2, 1.5], rtol=1e-5)


# ---------------------------------------------------------------- targets

def test_anchor_target_basic(rng):
    cfg = tiny_config()
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, 8, 8))
    gt = jnp.asarray([[30.0, 30.0, 80.0, 80.0], [0.0, 0.0, 0.0, 0.0]])
    gt_valid = jnp.asarray([True, False])
    out = anchor_target(anchors, gt, gt_valid, 128, 128,
                        jax.random.PRNGKey(0), cfg.model.rpn)
    labels = np.asarray(out.labels)
    pos, neg = (labels == 1).sum(), (labels == 0).sum()
    assert pos >= 1, "the best-matching anchor must be positive"
    assert pos + neg <= cfg.model.rpn.batch_size
    assert neg > 0
    # all positives must truly overlap the gt
    from dtt.core import boxes as box_ops
    iou = np.asarray(box_ops.pairwise_iou(anchors, gt[:1]))[:, 0]
    assert iou[labels == 1].min() > 0.3
    # targets zero for non-positives, weights only on positives
    bt = np.asarray(out.bbox_targets)
    assert np.all(bt[labels != 1] == 0)
    assert np.all((np.asarray(out.bbox_weights) > 0) == (labels == 1))


def test_anchor_target_respects_budget(rng):
    """With everything positive, sampling must cap at fg_fraction*batch."""
    cfg = tiny_config()
    gt = jnp.asarray([[0.0, 0.0, 127.0, 127.0]])
    anchors = jnp.asarray(
        np.tile(np.array([[0, 0, 127, 127]], np.float32), (600, 1)))
    out = anchor_target(anchors, gt, jnp.asarray([True]), 128, 128,
                        jax.random.PRNGKey(1), cfg.model.rpn)
    labels = np.asarray(out.labels)
    assert (labels == 1).sum() == int(cfg.model.rpn.fg_fraction * cfg.model.rpn.batch_size)


def test_proposal_target_sampling(rng):
    cfg = tiny_config()
    g = 3
    gt = jnp.asarray([[10.0, 10.0, 40.0, 40.0],
                      [60.0, 60.0, 100.0, 100.0],
                      [0.0, 0.0, 0.0, 0.0]])
    gt_labels = jnp.asarray([1, 3, 0])
    gt_valid = jnp.asarray([True, True, False])
    gt_tau = gt + 5.0
    gt_valid_tau = jnp.asarray([True, False, False])
    rois = jnp.asarray(rng.uniform(0, 120, (40, 4)).astype(np.float32))
    rois = rois.at[:, 2:].set(rois[:, :2] + 20.0)
    out = proposal_target(rois, jnp.ones(40, bool), gt, gt_labels, gt_valid,
                          gt_tau, gt_valid_tau, jax.random.PRNGKey(0),
                          cfg.model.roi, cfg.model.track)
    assert out.rois.shape == (cfg.model.roi.batch_size, 4)
    labels = np.asarray(out.labels)
    fg = labels > 0
    assert fg.sum() >= 2, "the appended gt boxes guarantee fg samples"
    assert fg.sum() <= int(round(cfg.model.roi.fg_fraction * cfg.model.roi.batch_size))
    assert set(np.unique(labels[fg])) <= {1, 3}
    # tracking weights only where the matched track is visible at t+τ (gt 0)
    tw = np.asarray(out.track_weights) > 0
    assert tw.sum() >= 1
    assert np.all(labels[tw] == 1)   # track 0 has class 1
    np.testing.assert_array_equal(np.asarray(out.bbox_weights) > 0, fg)


def test_label_all_rois_no_sampling(rng):
    cfg = tiny_config()
    gt = jnp.asarray([[10.0, 10.0, 60.0, 60.0]])
    rois = jnp.asarray([[12.0, 12.0, 58.0, 58.0], [200.0, 200.0, 250.0, 250.0]])
    out = label_all_rois(rois, jnp.ones(2, bool), gt, jnp.asarray([2]),
                         jnp.asarray([True]), gt, jnp.asarray([True]),
                         cfg.model.roi, cfg.model.track)
    assert out.rois.shape == (3, 4)  # 2 rois + 1 appended gt
    np.testing.assert_array_equal(np.asarray(out.labels), [2, 0, 2])


# ---------------------------------------------------------------- full model

@pytest.fixture(scope="module")
def dnt_setup():
    cfg = tiny_config()
    model = make_model(cfg.model)
    h, w = 64, 96
    pairs = jnp.asarray(np.random.RandomState(0).randn(1, 2, h, w, 3)
                        .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pairs)
    return cfg, model, params, pairs


def test_dnt_forward_shapes(dnt_setup):
    cfg, model, params, pairs = dnt_setup
    f_t, f_tau, track = model.apply(params, pairs)
    k2 = cfg.model.roi.ps_grid ** 2
    assert f_t.cls_maps.shape == (1, 4, 6, k2 * cfg.model.num_classes)
    assert f_t.bbox_maps.shape == (1, 4, 6, k2 * 8)
    assert track.shape == (1, 4, 6, k2 * 4)


def test_dnt_detect_and_track(dnt_setup):
    cfg, model, params, pairs = dnt_setup
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, 4, 6))
    f_t, f_tau, track = model.apply(params, pairs)
    props, det = detect_frame(cfg.model, f_t, anchors, 64, 96, 1.0)
    n = cfg.model.rpn.post_nms_top_n_test
    assert det.cls_prob.shape == (n, cfg.model.num_classes)
    assert det.bbox_pred.shape == (n, 8)
    deltas = track_rois(cfg.model, track, det.rois)
    assert deltas.shape == (n, 4)
    out = decode_frame_detections(cfg.model, det, 64, 96, 0.0, 0.3, 5,
                                  track_deltas=deltas)
    boxes, scores, valid, tracked = out
    c = cfg.model.num_classes - 1
    assert boxes.shape == (c, 5, 4) and tracked.shape == (c, 5, 4)
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(tracked)).all()


def test_batched_detection_matches_per_frame(dnt_setup):
    from dtt.models.dnt import (decode_detections_batched,
                                detect_frames_batched, track_rois_batched)
    cfg, model, params, pairs = dnt_setup
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, 4, 6))
    f_t, f_tau, track = model.apply(params, pairs)
    # batched path
    propsb, detb = detect_frames_batched(cfg.model, f_t, anchors, 64, 96, 1.0)
    deltasb = track_rois_batched(cfg.model, track, detb.rois)
    outb = decode_detections_batched(cfg.model, detb, 64, 96, 0.0, 0.3, 5,
                                     track_deltas=deltasb)
    # per-frame path
    props, det = detect_frame(cfg.model, f_t, anchors, 64, 96, 1.0)
    deltas = track_rois(cfg.model, track, det.rois)
    out = decode_frame_detections(cfg.model, det, 64, 96, 0.0, 0.3, 5,
                                  track_deltas=deltas)
    for a, b in zip(outb, out):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_dnt_jit_full_pair(dnt_setup):
    cfg, model, params, pairs = dnt_setup

    @jax.jit
    def fwd(p, x):
        f_t, f_tau, track = model.apply(p, x)
        return f_t.cls_maps.sum() + track.sum()

    v1 = fwd(params, pairs)
    v2 = fwd(params, pairs)
    assert np.isfinite(float(v1)) and float(v1) == float(v2)


def test_anchor_target_excludes_canvas_padding(rng):
    """Anchors beyond the true image extent must never be sampled."""
    cfg = tiny_config()
    acfg = cfg.model.anchors.replace(scales=(1.0, 2.0))
    anchors = jnp.asarray(grid_anchors_for(acfg, 8, 8))
    gt = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    # true image is only 64x64 of the 128x128 canvas
    out = anchor_target(anchors, gt, jnp.asarray([True]), 64, 64,
                        jax.random.PRNGKey(0), cfg.model.rpn)
    labels = np.asarray(out.labels)
    sampled = labels >= 0
    a = np.asarray(anchors)
    inside = (a[:, 0] >= 0) & (a[:, 1] >= 0) & (a[:, 2] < 64) & (a[:, 3] < 64)
    assert sampled.any()
    assert not sampled[~inside].any(), "padding anchors were sampled"


def test_bbox_normalize_targets_precomputed_flag(rng):
    """cfg.roi.bbox_normalize_targets_precomputed (dead config in round 2):
    off => raw encode() deltas (no stds division), and the decode side skips
    denormalization through the same roi_norm_params helper."""
    from dtt.core import boxes as box_ops
    from dtt.models.targets import roi_norm_params

    cfg = Config().model.roi
    cfg_off = cfg.replace(bbox_normalize_targets_precomputed=False)

    m_on, s_on = roi_norm_params(cfg)
    m_off, s_off = roi_norm_params(cfg_off)
    np.testing.assert_allclose(np.asarray(s_on), cfg.bbox_normalize_stds)
    np.testing.assert_allclose(np.asarray(m_off), 0.0)
    np.testing.assert_allclose(np.asarray(s_off), 1.0)

    # encode->decode roundtrip consistent under BOTH settings
    rois = jnp.asarray([[10.0, 10.0, 50.0, 40.0]])
    gt = jnp.asarray([[12.0, 8.0, 55.0, 46.0]])
    for m, s in ((m_on, s_on), (m_off, s_off)):
        deltas = box_ops.encode_boxes(rois, gt, m, s)
        back = box_ops.decode_boxes(rois, deltas, m, s)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt),
                                   rtol=1e-5, atol=1e-3)


def test_rpn_loss_inside_weight_scales_diff():
    """cfg.rpn.bbox_inside_weight scales the regression diff BEFORE the
    smooth-L1 hinge (reference _smooth_l1_loss semantics), so halving it is
    NOT the same as halving the loss for large diffs."""
    from dtt.models.rpn import rpn_loss

    a = 12
    rpn_cls = jnp.zeros((1, 1, 2 * a))
    rpn_bbox = jnp.zeros((1, 1, 4 * a))
    labels = jnp.zeros((a,), jnp.int32).at[0].set(1)
    targets = jnp.zeros((a, 4)).at[0].set(2.0)   # large diff: linear region
    weights = jnp.zeros((a,)).at[0].set(1.0)

    _, box_full = rpn_loss(rpn_cls, rpn_bbox, labels, targets, weights,
                           sigma=1.0, inside_weight=1.0)
    _, box_half = rpn_loss(rpn_cls, rpn_bbox, labels, targets, weights,
                           sigma=1.0, inside_weight=0.5)
    # |diff|=2: loss 4*(2-0.5)=6; |diff|=1: 4*(1-0.5)=2 — NOT 6/2
    np.testing.assert_allclose(float(box_full), 6.0, rtol=1e-6)
    np.testing.assert_allclose(float(box_half), 2.0, rtol=1e-6)
