"""Training-step tests: loss computes, decreases, and runs data-parallel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dtt.core.config import Config
from dtt.data.synthetic import synthetic_batch
from dtt.train.trainer import (create_train_state, make_data_mesh,
                               make_parallel_train_step, make_train_step,
                               shard_batch)

H, W = 64, 96


def tiny_config(**train_kw):
    cfg = Config()
    return cfg.replace(
        model=cfg.model.replace(
            backbone="tiny", dtype="float32", frozen_stages=0,
            reduced_channels=64, num_classes=4,
            # small anchors: default 64-512px boxes never fit a 64x96 image
            anchors=cfg.model.anchors.replace(scales=(1.0, 2.0, 4.0)),
            rpn=cfg.model.rpn.replace(channels=32, pre_nms_top_n_train=128,
                                      post_nms_top_n_train=32),
            roi=cfg.model.roi.replace(ps_grid=3, batch_size=16),
            track=cfg.model.track.replace(max_displacement=2, stride=1),
        ),
        train=cfg.train.replace(learning_rate=1e-3, ohem_top_k=16,
                                lr_decay_steps=(10**6,), **train_kw),
        input=cfg.input.replace(canvas_height=H, canvas_width=W, max_gt_boxes=4),
    )


def make_batch(cfg, b, seed=0):
    batch = synthetic_batch(np.random.RandomState(seed), b, H, W,
                            cfg.model.num_classes, cfg.input.max_gt_boxes)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("ohem", [True, pytest.param(False, marks=pytest.mark.slow)])
def test_train_step_runs_and_is_finite(ohem):
    cfg = tiny_config(ohem=ohem)
    batch = make_batch(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    step = make_train_step(cfg, model, (H // 16, W // 16))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert float(metrics["rpn_cls"]) > 0
    assert float(metrics["rfcn_cls"]) > 0
    assert int(state.step) == 1


@pytest.mark.slow
def test_loss_decreases():
    cfg = tiny_config(ohem=False)
    batch = make_batch(cfg, 2)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    step = make_train_step(cfg, model, (H // 16, W // 16))
    first = last = None
    for i in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))  # fixed key
        if first is None:
            first = float(metrics["total"])
        last = float(metrics["total"])
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_parallel_train_step_8_devices():
    assert jax.device_count() == 8, "conftest must provide 8 cpu devices"
    cfg = tiny_config()
    mesh = make_data_mesh()
    batch = make_batch(cfg, 8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    pstep = make_parallel_train_step(cfg, model, (H // 16, W // 16), mesh)
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state, metrics = pstep(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    # params identical on every device (replicated update)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8

    # parallel result == serial result on the same batch & key
    sstep = make_train_step(cfg, model, (H // 16, W // 16))
    _, state2 = create_train_state(cfg, jax.random.PRNGKey(0),
                                   batch["images"][:1])[0:2]
    model2, state2 = create_train_state(cfg, jax.random.PRNGKey(0),
                                        batch["images"][:1])
    _, m2 = sstep(state2, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["total"]), float(m2["total"]),
                               rtol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("ohem", [True, False])
def test_batched_loss_matches_vmapped_pair_loss(ohem):
    """batch_loss (one forward over 2B frames + batch-folded pools, round-4
    VERDICT task 4) must equal the vmapped per-pair formulation — same RNG
    key flow, same losses, for both target-assignment paths."""
    from dtt.train.losses import batch_loss, batch_loss_vmapped
    from dtt.core.anchors import grid_anchors_for
    from dtt.models.dnt import make_model

    cfg = tiny_config(ohem=ohem)
    batch = make_batch(cfg, 3, seed=4)
    model = make_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, H // 16, W // 16))
    key = jax.random.PRNGKey(7)

    _, lb_new = jax.jit(batch_loss, static_argnums=(0, 1))(
        cfg, model, params, anchors, batch, key)
    _, lb_old = jax.jit(batch_loss_vmapped, static_argnums=(0, 1))(
        cfg, model, params, anchors, batch, key)
    for name in lb_new._fields:
        np.testing.assert_allclose(
            float(getattr(lb_new, name)), float(getattr(lb_old, name)),
            rtol=2e-4, atol=1e-5, err_msg=name)


@pytest.mark.slow
def test_batched_loss_gradients_match():
    """Gradient parity: the batched formulation must backprop identically
    (pools moved out of the vmap must transpose the same)."""
    from dtt.train.losses import batch_loss, batch_loss_vmapped
    from dtt.core.anchors import grid_anchors_for
    from dtt.models.dnt import make_model

    cfg = tiny_config(ohem=False)
    batch = make_batch(cfg, 2, seed=9)
    model = make_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, H // 16, W // 16))
    key = jax.random.PRNGKey(3)

    g_new = jax.jit(jax.grad(
        lambda p: batch_loss(cfg, model, p, anchors, batch, key)[0]))(params)
    g_old = jax.jit(jax.grad(
        lambda p: batch_loss_vmapped(cfg, model, p, anchors, batch,
                                     key)[0]))(params)
    flat_new = jax.tree_util.tree_flatten_with_path(g_new)[0]
    flat_old = jax.tree_util.tree_flatten_with_path(g_old)[0]
    for (path, a), (_, b) in zip(flat_new, flat_old):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_frozen_params_never_updated():
    """Frozen leaves (BN affines, frozen stages) get exactly zero optimizer
    updates even under weight decay (review finding: add_decayed_weights
    updates zero-grad params)."""
    import optax
    from dtt.train.trainer import make_optimizer, _is_frozen
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(frozen_stages=2))
    batch = make_batch(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    tx = make_optimizer(cfg)
    p = state.params["params"]
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, p)
    updates, _ = jax.jit(tx.update)(zero_g, state.opt_state, p)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    n_frozen = n_bad = n_decayed = 0
    for path, leaf in flat:
        if _is_frozen(path, 2):
            n_frozen += 1
            n_bad += int(np.any(np.asarray(leaf) != 0))
        elif np.any(np.asarray(leaf) != 0):
            n_decayed += 1
    assert n_frozen > 0 and n_bad == 0
    assert n_decayed > 0  # weight decay still reaches trainable params


def test_ohem_nms_dedup_prevents_duplicate_crowding():
    """With ohem_nms_thresh, near-duplicate high-loss RoIs collapse to one
    hard example; a raw top-k would fill the budget with the duplicates."""
    from dtt.models.targets import RoITargets
    from dtt.train.losses import _rfcn_losses

    cfg = tiny_config(ohem=True)
    cfg = cfg.replace(train=cfg.train.replace(ohem_top_k=2))
    big = np.float32(8.0)    # CE of the duplicated hard RoI (logit margin)
    mid = np.float32(3.0)    # CE of the distinct medium RoI

    # 3 identical boxes with the big loss + 1 distinct box with medium loss
    rois = jnp.asarray([[10, 10, 30, 30], [10, 10, 30, 30],
                        [10, 10, 30, 30], [60, 10, 90, 40]], jnp.float32)
    labels = jnp.zeros((4,), jnp.int32)  # all labeled background
    # binary-ish logits: CE(label 0) = log(1 + e^margin) ~= margin for big
    margins = jnp.asarray([big, big, big, mid])
    cls_score = jnp.stack([jnp.zeros(4), margins], axis=1)  # (4, C=2)
    ce = np.log1p(np.exp(np.asarray(margins)))
    tgts = RoITargets(
        rois=rois, labels=labels, valid=jnp.ones(4, bool),
        bbox_targets=jnp.zeros((4, 4)), bbox_weights=jnp.zeros(4),
        track_targets=jnp.zeros((4, 4)), track_weights=jnp.zeros(4))

    cls_dedup, _, _ = _rfcn_losses(cfg, cls_score, jnp.zeros((4, 8)), tgts)
    cfg_raw = cfg.replace(train=cfg.train.replace(ohem_nms_thresh=0.0))
    cls_raw, _, _ = _rfcn_losses(cfg_raw, cls_score, jnp.zeros((4, 8)), tgts)

    # raw top-2 = two duplicates -> mean = ce_big;
    # dedup = one duplicate + the distinct RoI -> mean = (ce_big + ce_mid)/2
    np.testing.assert_allclose(float(cls_raw), ce[0], rtol=1e-5)
    np.testing.assert_allclose(float(cls_dedup), (ce[0] + ce[3]) / 2, rtol=1e-5)
