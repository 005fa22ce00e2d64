"""Frozen-BN data calibration (dtt.utils.calibrate)."""

import jax
import jax.numpy as jnp
import numpy as np

from dtt.core.config import load_config
from dtt.models.resnet import FrozenAffine, ResNetBackbone
from dtt.utils.calibrate import (affine_groups, calibrate_backbone,
                                 calibrate_model_backbone)


def _tiny_backbone():
    return ResNetBackbone((1, 1, 1, 1), frozen_stages=0, dtype=jnp.float32)


def test_affine_groups_topological(rng):
    bb = _tiny_backbone()
    params = bb.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)))["params"]
    groups = affine_groups(params)
    # stem first, then strictly non-decreasing (layer, block, bn) order
    assert groups[0] == [("bn1",)]
    flat = [p for g in groups for p in g]
    # every affine in the tree is covered exactly once
    assert len(flat) == len(set(flat))
    n_affines = sum(1 for g in groups for _ in g)
    assert n_affines == 1 + 4 * 4  # stem + 4 blocks x (bn1,bn2,bn3,downsample)
    # bn3 and downsample_bn of the same block share a group (parallel branches)
    for g in groups:
        names = {p[-1] for p in g}
        if "downsample_bn" in names:
            assert names == {"bn3", "downsample_bn"}


def test_calibrated_affine_outputs_are_standardized(rng):
    bb = _tiny_backbone()
    images = jnp.asarray(rng.randn(4, 64, 96, 3).astype(np.float32) * 50 + 20)
    params = bb.init(jax.random.PRNGKey(1), images)["params"]
    new_params = calibrate_backbone(bb, params, images)

    filt = lambda mdl, method: isinstance(mdl, FrozenAffine)
    _, st = bb.apply({"params": new_params}, images,
                     capture_intermediates=filt, mutable=["intermediates"])

    def walk(tree):
        if "__call__" in tree:
            y = np.asarray(tree["__call__"][0], np.float32)
            yield y.mean(axis=(0, 1, 2)), y.var(axis=(0, 1, 2))
        else:
            for v in tree.values():
                yield from walk(v)

    for mean, var in walk(st["intermediates"]):
        np.testing.assert_allclose(mean, 0.0, atol=1e-3)
        np.testing.assert_allclose(var, 1.0, atol=1e-2)


def test_calibrate_model_backbone_touches_only_affines(rng):
    from dtt.train.trainer import create_train_state
    cfg = load_config("configs/tiny_synth.yml")
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    sample = jnp.zeros((1, 2, h, w, 3), jnp.float32)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), sample)
    pairs = jnp.asarray(rng.randn(2, 2, h, w, 3).astype(np.float32) * 30)
    new = calibrate_model_backbone(cfg, state.params, pairs)

    old_flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    new_flat = dict(jax.tree_util.tree_flatten_with_path(new)[0])
    changed = []
    for path, old_leaf in old_flat:
        new_leaf = new_flat[tuple(path)]
        if not np.allclose(old_leaf, new_leaf):
            changed.append(tuple(p.key for p in path))
    assert changed, "calibration changed nothing"
    for keys in changed:
        assert "backbone" in keys and keys[-2] in (
            "bn1", "bn2", "bn3", "downsample_bn"), keys
