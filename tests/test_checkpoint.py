"""Checkpoint save/resume determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dtt.data.synthetic import synthetic_batch
from dtt.train.checkpoint import (latest_checkpoint, load_params,
                                  restore_checkpoint, save_checkpoint,
                                  save_params)
from dtt.train.trainer import create_train_state, make_train_step
from tests.test_train import tiny_config, make_batch, H, W


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = tiny_config(ohem=False)
    batch = make_batch(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    step = make_train_step(cfg, model, (H // 16, W // 16))

    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    path = save_checkpoint(str(tmp_path), state, cfg)
    assert latest_checkpoint(str(tmp_path)) == path

    # branch A: continue training
    state_a, ma = step(state, batch, jax.random.PRNGKey(99))

    # branch B: fresh process -> restore -> same step
    _, fresh = create_train_state(cfg, jax.random.PRNGKey(7),
                                  batch["images"][:1])
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 3
    state_b, mb = step(restored, batch, jax.random.PRNGKey(99))

    np.testing.assert_allclose(float(ma["total"]), float(mb["total"]), rtol=1e-6)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_params_only_roundtrip(tmp_path):
    cfg = tiny_config()
    batch = make_batch(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      batch["images"][:1])
    p = str(tmp_path / "params.msgpack")
    save_params(p, state.params)
    loaded = load_params(p, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
