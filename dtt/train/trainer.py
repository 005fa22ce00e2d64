"""Trainer: optax SGD(momentum) with reference hyper-parameter semantics,
jit train step, and mesh-sharded data parallelism.

TPU-native replacement for the reference training loop
(ref: trainval_net.py — SGD momentum 0.9, doubled bias lr, no bias decay,
lr step decay, global-norm gradient clipping, `--mGPUs` nn.DataParallel).
Data parallelism is expressed with jax.sharding: the batch is sharded over
the `data` mesh axis, params are replicated, and XLA inserts the gradient
all-reduce over ICI — no hand-written communication.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dtt.core.anchors import grid_anchors_for
from dtt.core.config import Config
from dtt.models.dnt import DnT, make_model
from dtt.train.losses import batch_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _is_bias(path) -> bool:
    return path[-1].key == "bias"


_FROZEN_AFFINE_PARENTS = ("bn1", "bn2", "bn3", "downsample_bn")


def _is_frozen(path, frozen_stages: int) -> bool:
    """Frozen leaves: every FrozenAffine (BN) param + frozen backbone stages.

    These take zero gradient by construction (stop_gradient), but optax
    transforms like add_decayed_weights update params regardless of gradient,
    so the optimizer must skip them entirely (the reference excludes
    requires_grad=False params from the optimizer)."""
    keys = [p.key for p in path if hasattr(p, "key")]
    if len(keys) >= 2 and keys[-2] in _FROZEN_AFFINE_PARENTS:
        return True
    if "backbone" in keys:
        i = keys.index("backbone")
        rest = keys[i + 1:]
        if frozen_stages >= 1 and rest[:1] in (["conv1"], ["bn1"]):
            return True
        for stage in range(1, 4):
            if frozen_stages >= stage + 1 and rest[:1] == [f"layer{stage}"]:
                return True
    return False


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """SGD + momentum with the reference's per-parameter rules:
    doubled bias lr, no bias decay, step decay, global-norm clipping, and
    frozen params (BN affines + frozen stages) fully excluded."""
    t = cfg.train
    frozen_stages = cfg.model.frozen_stages
    base_schedule = optax.piecewise_constant_schedule(
        t.learning_rate, {int(s): t.gamma for s in t.lr_decay_steps})
    if t.warmup_steps > 0:
        # multiplicative warmup so lr_decay_steps stay absolute step counts
        def schedule(step):
            warm = jnp.minimum(1.0, (step + 1) / t.warmup_steps)
            return base_schedule(step) * warm
    else:
        schedule = base_schedule

    def mask_of(pred):
        return lambda params: jax.tree_util.tree_map_with_path(
            lambda p, _: pred(p), params)

    frozen = lambda p: _is_frozen(p, frozen_stages)
    bias_mask = mask_of(lambda p: _is_bias(p) and not frozen(p))
    decay_mask = mask_of(
        lambda p: not frozen(p) and (t.bias_decay or not _is_bias(p)))
    frozen_mask = mask_of(frozen)

    chain = [optax.clip_by_global_norm(t.clip_gradients)]
    if t.weight_decay:
        chain.append(optax.add_decayed_weights(t.weight_decay, mask=decay_mask))
    if t.double_bias_lr:
        chain.append(optax.masked(optax.scale(2.0), bias_mask))
    chain.append(optax.sgd(learning_rate=schedule, momentum=t.momentum))
    # hard guarantee: frozen params never change
    chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    return optax.chain(*chain)


def create_train_state(cfg: Config, key, sample_images: jnp.ndarray
                       ) -> tuple[DnT, TrainState]:
    model = make_model(cfg.model)
    # jit the init: eager op-by-op dispatch is pathologically slow through
    # the axon tunnel (CLAUDE.md) — a flagship-size init takes minutes unjitted
    params = jax.jit(model.init)(key, sample_images)
    tx = make_optimizer(cfg)
    return model, TrainState(params=params, opt_state=tx.init(params["params"])
                             if "params" in params else tx.init(params),
                             step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: Config, model: DnT, feat_hw: tuple[int, int],
                    render_fn=None):
    """Single-device jitted train step. batch dims: (B, ...).

    `render_fn(batch, key) -> images` (optional) builds the image canvases
    ON DEVICE inside the same jitted program (device-side synthetic
    rendering, dtt.data.device_synth): the host batch then carries only
    KB-scale scene parameters instead of MB-scale pixels — one fused
    program, no extra dispatch round trip through the tunnel."""
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, *feat_hw))
    tx = make_optimizer(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, key):
        if render_fn is not None:
            key, rkey = jax.random.split(key)
            batch = dict(batch, images=render_fn(batch, rkey))

        def loss_fn(params):
            return batch_loss(cfg, model, params, anchors, batch, key)

        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        g = grads["params"] if "params" in grads else grads
        p = state.params["params"] if "params" in state.params else state.params
        updates, new_opt = tx.update(g, state.opt_state, p)
        new_p = optax.apply_updates(p, updates)
        new_params = (dict(state.params, params=new_p)
                      if "params" in state.params else new_p)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        return new_state, lb._asdict()

    return train_step


def make_data_mesh(devices=None) -> Mesh:
    """1-D `data` mesh over all chips (ref --mGPUs DataParallel equivalent)."""
    from dtt.parallel.mesh import data_mesh
    return data_mesh(devices)


def make_parallel_train_step(cfg: Config, model: DnT, feat_hw: tuple[int, int],
                             mesh: Mesh, render_fn=None):
    """Data-parallel train step: batch sharded on `data`, params replicated.

    Gradients are all-reduced by XLA over ICI (the psum appears in the
    compiled module; nothing hand-written). `render_fn` as in
    make_train_step — rendering stays sharded on `data` (each chip draws
    its own batch rows).
    """
    anchors = jnp.asarray(grid_anchors_for(cfg.model.anchors, *feat_hw))
    tx = make_optimizer(cfg)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def step_fn(state: TrainState, batch, key):
        if render_fn is not None:
            key, rkey = jax.random.split(key)
            batch = dict(batch, images=render_fn(batch, rkey))

        def loss_fn(params):
            return batch_loss(cfg, model, params, anchors, batch, key)

        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        g = grads["params"] if "params" in grads else grads
        p = state.params["params"] if "params" in state.params else state.params
        updates, new_opt = tx.update(g, state.opt_state, p)
        new_p = optax.apply_updates(p, updates)
        new_params = (dict(state.params, params=new_p)
                      if "params" in state.params else new_p)
        return TrainState(new_params, new_opt, state.step + 1), lb._asdict()

    # prefix pytree: every batch leaf sharded on `data` (the dict's key set
    # varies — device-render batches carry scene params, no images)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded along `data`.

    Single-process: device_put of the full batch. Multi-process (DCN): each
    process passes its LOCAL rows; jax assembles the global array across
    hosts (SURVEY §2c — the same mesh code spans hosts).
    """
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    """Make a host-identical pytree a globally-replicated jax array tree.

    Multi-process: every process must hold the SAME host values (e.g. a
    deterministic init); single-process this is a plain replicated
    device_put."""
    repl = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x), global_shape=np.shape(x)), tree)
    return jax.device_put(tree, repl)
