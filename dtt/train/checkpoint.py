"""Checkpoint / resume.

Equivalent of the reference's per-epoch `torch.save({session, epoch,
model.state_dict, optimizer.state_dict, ...})` and `--r/--checkepoch` resume
(ref: trainval_net.py, lib/model/utils/net_utils.py save_checkpoint).

Format: one directory per step containing
  state.msgpack — flax-serialized {params, opt_state, step} pytree
  config.yml    — full config snapshot
  meta.json     — step, dtt version, timestamp

Restore is deterministic: the caller builds a fresh TrainState with the same
config (structure donor), and the serialized leaves are poured back in.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np
from flax import serialization

from dtt import __version__
from dtt.core.config import Config, save_config
from dtt.train.trainer import TrainState


def _state_dict(state: TrainState) -> dict:
    return {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}


def save_checkpoint(ckpt_dir: str, state: TrainState, cfg: Config) -> str:
    """Write a checkpoint for the current step; returns its path."""
    step = int(state.step)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    os.makedirs(path, exist_ok=True)
    host_state = jax.tree.map(np.asarray, _state_dict(state))
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host_state))
    save_config(cfg, os.path.join(path, "config.yml"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, "version": __version__,
                   "time": time.time()}, f)
    with open(os.path.join(ckpt_dir, "LATEST"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    marker = os.path.join(ckpt_dir, "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.exists(path) else None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Pour serialized leaves into a structurally-identical fresh state."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(_state_dict(state), data)
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])


def restore_params_only(path: str, params_template):
    """Restore just the model params (+ step) from a checkpoint dir.

    Eval/demo don't need optimizer state, and this stays compatible across
    optimizer-chain changes that reshape opt_state.
    """
    from flax.serialization import from_state_dict, msgpack_restore
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = msgpack_restore(f.read())
    params = from_state_dict(params_template, raw["params"])
    return params, int(np.asarray(raw["step"]))


def save_params(path: str, params) -> None:
    """Params-only export (inference/eval artifacts)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_params(path: str, params_template):
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())
