"""Multi-process (DCN-path) distributed execution test.

Spawns two real `jax.distributed` processes, each with 4 virtual CPU
devices, forming the 8-device global mesh; runs one sharded D&T train step
and asserts the loss equals the single-process value (SURVEY §2c multi-host
plan — previously `initialize_distributed` was untested code).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_train import H, W, make_batch, tiny_config

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError as e:  # pragma: no cover - host without loopback bind
            pytest.skip(f"cannot bind a local port: {e}")
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "tests", "dist_worker.py"),
         str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=_REPO) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("DIST_RESULT")]
        assert lines, f"no DIST_RESULT in worker output:\n{out[-4000:]}"
        losses.append(float(lines[-1].split()[1]))
    # both processes see the same replicated loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process serial reference on the identical batch/keys
    from dtt.train.trainer import create_train_state, make_train_step
    cfg = tiny_config()
    batch = make_batch(cfg, 8, seed=0)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      jnp.asarray(batch["images"][:1]))
    step = make_train_step(cfg, model, (H // 16, W // 16))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(losses[0], float(metrics["total"]), rtol=5e-4)
