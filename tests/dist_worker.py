"""Worker process for the multi-process (DCN-path) distributed test.

Run as: python tests/dist_worker.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices; together they form the 8-device
global `data` mesh. Executes ONE sharded D&T train step on a deterministic
synthetic batch and prints the loss as `DIST_RESULT <total>`.

This is the executable proof of SURVEY §2c's multi-host plan: the same mesh
code (dtt.parallel.mesh + trainer) spans processes via
jax.distributed.initialize, with gradients all-reduced across process
boundaries (Gloo on CPU; ICI/DCN on real TPU slices).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from dtt.parallel.mesh import data_mesh, initialize_distributed
    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           cpu_collectives="gloo")
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    from tests.test_train import H, W, make_batch, tiny_config
    from dtt.train.trainer import (create_train_state,
                                   make_parallel_train_step, replicate_tree,
                                   shard_batch, TrainState)

    cfg = tiny_config()
    mesh = data_mesh()
    global_batch = make_batch(cfg, 8, seed=0)          # identical on all procs
    per = 8 // nproc
    local = {k: np.asarray(v)[pid * per:(pid + 1) * per]
             for k, v in global_batch.items()}

    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      jnp.asarray(global_batch["images"][:1]))
    state = TrainState(*replicate_tree(tuple(state), mesh))
    sharded = shard_batch(local, mesh)

    step = make_parallel_train_step(cfg, model, (H // 16, W // 16), mesh)
    state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    total = float(metrics["total"])
    print(f"DIST_RESULT {total:.10f}", flush=True)


if __name__ == "__main__":
    main()
