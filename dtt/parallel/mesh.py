"""Device mesh + distributed-runtime helpers.

The reference's parallelism is single-process multi-GPU DataParallel
(ref: trainval_net.py --mGPUs). The TPU-native story (SURVEY.md §2c):

* intra-slice: a 1-D `data` mesh over the chips of one slice; batches shard
  over it, params replicate, XLA all-reduces gradients over ICI.
* multi-slice / multi-host: `initialize_distributed()` wraps
  jax.distributed.initialize so the same mesh code spans hosts over DCN;
  `global_mesh()` then builds the mesh from all processes' devices.

Mesh axes are named so future TP/PP axes can be added without changing
callers (the D&T model needs none for parity — no attention, 100M params).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           cpu_collectives: str | None = None) -> None:
    """Multi-host init (DCN). No-op on a single process without arguments.

    `cpu_collectives` selects the CPU cross-process collective backend
    (e.g. "gloo") for CPU-device testing of the multi-host path; leave None
    on TPU, where collectives ride ICI/DCN natively.
    """
    if coordinator is None and num_processes is None:
        import os
        if "JAX_COORDINATOR_ADDRESS" not in os.environ:
            return  # single-host run
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh (the reference's only parallelism)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("data",))


def global_mesh(data_parallel: int | None = None,
                model_parallel: int = 1) -> Mesh:
    """(data, model) mesh; model axis reserved for future TP experiments."""
    devs = np.asarray(jax.devices())
    n = devs.size
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"{data_parallel}x{model_parallel} != {n} devices")
    return Mesh(devs.reshape(data_parallel, model_parallel),
                axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
