"""Device mesh construction and sharding rules.

The reference is single-GPU with no distributed backend (SURVEY.md §2.7);
here parallelism is first-class: an explicit ``jax.sharding.Mesh`` with a
``data`` axis (and optional ``model`` axis for future tensor sharding), and
NamedSharding annotations on the jitted train step. XLA GSPMD inserts the
gradient ``psum`` over ICI; a 1-chip mesh is the degenerate case, and
multi-host pods extend the same mesh over DCN via
``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Mesh of shape (n_devices // model_parallel, model_parallel)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX (DCN) when running on a pod slice. No-op for
    single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis over ``data``.

    Single-process: a plain sharded device_put. Multi-host (after
    ``initialize_multihost``): each process passes its PER-HOST shard of
    the batch (the feeders already shard by ``shard_index/shard_count``)
    and the pieces assemble into one global array over DCN.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
