"""Device-mesh utilities for SPMD data parallelism.

The reference trains on a single device with no distribution of any kind
(SURVEY.md §2.9).  Here every train step is a single jitted function whose
batch inputs are sharded over the ``data`` axis of a ``jax.sharding.Mesh``
and whose parameters are replicated; XLA then inserts the gradient psums over
ICI automatically ("computation follows data").  The same step runs unchanged
on 1 chip, a v5e-8 slice, or a multi-host pod — only the mesh changes.

``jax.distributed`` multi-host initialization is the caller's concern
(`confignet_tpu.apps` CLIs call :func:`maybe_initialize_distributed`).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put every array leaf with its leading axis split over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched under a multi-host runtime
    (no-op in single-process runs)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass
