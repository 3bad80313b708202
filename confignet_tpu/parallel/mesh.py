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


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS, batch_axis: int = 0) -> NamedSharding:
    """Sharding that splits the batch axis (by default the leading one)
    across the mesh.  ``batch_axis=1`` handles the (n_updates, batch, ...)
    layout used when ``n_discriminator_updates``/``n_generator_updates`` > 1."""
    return NamedSharding(mesh, P(*([None] * batch_axis), axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_slice(global_rows: int) -> slice:
    """This host's contiguous row range of a ``global_rows``-long batch axis.

    Multi-host contract: every process draws the SAME global index arrays
    (identical seeds keep the batch RNG streams in lockstep), then gathers
    only its own row range — so no host materializes the global batch
    (the expensive image gathers happen per-host on 1/n of the rows)."""
    n = jax.process_count()
    if n == 1:
        return slice(None)
    if global_rows % n != 0:
        raise ValueError(
            f"global batch rows ({global_rows}) must divide evenly over "
            f"{n} processes")
    per = global_rows // n
    idx = jax.process_index()
    return slice(idx * per, (idx + 1) * per)


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS, batch_axis: int = 0,
                *, local_rows: bool = False) -> Any:
    """Device-put every array leaf with its batch axis split over the mesh.

    Single-process: a plain sharded device_put (``local_rows`` is moot —
    this host's rows ARE the global batch).  Multi-process, the caller must
    say which layout it holds:

    - ``local_rows=True``: each leaf is this host's LOCAL row range (see
      :func:`process_slice`); the global array is assembled with
      ``jax.make_array_from_process_local_data`` — no cross-host data
      movement, each host feeds only its own chips (the trainer hot path).
    - ``local_rows=False`` (default): each leaf is the full GLOBAL batch,
      identical on every host (serving / encode paths); each host slices
      its own :func:`process_slice` rows before assembly.  Passing a global
      batch with ``local_rows=True`` would silently build an array of
      ``rows * process_count`` global rows and break the compiled shapes.
    """
    sharding = batch_sharding(mesh, axis_name, batch_axis)
    if jax.process_count() > 1:
        def put(x):
            if not local_rows:
                x = x[(slice(None),) * batch_axis
                      + (process_slice(x.shape[batch_axis]),)]
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(x))

        return jax.tree_util.tree_map(put, batch)
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
