"""Child process for the 2-process jax.distributed CPU test
(tests/test_multihost.py).  Each process owns 2 virtual CPU devices; the
pair forms a 4-device global mesh.  Validates the multi-host data contract:
per-process row gathers (process_slice) + global-array assembly
(shard_batch via jax.make_array_from_process_local_data) + a global
collective reduction seeing every host's rows."""
import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    # The env var alone is not honored when a TPU plugin (axon) is
    # installed; force the CPU backend through the config API (same
    # workaround as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from confignet_tpu.parallel import create_mesh, process_slice, shard_batch

    mesh = create_mesh()
    global_batch = 8
    rows = np.arange(global_batch, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
    local = rows[process_slice(global_batch)]
    assert local.shape[0] == global_batch // nproc

    batch = shard_batch(mesh, {"x": local})
    x = batch["x"]
    assert x.shape == (global_batch, 3), x.shape

    # A global reduction must see ALL hosts' rows: sum(0..7) * 3 = 84.
    out = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    np.testing.assert_allclose(np.asarray(out), 84.0)

    # The (n_updates, batch, ...) stacked layout shards on axis 1.
    stacked = np.stack([local, local + 100.0])
    b2 = shard_batch(mesh, {"x": stacked}, batch_axis=1)
    assert b2["x"].shape == (2, global_batch, 3), b2["x"].shape
    out2 = jax.jit(
        lambda a: jnp.sum(a[1]), out_shardings=NamedSharding(mesh, P())
    )(b2["x"])
    np.testing.assert_allclose(np.asarray(out2), 84.0 + 100.0 * global_batch * 3)

    print(f"MULTIHOST_OK {proc_id}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
