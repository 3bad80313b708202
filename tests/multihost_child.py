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

    batch = shard_batch(mesh, {"x": local}, local_rows=True)
    x = batch["x"]
    assert x.shape == (global_batch, 3), x.shape

    # Serving layout: the full global batch on every host; shard_batch
    # slices this host's rows itself (local_rows=False, the default).
    xg = shard_batch(mesh, {"x": rows})["x"]
    assert xg.shape == (global_batch, 3), xg.shape
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda a: jnp.sum(a),
                           out_shardings=NamedSharding(mesh, P()))(xg)), 84.0)

    # A global reduction must see ALL hosts' rows: sum(0..7) * 3 = 84.
    out = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    np.testing.assert_allclose(np.asarray(out), 84.0)

    # The (n_updates, batch, ...) stacked layout shards on axis 1.
    stacked = np.stack([local, local + 100.0])
    b2 = shard_batch(mesh, {"x": stacked}, batch_axis=1, local_rows=True)
    assert b2["x"].shape == (2, global_batch, 3), b2["x"].shape
    out2 = jax.jit(
        lambda a: jnp.sum(a[1]), out_shardings=NamedSharding(mesh, P())
    )(b2["x"])
    np.testing.assert_allclose(np.asarray(out2), 84.0 + 100.0 * global_batch * 3)

    if "--trainer-step" in sys.argv:
        _trainer_step(mesh, nproc)

    print(f"MULTIHOST_OK {proc_id}", flush=True)
    return 0


def _trainer_step(mesh, nproc: int) -> None:
    """One REAL stage-1 fused step across the processes: the trainer's own
    per-host sampler (lockstep global draws -> process_slice gathers ->
    make_array_from_process_local_data) feeds the sharded jitted step."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import numpy as np

    from helpers import FakeDataset
    from confignet_tpu.parallel import replicate
    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    config = {
        "output_shape": (128, 128, 3),
        "const_input_shape": (4, 4, 4, 8),
        "n_generator_features": 8,
        "n_adain_mlp_units": 8,
        "n_adain_mlp_layers": 2,
        "n_discr_features_at_layer_0": 4,
        "max_discr_filters": 8,
        "n_discr_layers": 2,
        "batch_size": 2 * len(mesh.devices.flat),
        "n_latent_discr_layers": 2,
        "perceptual_taps": [1],
        "facemodel_inputs": {"blendshape_values": (8, 6),
                             "head_hair_color": (3, 4)},
        "seed": 0,
    }
    np.random.seed(0)  # lockstep batch RNG across processes
    model = ConfigNetFirstStage(config)
    model.mesh = mesh
    model.state = replicate(mesh, model.state)
    vgg = replicate(mesh, model.perceptual_loss.variables["params"])
    ds = FakeDataset(n_images=8, img_size=128)

    batch = model._sample_host_batch(ds, ds)  # per-host rows only
    local_rows = config["batch_size"] // nproc
    # the host staged only its shard of the global batch
    assert batch["d_real_imgs"].shape[0] == config["batch_size"]
    addressable = sum(
        s.data.shape[0] for s in batch["d_real_imgs"].addressable_shards)
    assert addressable == local_rows, (addressable, local_rows)

    step = model._build_train_step()
    _, losses = step(model.state, model.keychain.next(), batch, vgg)
    loss = float(jax.device_get(losses["g"]["loss_sum"]))
    assert np.isfinite(loss), loss
    print(f"TRAINER_STEP_OK {jax.process_index()} {loss:.4f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
