import os

import numpy as np
import jax

from confignet_tpu.training.latent_gan import LatentGAN


def test_latent_gan_step_and_sampling(tmp_path):
    gan = LatentGAN({"latent_dim": 12, "batch_size": 8})
    step_fn = gan._build_train_step()
    rng = np.random.default_rng(0)
    real = rng.normal(size=(8, 12)).astype(np.float32)

    before = jax.device_get(gan.state.generator.params)
    for _ in range(2):
        gan.state, losses = step_fn(gan.state, gan.keychain.next(), real)
    losses = jax.device_get(losses)
    assert np.isfinite(losses["d"]["loss_sum"])
    assert np.isfinite(losses["g"]["loss_sum"])
    assert set(losses["d"].keys()) == {"GAN_loss_real", "GAN_loss_fake", "gp_loss", "loss_sum"}

    after = jax.device_get(gan.state.generator.params)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(before))
    )

    latents = gan.generate_latents(5, truncation=0.7)
    assert latents.shape == (5, 12)

    # truncation scales the INPUT noise -> different outputs
    np.random.seed(0)
    full = gan.generate_latents(5, truncation=1.0)
    np.random.seed(0)
    trunc = gan.generate_latents(5, truncation=0.5)
    assert not np.allclose(full, trunc)


def test_latent_gan_save_load(tmp_path):
    gan = LatentGAN({"latent_dim": 6})
    gan.save(str(tmp_path), "model")
    loaded = LatentGAN.load(os.path.join(str(tmp_path), "model.json"))
    noise = np.random.default_rng(0).normal(size=(3, 6)).astype(np.float32)
    np.testing.assert_allclose(
        gan.generate_latents_smoothed(noise), loaded.generate_latents_smoothed(noise), atol=1e-6
    )


def test_latent_gan_requires_latent_dim():
    import pytest

    with pytest.raises(ValueError):
        LatentGAN({})


def test_latent_gan_multidevice_mesh_step():
    """LatentGAN step with state replicated and the real-embedding batch
    sharded over the virtual 8-device CPU mesh."""
    from confignet_tpu.parallel import create_mesh, replicate, shard_batch

    mesh = create_mesh()
    assert mesh.size == 8
    gan = LatentGAN({"latent_dim": 10, "batch_size": 16})
    gan.state = replicate(mesh, gan.state)
    real = shard_batch(
        mesh, np.random.default_rng(0).normal(size=(16, 10)).astype(np.float32)
    )
    step = gan._build_train_step()
    gan.state, losses = step(gan.state, gan.keychain.next(), real)
    assert np.isfinite(float(losses["g"]["loss_sum"]))
    assert np.isfinite(float(losses["d"]["loss_sum"]))
