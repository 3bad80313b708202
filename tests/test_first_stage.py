import os

import numpy as np
import pytest

import jax

from helpers import FakeDataset, TINY_FIRST_STAGE_CONFIG
from confignet_tpu.training.first_stage import ConfigNetFirstStage


@pytest.fixture(scope="module")
def model():
    return ConfigNetFirstStage(dict(TINY_FIRST_STAGE_CONFIG))


@pytest.fixture(scope="module")
def dataset():
    return FakeDataset(n_images=8, img_size=128)


def test_latent_dim_derived(model):
    # 6 (blendshapes) + 4 (hair color), alphabetical order
    assert model.config["latent_dim"] == 10
    assert list(model.config["facemodel_inputs"].keys()) == [
        "blendshape_values",
        "head_hair_color",
    ]
    idxs = model.get_facemodel_param_idxs_in_latent("head_hair_color")
    assert list(idxs) == [6, 7, 8, 9]


@pytest.mark.slow
def test_train_steps_run_and_update(model, dataset, tmp_path):
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=4)
    step_fn = model._build_train_step()
    vgg_params = model.perceptual_loss.variables["params"]

    before = jax.device_get(model.state.generator.params["generator"])
    losses_history = []
    for _ in range(2):
        batch = model._sample_host_batch(dataset, dataset)
        key = model.keychain.next()
        model.state, losses = step_fn(model.state, key, batch, vgg_params)
        losses = jax.device_get(losses)
        losses_history.append(losses)

    for group in ("g", "d", "synth_d", "latent_d"):
        assert np.isfinite(losses_history[-1][group]["loss_sum"])

    after = jax.device_get(model.state.generator.params["generator"])
    leaves_before = jax.tree_util.tree_leaves(before)
    leaves_after = jax.tree_util.tree_leaves(after)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_after, leaves_before))

    # EMA drifted from initial generator but is not equal to the new params
    ema = jax.device_get(model.state.generator_smoothed)
    ema_leaves = jax.tree_util.tree_leaves(ema)
    assert any(not np.allclose(e, a) for e, a in zip(ema_leaves, leaves_after))

    # expected loss structure of the g step
    g_keys = set(losses_history[-1]["g"].keys())
    assert {"image_loss", "eye_loss", "latent_GAN_loss", "latent_regression_loss", "loss_sum"} <= g_keys
    n_heads = model.config["n_discr_layers"] + 1  # style heads + final
    assert sum(1 for k in g_keys if k.startswith("GAN_loss_synth_")) == n_heads
    assert sum(1 for k in g_keys if k.startswith("GAN_loss_real_")) == n_heads


def test_generate_images(model):
    latents = model.sample_latent_vector(3)
    rotations = model.sample_rotations(3)
    imgs = model.generate_images(latents, rotations, batch_chunk=2)
    assert imgs.shape == (3, 128, 128, 3)
    assert imgs.dtype == np.uint8


def test_set_facemodel_param_in_latents(model):
    latents = model.sample_latent_vector(2).astype(np.float32)
    new_latents = model.set_facemodel_param_in_latents(
        latents, "head_hair_color", np.array([0.0, 1.0, 0.0], np.float32)
    )
    # only the hair-color slice changed
    np.testing.assert_array_equal(new_latents[:, :6], latents[:, :6])
    assert not np.allclose(new_latents[:, 6:], latents[:, 6:])
    # both rows got the same encoded value
    np.testing.assert_allclose(new_latents[0, 6:], new_latents[1, 6:], atol=1e-6)


def test_fit_facemodel_params_roundtrip(model):
    params = np.clip(np.random.default_rng(1).random((1, 8)), 0, 1).astype(np.float32)
    latent = model.sample_latent_vector(1).astype(np.float32)
    latent = model.set_facemodel_param_in_latents(latent, "blendshape_values", params)
    recovered = model.fit_facemodel_expression_params_to_latent(
        latent, n_iters=200, learning_rate=0.1
    )
    assert recovered.shape == (1, 8)
    assert recovered.min() >= 0.0 and recovered.max() <= 1.0


def test_save_load_roundtrip(model, tmp_path):
    model.facemodel_param_distributions = {}
    model.save(str(tmp_path), "model")
    loaded = ConfigNetFirstStage.load(os.path.join(str(tmp_path), "model.json"))
    assert loaded.config["latent_dim"] == model.config["latent_dim"]

    orig = jax.device_get(model.state.generator.params["generator"])
    new = jax.device_get(loaded.state.generator.params["generator"])
    for a, b in zip(jax.tree_util.tree_leaves(orig), jax.tree_util.tree_leaves(new)):
        np.testing.assert_allclose(a, b, atol=0)

    latents = np.zeros((1, model.config["latent_dim"]), np.float32)
    rots = np.zeros((1, 3), np.float32)
    np.testing.assert_array_equal(
        model.generate_images(latents, rots), loaded.generate_images(latents, rots)
    )


@pytest.mark.slow
def test_multidevice_mesh_step(dataset, tmp_path):
    """Data-parallel step over the virtual 8-device CPU mesh."""
    from confignet_tpu.parallel import create_mesh, replicate

    model = ConfigNetFirstStage(dict(TINY_FIRST_STAGE_CONFIG, batch_size=16))
    mesh = create_mesh()
    assert mesh.size == 8
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=4, mesh=mesh)
    model.state = replicate(mesh, model.state)
    step_fn = model._build_train_step()
    vgg_params = replicate(mesh, model.perceptual_loss.variables["params"])

    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg_params)
    assert np.isfinite(float(losses["g"]["loss_sum"]))


@pytest.mark.slow
def test_r1_final_only_mode(dataset, tmp_path):
    """r1_heads='final' computes a single gp term per discriminator."""
    model = ConfigNetFirstStage(dict(TINY_FIRST_STAGE_CONFIG, r1_heads="final"))
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=2)
    step_fn = model._build_train_step()
    vgg = model.perceptual_loss.variables["params"]
    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg)
    losses = jax.device_get(losses)
    gp_keys = [k for k in losses["d"] if k.startswith("gp_loss")]
    assert gp_keys == [f"gp_loss_{model.config['n_discr_layers']}"]
    assert np.isfinite(losses["d"]["loss_sum"])


def test_orbax_checkpoint_format_save_load(model, tmp_path):
    """checkpoint_format="orbax" saves a sharded directory instead of an
    npz, and the standard load path (class loader + polymorphic
    load_confignet) restores it transparently."""
    from confignet_tpu.core.model_io import load_confignet

    model.config["checkpoint_format"] = "orbax"
    try:
        model.save(str(tmp_path), "model")
    finally:
        model.config["checkpoint_format"] = "npz"

    assert os.path.isdir(os.path.join(str(tmp_path), "model.orbax"))
    assert not os.path.exists(os.path.join(str(tmp_path), "model.npz"))

    restored = load_confignet(os.path.join(str(tmp_path), "model.json"))
    orig = model.get_weights()
    new = restored.get_weights()
    for tree_name in orig:
        flat_orig = jax.tree_util.tree_leaves(orig[tree_name])
        flat_new = jax.tree_util.tree_leaves(new[tree_name])
        assert len(flat_orig) == len(flat_new)
        for a, b in zip(flat_orig, flat_new):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(model, tmp_path):
    from confignet_tpu.core.model_io import load_weights_orbax, save_weights_orbax

    weights = model.get_weights()
    ckpt_dir = os.path.join(str(tmp_path), "orbax_ckpt")
    save_weights_orbax(weights, ckpt_dir)
    restored = load_weights_orbax(ckpt_dir)

    flat_orig = jax.tree_util.tree_leaves(weights["generator"])
    flat_new = jax.tree_util.tree_leaves(restored["generator"])
    assert len(flat_orig) == len(flat_new)
    for a, b in zip(flat_orig, flat_new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model.set_weights(restored)  # loadable back into the trainer


def test_batch_sequence_reproducible_across_main_thread_draws(dataset):
    """Two same-seed trainers must produce identical batch sequences even
    when the main thread draws from the global np.random between samples
    (reference anchor: confignet_first_stage.py:597-626 samples with the
    process-global RNG; our prefetch thread requires an isolated stream)."""
    from helpers import sample_batch_signatures

    clean = sample_batch_signatures(
        ConfigNetFirstStage, TINY_FIRST_STAGE_CONFIG, dataset, 3, interleave=False)
    noisy = sample_batch_signatures(
        ConfigNetFirstStage, TINY_FIRST_STAGE_CONFIG, dataset, 3, interleave=True)
    assert clean == noisy


def _adam_count(player):
    import optax

    for leaf in player.opt_state:
        if hasattr(leaf, "count"):
            return int(jax.device_get(leaf.count))
    raise AssertionError("no count leaf in opt_state")


def test_multi_update_batch_layout(dataset):
    cfg = dict(TINY_FIRST_STAGE_CONFIG,
               n_discriminator_updates=3, n_generator_updates=2)
    model = ConfigNetFirstStage(cfg)
    batch = model._sample_host_batch(dataset, dataset)
    # Stacked layout: D-player fields carry n_d fresh sub-batches,
    # G fields n_g (reference resamples per sub-step,
    # confignet_first_stage.py:604-612).
    assert batch["d_real_imgs"].shape[:2] == (3, cfg["batch_size"])
    assert batch["latent_d_facemodel"][0].shape[0] == 3
    assert batch["g_gt_imgs"].shape[:2] == (2, cfg["batch_size"] // 2)
    # The sub-batches are actually fresh draws, not copies.
    assert not np.array_equal(batch["d_real_imgs"][0], batch["d_real_imgs"][1])


@pytest.mark.slow
def test_n_player_updates_honored(dataset, tmp_path):
    """A config with 2 discriminator updates measurably takes 2 D optimizer
    steps (and 2 G steps) per fused train step — Adam's count is the proof."""
    cfg = dict(TINY_FIRST_STAGE_CONFIG,
               n_discriminator_updates=2, n_generator_updates=2)
    model = ConfigNetFirstStage(cfg)
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=2)
    step_fn = model._build_train_step()
    vgg = model.perceptual_loss.variables["params"]
    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg)
    for name in ("discriminator", "synth_discriminator", "latent_discriminator"):
        assert _adam_count(getattr(model.state, name)) == 2, name
    assert _adam_count(model.state.generator) == 2
    losses = jax.device_get(losses)
    for group in ("g", "d", "synth_d", "latent_d"):
        assert np.isfinite(losses[group]["loss_sum"]), group


def test_async_checkpointing_is_single_process_only(monkeypatch):
    """Multi-process runs must checkpoint inline: a worker thread enqueueing
    device work would race the main loop's step dispatches and violate the
    same-order-everywhere requirement of multi-host JAX."""
    from confignet_tpu.training.first_stage import _use_async_checkpointing

    assert _use_async_checkpointing({}) is True  # default on, 1 process
    assert _use_async_checkpointing({"async_checkpointing": False}) is False
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert _use_async_checkpointing({}) is False
    assert _use_async_checkpointing({"async_checkpointing": True}) is False


@pytest.mark.slow
def test_async_checkpointing_train_loop(dataset, tmp_path):
    """train() with async_checkpointing (the default) writes the same
    artifacts as the inline path — checkpoints, image panels, metric
    history — with the work running on the background worker against
    donation-safe snapshots."""
    cfg = dict(TINY_FIRST_STAGE_CONFIG,
               image_checkpoint_period=2, metrics_checkpoint_period=2,
               loss_print_period=1)
    model = ConfigNetFirstStage(cfg)
    model.train(dataset, dataset, str(tmp_path), str(tmp_path / "logs"),
                n_steps=3, n_samples_for_metrics=2)

    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    saved = sorted(f for f in os.listdir(ckpt_dir)
                   if f.endswith(".json") and not f.endswith("_log.json"))
    assert saved, "no checkpoint written by the async worker"
    assert os.path.exists(os.path.join(str(tmp_path), "output_imgs"))
    assert len(model.metrics.get("training_step_number", [])) >= 1

    from confignet_tpu.core.model_io import load_confignet

    loaded = load_confignet(os.path.join(ckpt_dir, saved[-1]))
    assert loaded.MODEL_TYPE == "ConfigNetFirstStage"


@pytest.mark.slow
def test_resumed_train_keeps_checkpointing(dataset, tmp_path):
    """Resumed train() calls must keep firing checkpoints.

    Round-4 regression: start_step came from get_training_step_number()
    (last completed INDEX, the reference's resume quirk at
    confignet_first_stage.py:599-604), so a resumed run re-ran the last
    step, appended a duplicate loss row, and the +1 offset between the
    loop's `step % period` gate and run_checkpoints' history-derived
    step_number silently disabled every subsequent checkpoint (and the
    checkpoint-cost bench measured nothing).
    """
    cfg = dict(TINY_FIRST_STAGE_CONFIG, loss_print_period=1,
               async_checkpointing=False)
    model = ConfigNetFirstStage(cfg)
    # Window 1: no checkpoints (huge periods), runs steps 0..2.
    model.train(dataset, dataset, str(tmp_path), str(tmp_path / "logs"),
                n_steps=3, n_samples_for_metrics=2)
    assert model.get_resume_step() == 3  # no duplicate loss rows
    assert model.checkpoint_events_run == 1  # step 0 only (0 % 10**9 == 0)

    # Window 2 (resumed): dense cadence must actually dispatch.
    model.config["image_checkpoint_period"] = 2
    model.config["metrics_checkpoint_period"] = 2
    model.train(dataset, dataset, str(tmp_path), str(tmp_path / "logs"),
                n_steps=7, n_samples_for_metrics=2)
    assert model.get_resume_step() == 7
    # Steps 3..6 ran; steps 4 and 6 are checkpoint steps.
    assert model.checkpoint_events_run == 3
    assert len(model.metrics.get("training_step_number", [])) >= 2
    imgs = os.listdir(os.path.join(str(tmp_path), "output_imgs"))
    assert any(f.startswith("000004") for f in imgs)
    assert any(f.startswith("000006") for f in imgs)


@pytest.mark.slow
def test_pixel_loss_opt_in(dataset, tmp_path):
    """pixel_loss_weight > 0 adds a pixel-space L1 term to the G player
    (the from-scratch color anchor — random-VGG perceptual features
    under-anchor color; docs/TEST_RUNS.md round 5); 0.0 (the default)
    keeps reference-exact loss structure."""
    cfg = dict(TINY_FIRST_STAGE_CONFIG, pixel_loss_weight=100.0)
    model = ConfigNetFirstStage(cfg)
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=2)
    step_fn = model._build_train_step()
    vgg_params = model.perceptual_loss.variables["params"]
    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg_params)
    losses = jax.device_get(losses)
    assert np.isfinite(losses["g"]["pixel_loss"])
    assert losses["g"]["pixel_loss"] > 0.0
