import os

import numpy as np
import pytest

import jax

from helpers import FakeDataset, TINY_FIRST_STAGE_CONFIG
from confignet_tpu.training.first_stage import ConfigNetFirstStage
from confignet_tpu.training.second_stage import ConfigNet


@pytest.fixture(scope="module")
def model():
    return ConfigNet(dict(TINY_FIRST_STAGE_CONFIG))


@pytest.fixture(scope="module")
def dataset():
    return FakeDataset(n_images=8, img_size=128)


def test_encode_images(model):
    imgs = np.random.default_rng(0).integers(0, 256, (3, 128, 128, 3), dtype=np.uint8)
    latents, rotations = model.encode_images(imgs, batch_chunk=2)
    assert latents.shape == (3, model.config["latent_dim"])
    assert rotations.shape == (3, 3)
    # rotations respect the configured ranges (tanh * range)
    ranges = np.pi * np.asarray(model.config["rotation_ranges"])[:, 1] / 180.0
    assert np.all(np.abs(rotations) <= ranges + 1e-6)


@pytest.mark.slow
def test_stage2_train_step(model, dataset, tmp_path):
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=2,
                         real_training_set=dataset, validation_set=dataset)
    step_fn = model._build_train_step()
    vgg = model.perceptual_loss.variables["params"]
    vggface = model.perceptual_loss_face_reco.variables["params"]

    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg, vggface)
    losses = jax.device_get(losses)
    for group in ("g", "d", "synth_d", "latent_d"):
        assert np.isfinite(losses[group]["loss_sum"]), group
    g_keys = set(losses["g"].keys())
    assert {"image_loss_synth", "image_loss_real", "eye_loss", "latent_GAN_loss",
            "latent_regression_loss"} <= g_keys


@pytest.mark.slow
def test_stage1_to_stage2_weight_transfer():
    cfg = dict(TINY_FIRST_STAGE_CONFIG)
    stage1 = ConfigNetFirstStage(cfg)
    stage2 = ConfigNet(dict(cfg))
    stage1_weights = stage1.get_weights()
    stage2.set_weights(stage1_weights)

    g1 = jax.device_get(stage1.state.generator.params["generator"])
    g2 = jax.device_get(stage2.state.generator.params["generator"])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(a, b)
    # the encoder still exists (kept, not overwritten)
    assert "real_encoder" in stage2.state.generator.params


@pytest.mark.slow
def test_fine_tune_on_img(model):
    img = np.random.default_rng(1).integers(0, 256, (128, 128, 3), dtype=np.uint8)
    emb_before, _ = model.encode_images(img[np.newaxis])
    embeddings, rotations = model.fine_tune_on_img(img, n_iters=2)
    assert embeddings.shape == (1, model.config["latent_dim"])
    assert rotations.shape == (1, 3)
    assert model._fine_tuned_generator_params is not None
    # fine-tuned generator params differ from the EMA copy
    ema = jax.device_get(model.state.generator_smoothed)
    tuned = jax.device_get(model._fine_tuned_generator_params)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(tuned), jax.tree_util.tree_leaves(ema))
    )
    # generate_images now prefers the fine-tuned generator
    imgs = model.generate_images(embeddings, rotations)
    assert imgs.shape == (1, 128, 128, 3)


@pytest.mark.slow
def test_fine_tune_force_neutral(model):
    img = np.random.default_rng(2).integers(0, 256, (128, 128, 3), dtype=np.uint8)
    embeddings, _ = model.fine_tune_on_img(img, n_iters=1, force_neutral_expression=True)
    # with the expression frozen, its segment equals the neutral encoding
    neutral = model.set_facemodel_param_in_latents(
        np.zeros((1, model.config["latent_dim"]), np.float32),
        "blendshape_values",
        np.zeros((1, model.config["facemodel_inputs"]["blendshape_values"][0]), np.float32),
    )
    idxs = list(model.get_facemodel_param_idxs_in_latent("blendshape_values"))
    np.testing.assert_allclose(embeddings[:, idxs], neutral[:, idxs], atol=1e-5)


@pytest.mark.slow
def test_stage2_save_load(model, tmp_path):
    model.facemodel_param_distributions = {}
    model.save(str(tmp_path), "model")
    from confignet_tpu.core.model_io import load_confignet

    loaded = load_confignet(os.path.join(str(tmp_path), "model.json"))
    assert isinstance(loaded, ConfigNet)
    img = np.random.default_rng(3).integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)
    l1, r1 = model.encode_images(img)
    l2, r2 = loaded.encode_images(img)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    np.testing.assert_allclose(r1, r2, atol=1e-6)


@pytest.mark.slow
def test_multidevice_mesh_step(dataset, tmp_path):
    """Stage-2 data-parallel step (encoder in the G player) over the virtual
    8-device CPU mesh — the richer step of the two
    (reference: confignet_second_stage.py:149-218)."""
    from confignet_tpu.parallel import create_mesh, replicate

    model = ConfigNet(dict(TINY_FIRST_STAGE_CONFIG, batch_size=16))
    mesh = create_mesh()
    assert mesh.size == 8
    model.setup_training(str(tmp_path), dataset, n_samples_for_metrics=2,
                         real_training_set=dataset, validation_set=dataset, mesh=mesh)
    model.state = replicate(mesh, model.state)
    step_fn = model._build_train_step()
    vgg = replicate(mesh, model.perceptual_loss.variables["params"])
    vggface = replicate(mesh, model.perceptual_loss_face_reco.variables["params"])

    batch = model._sample_host_batch(dataset, dataset)
    model.state, losses = step_fn(model.state, model.keychain.next(), batch, vgg, vggface)
    assert np.isfinite(float(losses["g"]["loss_sum"]))


@pytest.mark.slow
def test_fine_tune_and_generate_512():
    """One-shot fine-tune + generation at the 512px model size (the
    reference ships and tests 256 and 512; reference
    tests/inference_test.py parametrizes both)."""
    cfg = dict(TINY_FIRST_STAGE_CONFIG, output_shape=(512, 512, 3))
    model = ConfigNet(cfg)
    img = np.random.default_rng(5).integers(0, 256, (512, 512, 3), dtype=np.uint8)
    embeddings, rotations = model.fine_tune_on_img(img, n_iters=1)
    assert embeddings.shape == (1, model.config["latent_dim"])
    imgs = model.generate_images(embeddings, rotations)
    assert imgs.shape == (1, 512, 512, 3)
    assert imgs.dtype == np.uint8


def test_stage2_batch_sequence_reproducible_across_main_thread_draws(dataset):
    """Stage 2 regression guard: _sample_host_batch must use the dedicated
    RandomState (not the global np.random) so prefetch-thread batch order is
    reproducible and untouched by main-thread checkpoint-time draws."""
    from helpers import sample_batch_signatures

    clean = sample_batch_signatures(
        ConfigNet, TINY_FIRST_STAGE_CONFIG, dataset, 3, interleave=False)
    noisy = sample_batch_signatures(
        ConfigNet, TINY_FIRST_STAGE_CONFIG, dataset, 3, interleave=True)
    assert clean == noisy


def test_stage2_async_gate_is_multiprocess_safe(model, dataset, tmp_path, monkeypatch):
    """Stage-2 train() must gate its CheckpointWorker through the shared
    _use_async_checkpointing helper: in multi-process runs a worker thread
    enqueueing device work would race the main loop's dispatches (see
    first_stage._use_async_checkpointing).  Regression test for the gate
    bypassing the helper and reading the raw config flag."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    stats = model.train(dataset, dataset, n_steps=0, n_samples_for_metrics=2,
                        output_dir=str(tmp_path), log_dir=str(tmp_path))
    assert model._checkpoint_worker is None
    # and a no-op window never reports negative steps
    assert stats["steps_run"] == 0


def test_encoder_group_norm_trunk():
    """`encoder_norm: "group"` swaps the ResNet trunk's FrozenBatchNorm for
    stateless GroupNorm — the from-scratch recipe (a random-init FrozenBN
    trunk barely trains and collapses the encoder; docs/TEST_RUNS.md r5).
    The group trunk must carry learnable scale/bias params, produce
    per-image (input-dependent) latents, and still accept stage-1 weights."""
    cfg = dict(TINY_FIRST_STAGE_CONFIG)
    cfg["encoder_norm"] = "group"
    stage2 = ConfigNet(cfg)

    enc = stage2.state.generator.params["real_encoder"]
    flat = {"/".join(str(p) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(enc)[0]}
    gn_keys = [k for k in flat if "stem_bn" in k]
    assert gn_keys, sorted(flat)[:5]
    # GroupNorm has scale+bias only (no frozen moving mean/var)
    assert not any("mean" in k or "var" in k for k in flat)

    imgs = np.random.default_rng(0).integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    latents, _ = stage2.encode_images(imgs)
    assert latents.shape == (2, stage2.config["latent_dim"])

    stage1 = ConfigNetFirstStage(dict(TINY_FIRST_STAGE_CONFIG))
    stage2.set_weights(stage1.get_weights())  # must not clobber the GN encoder
    assert "real_encoder" in stage2.state.generator.params
