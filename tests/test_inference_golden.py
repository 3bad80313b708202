"""Golden-value regression tests — the numerical spec of the inference
paths, mirroring the reference's committed-npz pattern
(reference tests/inference_test.py: encode/decode + latent modification,
one-iteration fine-tune determinism, LatentGAN sample -> image).

Goldens are generated from deterministically seeded models on the CPU
backend and committed under tests/goldens/.  Regenerate with
``CONFIGNET_TPU_SAVE_GOLDENS=1 python -m pytest tests/test_inference_golden.py``.
"""
import os

import numpy as np
import pytest

from helpers import TINY_FIRST_STAGE_CONFIG

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SAVE = os.environ.get("CONFIGNET_TPU_SAVE_GOLDENS") == "1"


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, name + ".npz")


def _check_or_save(name, **arrays):
    path = _golden_path(name)
    if SAVE:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **arrays)
        return
    if not os.path.exists(path):
        # A deleted/corrupted golden must FAIL, not silently regenerate —
        # regeneration is an explicit act (CONFIGNET_TPU_SAVE_GOLDENS=1).
        pytest.fail(
            f"golden {name} is missing; regenerate deliberately with "
            "CONFIGNET_TPU_SAVE_GOLDENS=1"
        )
    with np.load(path) as ref:
        for key, value in arrays.items():
            np.testing.assert_allclose(
                value, ref[key], atol=2e-4,
                err_msg=f"golden mismatch: {name}/{key}",
            )


@pytest.fixture(scope="module")
def confignet_model():
    from confignet_tpu.training.second_stage import ConfigNet

    return ConfigNet(dict(TINY_FIRST_STAGE_CONFIG, seed=7))


def test_confignet_basic_golden(confignet_model):
    """Encode -> decode -> modify attribute -> decode, all pinned."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)

    embedding, rotation = confignet_model.encode_images(img)
    decoded = confignet_model.generate_images(embedding, rotation)

    new_value = np.array([0.1, 0.9, 0.2], np.float32)
    modified = confignet_model.set_facemodel_param_in_latents(
        embedding, "head_hair_color", new_value
    )
    decoded_modified = confignet_model.generate_images(modified, rotation)

    _check_or_save(
        "confignet_basic",
        embedding=embedding,
        rotation=rotation,
        decoded_image=decoded.astype(np.float32),
        modified_embedding=modified,
        decoded_image_modified=decoded_modified.astype(np.float32),
    )


def test_confignet_finetune_golden(confignet_model):
    """One fine-tune iteration pins optimizer-step behavior, not just the
    forward pass (reference inference_test.py:54-75)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    embedding, rotation = confignet_model.fine_tune_on_img(img, n_iters=1)
    decoded = confignet_model.generate_images(embedding, rotation)
    confignet_model._fine_tuned_generator_params = None  # reset for other tests

    _check_or_save(
        "confignet_finetune",
        embedding=embedding,
        rotation=rotation,
        decoded_image=decoded.astype(np.float32),
    )


@pytest.mark.slow
def test_confignet_512_golden():
    """512px fine-tune + generate, pinned (the reference parametrizes its
    goldens over 256/512 — tests/inference_test.py:23-75; the 512 path adds
    the map_2d_2b/2c blocks, so it needs its own golden)."""
    from confignet_tpu.training.second_stage import ConfigNet

    model = ConfigNet(
        dict(TINY_FIRST_STAGE_CONFIG, output_shape=(512, 512, 3), seed=9)
    )
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    embedding, rotation = model.fine_tune_on_img(img, n_iters=1)
    decoded = model.generate_images(embedding, rotation)

    _check_or_save(
        "confignet_finetune_512",
        embedding=embedding,
        rotation=rotation,
        decoded_image=decoded.astype(np.float32),
    )


def test_latentgan_golden(confignet_model):
    from confignet_tpu.training.latent_gan import LatentGAN

    gan = LatentGAN({"latent_dim": confignet_model.config["latent_dim"], "seed": 11})
    np.random.seed(0)
    latents = gan.generate_latents(1, truncation=1.0)
    imgs = confignet_model.generate_images(latents, np.zeros((1, 3), np.float32))

    _check_or_save(
        "latentgan_sample",
        latents=latents,
        generated_imgs=imgs.astype(np.float32),
    )
