"""Pretrained-weights runbook (gated tier, VERDICT r2 item 4).

These tests verify the north-star claims against the reference's RELEASED
artifacts — the pretrained ``model.zip`` checkpoints and the committed npz
goldens (/root/reference/tests/inference_test.py:23-97,
tests/test_assets/confignet_basic_ref_{256,512}.npz etc.).  This rig has no
egress, so the weights cannot be downloaded here; everything is
skipped-by-default and activates the day the artifacts are present.

One-command runbook (see also README "Pretrained parity runbook"):

    # 1. unpack the reference release model.zip into <repo>/models/
    #    (confignet_256/512, latentgan_256/512, attribute_classifier)
    # 2. optionally point CONFIGNET_TPU_MODELS_DIR elsewhere
    python -m pytest tests/test_pretrained.py -m pretrained -v

Tolerances: embedding/latent paths are pure MLP/conv arithmetic and must
match to ~1e-3; decoded images pass through the full 256/512px generator in
float32 and are compared at a perceptual tolerance (mean abs pixel diff on
the uint8 scale), since TF and XLA differ in conv reduction order.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.pretrained

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS_DIR = os.environ.get(
    "CONFIGNET_TPU_MODELS_DIR", os.path.join(REPO_ROOT, "models")
)
_REF_CHECKOUT_ASSETS = "/root/reference/tests/test_assets"
REF_GOLDEN_DIR = os.environ.get(
    "CONFIGNET_TPU_REF_GOLDEN_DIR",
    _REF_CHECKOUT_ASSETS
    if os.path.isdir(_REF_CHECKOUT_ASSETS)
    else os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_goldens"),
)
TEST_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "test_assets")


def _model_json(name: str) -> str:
    return os.path.join(MODELS_DIR, name, "model.json")


def _require(path: str) -> str:
    if not os.path.exists(path):
        pytest.skip(f"pretrained artifact missing: {path} (see runbook header)")
    return path


def _golden(name: str):
    return np.load(_require(os.path.join(REF_GOLDEN_DIR, name + ".npz")))


@pytest.fixture(scope="module")
def confignet_256():
    from confignet_tpu.core.reference_import import load_reference_confignet

    return load_reference_confignet(_require(_model_json("confignet_256")))


def _load_confignet(resolution: int):
    from confignet_tpu.core.reference_import import load_reference_confignet

    return load_reference_confignet(_require(_model_json(f"confignet_{resolution}")))


def _normalized_test_image(resolution: int) -> np.ndarray:
    """The reference test input: img_0000000_000.png through the full
    normalizer (needs a landmark backend — OpenFace or precomputed)."""
    import cv2

    from confignet_tpu.data.normalizer import FaceImageNormalizer

    img = cv2.imread(os.path.join(TEST_ASSET_DIR, "img_0000000_000.png"))
    try:
        normalized = FaceImageNormalizer.normalize_individual_image(
            img, (resolution, resolution)
        )
    except Exception as exc:
        pytest.skip(f"landmark backend unavailable for normalization: {exc}")
    if normalized is None:
        pytest.skip("no face detected by the configured landmark backend")
    return normalized


@pytest.mark.parametrize("resolution", [256, 512])
def test_generator_matches_reference_golden(resolution):
    """decode(golden embedding) must reproduce the golden image — generator
    parity against released weights, independent of the normalizer/encoder."""
    model = _load_confignet(resolution)
    ref = _golden(f"confignet_basic_ref_{resolution}")
    decoded = model.generate_images(
        ref["embedding"].astype(np.float32), ref["rotation"].astype(np.float32)
    )
    diff = np.abs(decoded.astype(np.float32) - ref["decoded_image"].astype(np.float32))
    assert diff.mean() < 2.0, f"mean abs pixel diff {diff.mean():.3f} (uint8 scale)"
    assert (diff > 16).mean() < 0.01, "more than 1% of pixels off by >16 levels"


@pytest.mark.parametrize("resolution", [256, 512])
def test_attribute_modification_matches_golden(resolution):
    """set_facemodel_param(blendshapes -> neutral) on the golden embedding is
    a pure synthetic-encoder MLP path — tight tolerance.  (The reference test
    decodes the UNmodified embedding for its decoded_image_modified golden —
    inference_test.py:37 — so only the embedding is compared here.)"""
    model = _load_confignet(resolution)
    ref = _golden(f"confignet_basic_ref_{resolution}")
    n_blend = model.config["facemodel_inputs"]["blendshape_values"][0]
    modified = model.set_facemodel_param_in_latents(
        ref["embedding"].astype(np.float32), "blendshape_values",
        np.zeros((1, n_blend), np.float32),
    )
    np.testing.assert_allclose(modified, ref["modified_embedding"], atol=1e-3)


@pytest.mark.parametrize("resolution", [256, 512])
def test_encode_decode_matches_golden(resolution):
    """Full encode->decode against the golden (requires the OpenFace-normalized
    input image, i.e. a landmark backend)."""
    model = _load_confignet(resolution)
    ref = _golden(f"confignet_basic_ref_{resolution}")
    image = _normalized_test_image(resolution)
    embedding, rotation = model.encode_images(image[np.newaxis])
    np.testing.assert_allclose(embedding, ref["embedding"], atol=5e-3)
    np.testing.assert_allclose(rotation, ref["rotation"], atol=5e-3)


@pytest.mark.parametrize("resolution", [256, 512])
def test_finetune_matches_golden(resolution):
    """One fine-tune iteration from the released weights pins optimizer-step
    behavior (reference inference_test.py:54-75)."""
    model = _load_confignet(resolution)
    ref = _golden(f"confignet_finetune_ref_{resolution}")
    image = _normalized_test_image(resolution)
    embedding, rotation = model.fine_tune_on_img(image[np.newaxis], n_iters=1)
    np.testing.assert_allclose(embedding, ref["embedding"], atol=1e-2)
    decoded = model.generate_images(embedding, rotation)
    diff = np.abs(decoded.astype(np.float32) - ref["decoded_image"].astype(np.float32))
    assert diff.mean() < 3.0


@pytest.mark.parametrize("resolution", [256, 512])
def test_latentgan_matches_golden(resolution):
    """np.random.seed(0) -> generate_latents(1) -> decode, vs the committed
    golden (reference inference_test.py:77-97; noise path is np.random in
    both implementations so the latents agree exactly given the seed)."""
    from confignet_tpu.core.reference_import import load_reference_latent_gan

    gan = load_reference_latent_gan(_require(_model_json(f"latentgan_{resolution}")))
    model = _load_confignet(resolution)
    ref = _golden(f"latentgan_ref_{resolution}")
    np.random.seed(0)
    latents = gan.generate_latents(1)
    imgs = model.generate_images(latents, np.zeros((1, 3), np.float32))
    diff = np.abs(imgs.astype(np.float32) - ref["generated_imgs"].astype(np.float32))
    assert diff.mean() < 2.0


@pytest.mark.slow
def test_controllability_table2():
    """Paper Table 2 row 1 reproduction (reference README.md:30-36): the
    first three contr_attribute_means from the controllability eval on an
    FFHQ-valid dataset must be within 2% of the released numbers.  Needs the
    pretrained models, the attribute classifier, AND an FFHQ validation
    dataset file (point CONFIGNET_TPU_FFHQ_VALID at the .pck)."""
    dataset_path = os.environ.get("CONFIGNET_TPU_FFHQ_VALID")
    if not dataset_path or not os.path.exists(dataset_path):
        pytest.skip("set CONFIGNET_TPU_FFHQ_VALID to the ffhq_valid dataset .pck")
    _require(_model_json("confignet_256"))
    classifier_json = _require(
        os.path.join(MODELS_DIR, "attribute_classifier", "model.json")
    )

    import tempfile

    from confignet_tpu.apps.evaluate_confignet_controllability import parse_args as eval_main

    with tempfile.TemporaryDirectory() as tmp:
        eval_main([
            "--model_path", _model_json("confignet_256"),
            "--test_set_path", dataset_path,
            "--attribute_classifier_path", classifier_json,
            "--output_dir", tmp,
            "--n_samples", "1000",
        ])
        out_json = [f for f in os.listdir(tmp) if f.endswith(".json")]
        assert out_json, "controllability eval produced no JSON"
        with open(os.path.join(tmp, out_json[0])) as fp:
            metrics = json.load(fp)
        means = metrics["contr_attribute_means"][:3]
        assert all(0.0 <= m <= 1.0 for m in means)
        print("contr_attribute_means[:3] =", means,
              "(compare to paper Table 2, row 1)")
        # The paper is not vendored in this environment, so the expected
        # values must be supplied: CONFIGNET_TPU_TABLE2_EXPECTED='[a,b,c]'.
        expected = os.environ.get("CONFIGNET_TPU_TABLE2_EXPECTED")
        if expected:
            for got, want in zip(means, json.loads(expected)):
                assert abs(got - want) <= 0.02 * max(want, 1e-6), (means, expected)
