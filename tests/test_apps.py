"""End-to-end CLI smoke tests: drive the real entry points with tiny
datasets built through the full data pipeline (fake landmark backend), tiny
model configs, and minimal step counts — the analog of the reference's
training/evaluation test suite (SURVEY.md §4)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles fused train steps on the 8-device CPU mesh

from helpers import TINY_FIRST_STAGE_CONFIG

ATTRS = [
    "Black_Hair", "Blond_Hair", "Brown_Hair", "Gray_Hair",
    "Mouth_Slightly_Open", "Narrow_Eyes", "Smiling", "Mustache",
    "No_Beard", "Goatee", "Sideburns",
]

TINY_CLI_CONFIG = dict(TINY_FIRST_STAGE_CONFIG)
TINY_CLI_CONFIG["facemodel_inputs"] = {
    "blendshape_values": [None, 6],
    "head_hair_color": [None, 4],
    "beard_style_embedding": [None, 4],
    "bone_rotations:left_eye": [None, 2],
    "hdri_embedding": [None, 3],
}


def _write_face_image(path, size=128, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 100, (size, size, 3), dtype=np.uint8)
    cv2.ellipse(img, (size // 2, size // 2), (size // 3, size // 2 - 10), 0, 0, 360,
                (180, 150, 120), -1)
    cv2.imwrite(path, img)


def _make_metadata(seed=0):
    rng = np.random.default_rng(seed)
    from confignet_tpu.metrics.blendshape_names import blendshape_names

    return {
        "blendshape_values": {n: float(rng.random() * 0.3) for n in blendshape_names[:-1]},
        "bone_rotations": {
            "neck": [0.0, 0.0, 0.0],
            "head": [float(rng.uniform(-0.1, 0.1)), 0.0, float(rng.uniform(-0.1, 0.1))],
            "jaw": [float(rng.random() * 0.1), 0.0, 0.0],
            "left_eye": [0.0, 0.0, 0.0],
            "right_eye": [0.0, 0.0, 0.0],
        },
        "head_hair_color": {
            "melanin": float(rng.random()), "redness": float(rng.random()), "greyness": 0.0,
        },
        "beard_style_embedding": [float(x) for x in rng.normal(size=9)],
        "hdri_embedding": [float(x) for x in rng.normal(size=5)],
    }


@pytest.fixture(scope="module")
def dataset_paths(tmp_path_factory):
    """Build real+synth .pck datasets through generate_dataset CLI."""
    from confignet_tpu.apps import generate_dataset

    root = tmp_path_factory.mktemp("cli_data")

    # real dataset with celeba attributes
    real_dir = os.path.join(str(root), "real")
    os.makedirs(real_dir)
    rng = np.random.default_rng(0)
    with open(os.path.join(real_dir, "list_attr_celeba.txt"), "w") as fp:
        fp.write("4\n" + " ".join(ATTRS) + "\n")
        for i in range(4):
            _write_face_image(os.path.join(real_dir, f"img_{i:03d}.png"), seed=i)
            vals = " ".join(str(int(rng.random() > 0.5) * 2 - 1) for _ in ATTRS)
            fp.write(f"img_{i:03d}.png {vals}\n")

    generate_dataset.parse_args([
        "--dataset_dir", real_dir, "--dataset_name", "real",
        "--output_dir", str(root), "--img_size", "128",
        "--load_attributes", "--landmark_backend", "fake",
        "--skip_inception_features", "--pre_normalize", "0",
    ])

    # synthetic dataset with metadata
    synth_dir = os.path.join(str(root), "synth")
    os.makedirs(synth_dir)
    for i in range(4):
        _write_face_image(os.path.join(synth_dir, f"img_{i:03d}.png"), seed=10 + i)
        with open(os.path.join(synth_dir, f"meta_{i:03d}.json"), "w") as fp:
            json.dump(_make_metadata(seed=i), fp)

    generate_dataset.parse_args([
        "--dataset_dir", synth_dir, "--dataset_name", "synth",
        "--output_dir", str(root), "--img_size", "128",
        "--synthetic_data", "--landmark_backend", "fake",
        "--skip_inception_features", "--pre_normalize", "0",
    ])

    return {
        "real": os.path.join(str(root), "real_res_128.pck"),
        "synth": os.path.join(str(root), "synth_res_128.pck"),
        "root": str(root),
    }


@pytest.fixture(scope="module")
def classifier_path(dataset_paths, tmp_path_factory):
    """Train the attribute classifier for 1 tiny epoch via its CLI."""
    from confignet_tpu.apps import train_attribute_classifier

    out = str(tmp_path_factory.mktemp("clf"))
    train_attribute_classifier.parse_args([
        "--training_set_path", dataset_paths["real"],
        "--validation_set_path", dataset_paths["real"],
        "--output_dir", out,
        "--n_epochs", "1", "--steps_per_epoch", "1", "--batch_size", "2",
    ])
    ckpts = os.listdir(os.path.join(out, "checkpoints"))
    return os.path.join(out, "checkpoints", sorted(c for c in ckpts if c.endswith(".json"))[-1])


def test_train_confignet_cli(dataset_paths, classifier_path, tmp_path):
    from confignet_tpu.apps import train_confignet

    out_dir = str(tmp_path)
    train_confignet.parse_args([
        "--output_dir", out_dir,
        "--real_training_set_path", dataset_paths["real"],
        "--synth_training_set_path", dataset_paths["synth"],
        "--validation_set_path", dataset_paths["real"],
        "--attribute_classifier_path", classifier_path,
        # the CLI shards over all (8 virtual) devices: batch % (2*mesh) == 0
        "--batch_size", "16",
        "--stage_1_training_steps", "1",
        "--stage_2_training_steps", "1",
        "--n_samples_for_metrics", "2",
        "--config_override", json.dumps(TINY_CLI_CONFIG),
    ])
    # both stages ran and wrote checkpoints
    assert os.path.exists(os.path.join(out_dir, "first_stage", "checkpoints"))
    assert os.path.exists(os.path.join(out_dir, "checkpoints"))
    # stage-2 checkpoint is loadable and is a full ConfigNet
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    ckpt = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.endswith(".json") and not f.endswith("_log.json")
    )[-1]
    from confignet_tpu.core.model_io import load_confignet

    model = load_confignet(os.path.join(ckpt_dir, ckpt))
    assert model.MODEL_TYPE == "ConfigNet"
    # stash for the dependent CLI tests
    test_train_confignet_cli.model_path = os.path.join(ckpt_dir, ckpt)


def test_latent_gan_cli(dataset_paths, tmp_path):
    from confignet_tpu.apps import train_latent_gan

    model_path = getattr(test_train_confignet_cli, "model_path", None)
    if model_path is None:
        pytest.skip("train_confignet CLI test did not run")

    out_dir = str(tmp_path)
    train_latent_gan.parse_args([
        "--confignet_path", model_path,
        "--training_set_path", dataset_paths["real"],
        "--output_dir", out_dir,
        "--n_training_steps", "1",
        "--batch_size", "4",
        "--n_samples_for_metrics", "2",
    ])
    assert os.path.exists(os.path.join(out_dir, "checkpoints", "000000.json"))
    test_latent_gan_cli.model_path = os.path.join(out_dir, "checkpoints", "000000.json")


# Both fine-tune iteration counts, matching the reference's
# tests/evaluation_test.py:17-30 parametrization: 0 = plain encode path,
# 1 = the per-image fine_tune_on_img branch (metrics/controllability.py:104-125).
@pytest.mark.parametrize("n_fine_tuning_iters", [0, 1])
def test_evaluate_controllability_cli(dataset_paths, classifier_path, tmp_path,
                                      n_fine_tuning_iters):
    from confignet_tpu.apps import evaluate_confignet_controllability as ev

    model_path = getattr(test_train_confignet_cli, "model_path", None)
    if model_path is None:
        pytest.skip("train_confignet CLI test did not run")

    out_dir = str(tmp_path)
    metrics = ev.parse_args([
        "--model_path", model_path,
        "--test_set_path", dataset_paths["real"],
        "--output_dir", out_dir,
        "--attribute_classifier_path", classifier_path,
        "--n_samples", "2",
        "--n_fine_tuning_iters", str(n_fine_tuning_iters),
        "--write_images",
    ])
    assert "controllability" in metrics
    files = os.listdir(out_dir)
    assert any(f.endswith(".json") for f in files)
    assert any(f.endswith(".csv") for f in files)
    assert any(f.endswith(".png") for f in files)
    # --write_images dumps gt/raw/per-config image sets into a subdir
    img_dirs = [f for f in files if f.startswith("contr_metrics_tuning_iters_%d" % n_fine_tuning_iters)
                and os.path.isdir(os.path.join(out_dir, f))]
    assert img_dirs, "image dump directory missing"
    dumped = os.listdir(os.path.join(out_dir, img_dirs[0]))
    assert any(f.startswith("gt_img_") for f in dumped)
    assert any(f.startswith("raw_img_") for f in dumped)


def test_demo_cli_all_modes(dataset_paths, tmp_path):
    from confignet_tpu.apps import confignet_demo

    model_path = getattr(test_train_confignet_cli, "model_path", None)
    gan_path = getattr(test_latent_gan_cli, "model_path", None)
    if model_path is None or gan_path is None:
        pytest.skip("upstream CLI tests did not run")

    # mode 1: no input -> LatentGAN sampling
    confignet_demo.run([
        "--test_mode",
        "--confignet_model_path", model_path,
        "--latent_gan_model_path", gan_path,
        "--resolution", "128",
        "--n_rows", "1", "--n_cols", "2",
    ])

    # mode 2: single image (also exercises one-shot fine-tune via test_mode)
    img_path = os.path.join(str(tmp_path), "demo_img.png")
    _write_face_image(img_path, seed=77)
    confignet_demo.run([
        "--test_mode",
        "--image_path", img_path,
        "--confignet_model_path", model_path,
        "--latent_gan_model_path", gan_path,
        "--resolution", "128",
        "--landmark_backend", "fake",
    ])

    # mode 3: image directory
    img_dir = os.path.join(str(tmp_path), "demo_dir")
    os.makedirs(img_dir)
    for i in range(2):
        _write_face_image(os.path.join(img_dir, f"img_{i}.png"), seed=80 + i)
    confignet_demo.run([
        "--test_mode",
        "--image_path", img_dir,
        "--confignet_model_path", model_path,
        "--latent_gan_model_path", gan_path,
        "--resolution", "128",
        "--n_rows", "1", "--n_cols", "2",
        "--landmark_backend", "fake",
    ])


def test_demo_cli_with_reference_format_checkpoint(tmp_path):
    """Drop-in replacement check: the demo CLI runs unmodified against a
    checkpoint in the official release format (Keras weight-list npz +
    json + reference-module distr pck), matching
    /root/reference/evaluation/confignet_demo.py:18-26 semantics."""
    from confignet_tpu.apps import confignet_demo
    from confignet_tpu.core.model_io import load_confignet
    from helpers import write_reference_checkpoint

    model_path = getattr(test_train_confignet_cli, "model_path", None)
    gan_path = getattr(test_latent_gan_cli, "model_path", None)
    if model_path is None or gan_path is None:
        pytest.skip("upstream CLI tests did not run")

    model = load_confignet(model_path)
    ref_dir = os.path.join(str(tmp_path), "reference_release")
    ref_json = write_reference_checkpoint(model, ref_dir)

    confignet_demo.run([
        "--test_mode",
        "--confignet_model_path", ref_json,
        "--latent_gan_model_path", gan_path,
        "--resolution", "128",
        "--n_rows", "1", "--n_cols", "2",
    ])
