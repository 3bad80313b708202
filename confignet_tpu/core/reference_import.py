"""Import checkpoints saved by the original TensorFlow ConfigNet.

The reference saves ``np.savez(**{model: get_weights_list})`` + a config
json (confignet_first_stage.py:173-206).  Keras ``get_weights()`` returns a
flat list ordered by the object graph (sub-layer attribute-assignment order,
depth-first; within a layer: kernel then bias, or gamma then beta).  This
module declares that order explicitly per model as a list of our pytree
paths, then zips the flat list onto our parameters with strict shape
checking — any drift fails loudly instead of silently mis-assigning.

Caveats (documented, not hidden):
- The expected orders below are derived from the reference constructors
  (hologan_generator.py, hologan_discriminator.py, building_blocks.py,
  synthetic_encoder.py, real_encoder.py); the ordering RULES are pinned by
  tests/test_reference_import.py against real Keras models, but the full
  released ``model.zip`` was not available in this build environment to
  validate end-to-end.
- The generator's ``learned_input`` Dense has a provably-dead zero kernel
  (see models/generator.py); its bias maps to our learned constant and the
  kernel is checked-and-dropped.
- The ImageNet ResNet50 inside the real encoder carries batch-norm moving
  statistics, interleaved per Keras order (gamma, beta, moving_mean,
  moving_variance).
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np


def _adain_block_paths(prefix: str) -> List[Tuple[str, ...]]:
    """Conv{2,3}dAdaIn weight order: conv kernel/bias, then the AdaIN MLP's
    dense layers (building_blocks.py: map_* assigned before adain)."""
    return [
        (prefix, "conv_0", "kernel"),
        (prefix, "conv_0", "bias"),
        (prefix, "adain", "mlp", "dense_0", "kernel"),
        (prefix, "adain", "mlp", "dense_0", "bias"),
        (prefix, "adain", "mlp", "dense_1", "kernel"),
        (prefix, "adain", "mlp", "dense_1", "bias"),
    ]


def generator_weight_paths(output_size: int) -> List[Tuple[str, ...]]:
    """Keras weight order of HologanGenerator (hologan_generator.py:23-101).

    The leading learned-input Dense contributes (kernel, bias); the kernel is
    represented by the sentinel path ('__drop_zero_kernel__',)."""
    paths: List[Tuple[str, ...]] = [
        ("__drop_zero_kernel__",),
        ("learned_input",),
    ]
    paths += _adain_block_paths("map_3d_0")
    paths += _adain_block_paths("map_3d_1")
    paths += [
        ("map_3d_post_0", "kernel"), ("map_3d_post_0", "bias"),
        ("map_3d_post_1", "kernel"), ("map_3d_post_1", "bias"),
        ("projection_conv", "kernel"), ("projection_conv", "bias"),
    ]
    paths += _adain_block_paths("map_2d_0")
    paths += _adain_block_paths("map_2d_1")
    paths += _adain_block_paths("map_2d_2")
    if output_size > 128:
        paths += _adain_block_paths("map_2d_2b")
    if output_size > 256:
        paths += _adain_block_paths("map_2d_2c")
    paths += [("map_final", "kernel"), ("map_final", "bias")]
    return paths


def discriminator_weight_paths(num_resample: int, from_rgb: bool = True,
                               list_ordering: str = "grouped") -> List[Tuple[str, ...]]:
    """HologanDiscriminator order (hologan_discriminator.py:19-46): from-RGB
    conv, the conv-block/style-classifier lists, then the final dense.

    ``list_ordering`` handles the Keras-version ambiguity for the two python
    list attributes filled alternately in one loop:
    - "grouped":     ALL conv blocks then ALL style classifiers (object-graph
      attribute order — MEASURED on tf_keras 2.21 in
      tests/test_tf_parity.py, and the TF 2.1 order the reference pins);
    - "interleaved": conv0, style0, conv1, style1, ... (layer-creation order,
      kept as a fallback for other Keras lineages).
    ``load_reference_confignet`` tries both; strict shape checks make the
    wrong choice fail loudly."""
    paths: List[Tuple[str, ...]] = []
    if from_rgb:
        paths += [("from_rgb", "kernel"), ("from_rgb", "bias")]

    block = lambda i: [
        (f"block_{i}", "conv", "kernel"),
        (f"block_{i}", "conv", "bias"),
        (f"block_{i}", "in_gamma"),
        (f"block_{i}", "in_beta"),
    ]
    style = lambda i: [
        (f"style_classifier_{i}", "kernel"),
        (f"style_classifier_{i}", "bias"),
    ]
    if list_ordering == "grouped":
        for i in range(num_resample):
            paths += block(i)
        for i in range(num_resample):
            paths += style(i)
    elif list_ordering == "interleaved":
        for i in range(num_resample):
            paths += block(i) + style(i)
    else:
        raise ValueError(f"unknown list_ordering {list_ordering!r}")
    paths += [("disc_map", "kernel"), ("disc_map", "bias")]
    return paths


def latent_regressor_weight_paths(num_resample: int, from_rgb: bool = True) -> List[Tuple[str, ...]]:
    paths: List[Tuple[str, ...]] = []
    if from_rgb:
        paths += [("from_rgb", "kernel"), ("from_rgb", "bias")]
    for i in range(num_resample):
        paths += [
            (f"block_{i}", "conv", "kernel"),
            (f"block_{i}", "conv", "bias"),
            (f"block_{i}", "in_gamma"),
            (f"block_{i}", "in_beta"),
        ]
    paths += [("latent_predictor", "kernel"), ("latent_predictor", "bias")]
    return paths


def mlp_weight_paths(num_layers: int) -> List[Tuple[str, ...]]:
    paths = []
    for i in range(num_layers):
        paths += [(f"dense_{i}", "kernel"), (f"dense_{i}", "bias")]
    return paths


def synthetic_encoder_weight_paths(facemodel_inputs: Sequence, num_layers: int = 2) -> List[Tuple[str, ...]]:
    """Per-parameter MLPs in facemodel_inputs (alphabetical) order
    (synthetic_encoder.py:19-33)."""
    paths: List[Tuple[str, ...]] = []
    for name, _dims in facemodel_inputs:
        for i in range(num_layers):
            paths += [
                (f"mlp_{name}", f"dense_{i}", "kernel"),
                (f"mlp_{name}", f"dense_{i}", "bias"),
            ]
    return paths


def _resnet50_layer_to_path(layer_name: str) -> Tuple[str, ...]:
    """Map a Keras ResNet50 layer name to our Flax module path
    (models/backbones/resnet.py naming)."""
    if layer_name == "conv1_conv":
        return ("resnet", "stem_conv")
    if layer_name == "conv1_bn":
        return ("resnet", "stem_bn")
    # conv{S}_block{B}_{J}_{conv|bn}, S in 2..5 -> stage{S-1}, J in 0..3.
    parts = layer_name.split("_")
    stage = int(parts[0][4:]) - 1
    block = int(parts[1][5:])
    j = int(parts[2])
    kind = parts[3]
    if kind == "conv":
        sub = "shortcut_conv" if j == 0 else f"conv{j}"
    else:
        sub = "shortcut_bn" if j == 0 else f"bn{j}"
    return ("resnet", f"stage{stage}_block{block}", sub)


def real_encoder_weight_paths(latent_dim: int = None) -> List[Tuple[str, ...]]:
    """Keras weight order of RealEncoder (real_encoder.py:9-22): the ResNet50
    functional model's weights (core/resnet50_keras_order.py, measured), then
    the rotation regressor and latent head Dense layers — the attribute
    assignment order of the reference constructor."""
    from confignet_tpu.core.resnet50_keras_order import RESNET50_KERAS_WEIGHT_NAMES

    paths: List[Tuple[str, ...]] = []
    for name in RESNET50_KERAS_WEIGHT_NAMES:
        layer, leaf = name.rsplit("/", 1)
        paths.append(_resnet50_layer_to_path(layer) + (leaf,))
    paths += [
        ("rotation_regressor", "kernel"), ("rotation_regressor", "bias"),
        ("feature_to_latent", "kernel"), ("feature_to_latent", "bias"),
    ]
    return paths


def assign_weight_list(params: Dict[str, Any], weight_list: Sequence[np.ndarray],
                       paths: List[Tuple[str, ...]], model_name: str = "") -> Dict[str, Any]:
    """Zip a Keras flat weight list onto our params at the declared paths,
    strict on counts and shapes."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(params))
    weight_list = list(weight_list)
    if len(weight_list) != len(paths):
        raise ValueError(
            f"{model_name}: expected {len(paths)} weights, got {len(weight_list)}"
        )

    for offset, (path, weight) in enumerate(zip(paths, weight_list)):
        weight = np.asarray(weight)
        if path == ("__drop_zero_kernel__",):
            if np.any(weight != 0):
                raise ValueError(
                    f"{model_name}[{offset}]: learned-input kernel expected to "
                    "be all-zero (it is dead in the reference); refusing import"
                )
            continue
        if path not in flat:
            raise KeyError(f"{model_name}[{offset}]: no parameter at {'/'.join(path)}")
        target_shape = tuple(np.shape(flat[path]))
        if tuple(weight.shape) != target_shape:
            raise ValueError(
                f"{model_name}[{offset}] {'/'.join(path)}: shape {weight.shape} "
                f"!= expected {target_shape}"
            )
        flat[path] = weight.astype(np.float32)

    return traverse_util.unflatten_dict(flat)


class _ReferenceUnpickler:
    """Unpickle reference-release ``*_facemodel_distr.pck`` files.

    The reference pickles instances of its own distribution classes
    (``confignet.neural_renderer_dataset.{OneHot,Exemplar}Distribution``,
    neural_renderer_dataset.py:22-59) plus sklearn ``GaussianMixture``; our
    classes carry the same attribute names, so remapping the module path is
    enough to restore them."""

    _CLASS_MAP = {
        ("confignet.neural_renderer_dataset", "OneHotDistribution"):
            ("confignet_tpu.data.distributions", "OneHotDistribution"),
        ("confignet.neural_renderer_dataset", "ExemplarDistribution"):
            ("confignet_tpu.data.distributions", "ExemplarDistribution"),
    }

    @classmethod
    def load(cls, fp):
        import importlib
        import pickle

        class Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                module, name = cls._CLASS_MAP.get((module, name), (module, name))
                return getattr(importlib.import_module(module), name)

        return Unpickler(fp).load()


def load_reference_pickle(path: str):
    """Load a pickle that may have been written by the original TF repo."""
    with open(path, "rb") as fp:
        return _ReferenceUnpickler.load(fp)


def load_reference_confignet(json_path: str):
    """Build a ConfigNet(FirstStage) from a reference-format checkpoint
    (json + npz of Keras weight lists).  Backbone-dependent parts (the real
    encoder's ResNet50) are imported when present; on failure the import
    raises with the exact offending weight offset."""
    import os

    from confignet_tpu.training.first_stage import ConfigNetFirstStage
    from confignet_tpu.training.second_stage import ConfigNet

    with open(json_path, "r") as fp:
        config = json.load(fp)
    model_cls = ConfigNet if config.get("model_type") == "ConfigNet" else ConfigNetFirstStage
    model = model_cls(config)

    data = np.load(os.path.splitext(json_path)[0] + ".npz", allow_pickle=True)
    size = model.config["output_shape"][0]
    n_resample = model.config["n_discr_layers"]
    from_rgb = model.config["initial_from_rgb_layer_in_discr"]

    weights = model.get_weights()
    weights["generator"] = assign_weight_list(
        weights["generator"], data["generator_weights"],
        generator_weight_paths(size), "generator")
    weights["generator_smoothed"] = assign_weight_list(
        weights["generator_smoothed"], data["generator_smoothed_weights"],
        generator_weight_paths(size), "generator_smoothed")
    def assign_discriminator(params, weight_list, name):
        try:
            return assign_weight_list(
                params, weight_list,
                discriminator_weight_paths(n_resample, from_rgb, "grouped"), name)
        except (ValueError, KeyError):
            return assign_weight_list(
                params, weight_list,
                discriminator_weight_paths(n_resample, from_rgb, "interleaved"), name)

    weights["discriminator"] = assign_discriminator(
        weights["discriminator"], data["discriminator_weights"], "discriminator")
    weights["synth_discriminator"] = assign_discriminator(
        weights["synth_discriminator"], data["synth_discriminator_weights"],
        "synth_discriminator")
    weights["latent_regressor"] = assign_weight_list(
        weights["latent_regressor"], data["latent_regressor_weights"],
        latent_regressor_weight_paths(n_resample, from_rgb), "latent_regressor")
    weights["latent_discriminator"] = assign_weight_list(
        weights["latent_discriminator"], data["latent_discriminator_weights"],
        mlp_weight_paths(model.config["n_latent_discr_layers"]), "latent_discriminator")
    weights["synthetic_encoder"] = assign_weight_list(
        weights["synthetic_encoder"], data["synthetic_encoder_weights"],
        synthetic_encoder_weight_paths(
            model.facemodel_inputs_tuple, model.config["num_synth_encoder_layers"]
        ),
        "synthetic_encoder")
    if "real_encoder_weights" in data and "real_encoder" in weights:
        weights["real_encoder"] = assign_weight_list(
            weights["real_encoder"], data["real_encoder_weights"],
            real_encoder_weight_paths(), "real_encoder")

    model.set_weights(weights)
    return model


def load_reference_latent_gan(json_path: str):
    """Build a LatentGAN from a reference-format checkpoint (json + npz of
    Keras weight lists; format: /root/reference/confignet/latent_gan.py:48-81
    — keys generator_weights / smoothed_generator_weights /
    discriminator_weights, MLPSimple stacks of ``num_mlp_layers`` Dense
    layers)."""
    import os

    from confignet_tpu.training.latent_gan import LatentGAN

    with open(json_path, "r") as fp:
        config = json.load(fp)
    gan = LatentGAN(config)
    data = np.load(os.path.splitext(json_path)[0] + ".npz", allow_pickle=True)

    paths = mlp_weight_paths(gan.config["num_mlp_layers"])
    weights = gan.get_weights()
    weights["generator"] = assign_weight_list(
        weights["generator"], data["generator_weights"], paths, "latentgan_generator")
    weights["generator_smoothed"] = assign_weight_list(
        weights["generator_smoothed"], data["smoothed_generator_weights"], paths,
        "latentgan_generator_smoothed")
    weights["discriminator"] = assign_weight_list(
        weights["discriminator"], data["discriminator_weights"], paths,
        "latentgan_discriminator")
    gan.set_weights(weights)
    return gan
