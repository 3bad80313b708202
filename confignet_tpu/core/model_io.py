"""Checkpoint IO: self-describing model files.

Format (mirrors the reference's npz+json+pck convention,
confignet_first_stage.py:173-206, with pytree-path keys instead of opaque
Keras weight-list ordering):

- ``<name>.json``   — the full merged config, incl. ``model_type``.
- ``<name>.npz``    — every parameter, keyed ``<tree>/<flattened/path>``.
- ``<name>_facemodel_distr.pck`` — pickled sampling distributions.
- ``<name>_log.json`` — loss/metric history (optional).

``load_confignet`` dispatches on the saved ``model_type`` like the
reference's polymorphic loader (confignet_utils.py:14-21).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
from flax import traverse_util


def flatten_param_trees(trees: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """{"generator": pytree, ...} -> {"generator/path/to/leaf": ndarray}."""
    flat: Dict[str, np.ndarray] = {}
    for tree_name, tree in trees.items():
        if tree is None:
            continue
        for path, leaf in traverse_util.flatten_dict(tree).items():
            key = tree_name + "/" + "/".join(str(p) for p in path)
            flat[key] = np.asarray(leaf)
    return flat


def unflatten_param_trees(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of :func:`flatten_param_trees`."""
    grouped: Dict[str, Dict] = {}
    for key, value in flat.items():
        tree_name, _, rest = key.partition("/")
        grouped.setdefault(tree_name, {})[tuple(rest.split("/"))] = np.asarray(value)
    return {name: traverse_util.unflatten_dict(paths) for name, paths in grouped.items()}


def save_model_weights(trees: Dict[str, Any], output_dir: str, output_filename: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, output_filename + ".npz")
    np.savez(path, **flatten_param_trees(trees))
    return path


def load_model_weights(npz_path: str) -> Dict[str, Any]:
    with np.load(npz_path, allow_pickle=False) as data:
        return unflatten_param_trees({k: data[k] for k in data.files})


def npz_is_reference_format(npz_path: str) -> bool:
    """True when the npz is a reference-release checkpoint: Keras
    ``get_weights()`` lists keyed ``<model>_weights`` (object arrays, saved
    by confignet_first_stage.py:173-178 / latent_gan.py:48-56) rather than
    our ``<tree>/<path>`` keys.  Only the key listing is touched, so no
    pickle is executed here."""
    with np.load(npz_path, allow_pickle=False) as data:
        files = list(data.files)
    return bool(files) and all(k.endswith("_weights") for k in files)


def attempt_reloading_checkpoint(output_dir: str, dnn_loader=None):
    """Preemption-recovery: scan ``<output>/checkpoints`` and the previous
    job's output dir (``$PT_PREV_OUTPUT_DIR/checkpoints``) for the newest
    checkpoint json and reload it (reference: confignet_utils.py:161-180 —
    defined there but never wired into the CLI; here train_confignet calls
    it on startup)."""
    import glob

    if dnn_loader is None:
        dnn_loader = load_confignet

    candidate_dirs = [os.path.join(output_dir, "checkpoints")]
    if "PT_PREV_OUTPUT_DIR" in os.environ:
        candidate_dirs.append(
            os.path.join(os.environ["PT_PREV_OUTPUT_DIR"], "checkpoints")
        )

    print("Attempting to restart job from checkpoint. Potential checkpoint dirs are:")
    for candidate in candidate_dirs:
        print(candidate)

    for checkpoint_dir in candidate_dirs:
        if not os.path.exists(checkpoint_dir):
            continue
        checkpoint_files = sorted(
            path
            for path in glob.glob(os.path.join(checkpoint_dir, "*.json"))
            if not path.endswith("_log.json")
        )
        if not checkpoint_files:
            continue
        print("Found loadable checkpoint")
        return dnn_loader(checkpoint_files[-1])
    return None


def save_weights_orbax(trees: Dict[str, Any], checkpoint_dir: str) -> None:
    """Save parameter trees with orbax (sharded/async-capable — the option
    for very large runs; the npz path stays the default interchange
    format).  ``checkpoint_dir`` must be absolute."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(
            os.path.abspath(checkpoint_dir),
            {k: v for k, v in trees.items() if v is not None},
            force=True,
        )


def load_weights_orbax(checkpoint_dir: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(os.path.abspath(checkpoint_dir))


def load_confignet(model_path: str):
    """Load any saved model (ConfigNet, ConfigNetFirstStage, LatentGAN) by
    its ``model_type`` field.  Each class loader sniffs the npz format, so
    official reference-release checkpoints (``model.zip`` contents) load
    through the same entry point as our own."""
    with open(model_path, "r") as fp:
        metadata = json.load(fp)
    model_type = metadata["model_type"]

    if model_type == "ConfigNetFirstStage":
        from confignet_tpu.training.first_stage import ConfigNetFirstStage

        return ConfigNetFirstStage.load(model_path)
    if model_type == "ConfigNet":
        from confignet_tpu.training.second_stage import ConfigNet

        return ConfigNet.load(model_path)
    if model_type == "LatentGAN":
        from confignet_tpu.training.latent_gan import LatentGAN

        return LatentGAN.load(model_path)
    raise ValueError(f"unknown model_type {model_type!r} in {model_path}")
