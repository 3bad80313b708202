"""Import externally supplied Keras ``.h5`` weights into our Flax backbones.

The build environment cannot download the ImageNet/VGGFace weight files, so
backbones start from deterministic seeded inits.  When a user provides the
standard Keras weight files (e.g. ``vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5``
or ``rcmalli_vggface_tf_notop_vgg16.h5``, the two files the reference
downloads at perceptual_loss.py:19,30-32), this shim loads them by layer
name.  Keras conv kernels are already HWIO, the same layout Flax uses, so no
transposition is needed.
"""
from __future__ import annotations

from typing import Any, Dict


def load_keras_h5_weights(params: Dict[str, Any], h5_path: str) -> Dict[str, Any]:
    """Return a copy of ``params`` with any layer whose name matches a layer
    in the h5 file replaced by the stored kernel/bias."""
    import h5py
    import numpy as np
    import jax.numpy as jnp

    new_params = dict(params)
    with h5py.File(h5_path, "r") as f:
        weight_root = f["model_weights"] if "model_weights" in f else f
        for layer_name in list(weight_root.keys()):
            if layer_name not in new_params:
                continue
            group = weight_root[layer_name]
            # Keras nests again by layer name (possibly with suffixes).
            sub = group
            while len(sub.keys()) == 1 and not _is_weight_key(list(sub.keys())[0]):
                sub = sub[list(sub.keys())[0]]
            entry = dict(new_params[layer_name])
            for key in sub.keys():
                arr = np.asarray(sub[key])
                if _canonical_name(key) == "kernel" and "kernel" in entry:
                    entry["kernel"] = jnp.asarray(arr)
                elif _canonical_name(key) == "bias" and "bias" in entry:
                    entry["bias"] = jnp.asarray(arr)
            new_params[layer_name] = entry
    return new_params


def _is_weight_key(key: str) -> bool:
    return _canonical_name(key) in ("kernel", "bias")


def _canonical_name(key: str) -> str:
    stem = key.split(":")[0]
    for candidate in ("kernel", "bias", "W", "b"):
        if stem == candidate or stem.endswith("_" + candidate):
            return {"W": "kernel", "b": "bias"}.get(candidate, candidate)
    return stem
