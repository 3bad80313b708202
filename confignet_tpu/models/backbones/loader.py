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
    matched = 0
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
            matched += 1
    if matched == 0:
        # Never silently "load" nothing (Keras counter-style names don't
        # match our module names — use load_keras_h5_ordered/_mapped then).
        raise ValueError(
            f"no layer names in {h5_path} match this model's modules; "
            "for InceptionV3/MobileNetV2 use load_keras_h5_ordered, for "
            "ResNet50 use load_keras_h5_mapped"
        )
    return new_params


def _is_weight_key(key: str) -> bool:
    return _canonical_name(key) in ("kernel", "bias")


def _canonical_name(key: str) -> str:
    stem = key.split(":")[0]
    for candidate in ("kernel", "bias", "W", "b"):
        if stem == candidate or stem.endswith("_" + candidate):
            return {"W": "kernel", "b": "bias"}.get(candidate, candidate)
    return stem


# ---------------------------------------------------------------------------
# Ordered transfer for BN backbones (InceptionV3 / MobileNetV2)
# ---------------------------------------------------------------------------
#
# keras.applications names layers with global counters ("conv2d_42",
# "batch_normalization_42") that differ across Keras versions and sessions,
# so name matching cannot work for these models.  The h5 file, however,
# stores ``layer_names`` in model (creation) order, which is an architectural
# invariant.  We therefore zip the file's conv layers, in order, with our
# module paths in construction order, and the BN layers likewise.


def _set_path(params: Dict[str, Any], path: str, leaf_updates: Dict[str, Any]) -> None:
    parts = path.split("/")
    node = params
    for part in parts[:-1]:
        node[part] = dict(node[part])
        node = node[part]
    entry = dict(node[parts[-1]])
    entry.update(leaf_updates)
    node[parts[-1]] = entry


def load_keras_h5_ordered(params: Dict[str, Any], h5_path: str,
                          conv_paths, bn_paths) -> Dict[str, Any]:
    """Transfer conv kernels and BN (gamma/beta/moving stats) from a Keras
    ``.h5`` weight file into ``params`` by CREATION ORDER.

    ``conv_paths[i]`` receives the i-th conv-bearing layer's kernel (Keras
    depthwise kernels ``(h, w, C, 1)`` are transposed to Flax grouped-conv
    layout ``(h, w, 1, C)``); ``bn_paths[i]`` receives the i-th BN layer's
    parameters (absent gamma — e.g. InceptionV3's scale=False BNs — leaves
    the existing value).
    """
    import re

    import h5py
    import numpy as np
    import jax.numpy as jnp

    # The h5 ``layer_names`` attr is TOPOLOGICAL (model.layers) order, which
    # scrambles parallel branches (e.g. InceptionV3's mixed blocks).  When
    # every weighted layer uses Keras's global-counter naming
    # ("conv2d_42" / "batch_normalization_42"), the counter IS creation
    # order — the architectural invariant — so sort by it.  Semantic names
    # (MobileNetV2's "block_13_expand") keep file order, correct for linear
    # chains.
    counter_re = re.compile(r"^[a-z_0-9]*?[a-z](?:_(\d+))?$")

    def creation_index(name: str) -> int:
        match = counter_re.fullmatch(name)
        return int(match.group(1)) if match and match.group(1) else 0

    new_params = dict(params)
    conv_seen = bn_seen = 0
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else n
            for n in root.attrs["layer_names"]
        ]
        weighted = [n for n in layer_names
                    if len(root[n].attrs.get("weight_names", []))]
        counter_named = [
            bool(re.fullmatch(r"(conv2d|batch_normalization)(_\d+)?", n))
            for n in weighted
        ]
        if counter_named and all(counter_named):
            layer_names = sorted(layer_names, key=creation_index)
        elif any(counter_named):
            # Mixed naming: topological file order would silently scramble
            # parallel branches while still passing the layer-count checks.
            raise ValueError(
                "h5 mixes counter-style layer names "
                f"({[n for n, c in zip(weighted, counter_named) if c][:3]}...) "
                "with semantic names — creation order is ambiguous; "
                "rename the layers or load with explicit per-layer paths"
            )
        for layer_name in layer_names:
            group = root[layer_name]
            weight_names = [
                n.decode() if isinstance(n, bytes) else n
                for n in group.attrs.get("weight_names", [])
            ]
            if not weight_names:
                continue
            arrays = {wn.split("/")[-1].split(":")[0]: np.asarray(group[wn])
                      for wn in weight_names}
            if "moving_mean" in arrays:  # a BatchNormalization layer
                if bn_seen >= len(bn_paths):
                    raise ValueError(
                        f"h5 has more BN layers than expected ({len(bn_paths)})")
                updates = {"beta": jnp.asarray(arrays["beta"]),
                           "moving_mean": jnp.asarray(arrays["moving_mean"]),
                           "moving_variance": jnp.asarray(arrays["moving_variance"])}
                if "gamma" in arrays:
                    updates["gamma"] = jnp.asarray(arrays["gamma"])
                _set_path(new_params, bn_paths[bn_seen], updates)
                bn_seen += 1
            elif "depthwise_kernel" in arrays or "kernel" in arrays:
                if conv_seen >= len(conv_paths):
                    raise ValueError(
                        f"h5 has more conv layers than expected ({len(conv_paths)})")
                kernel = arrays.get("kernel", arrays.get("depthwise_kernel"))
                if "depthwise_kernel" in arrays:
                    # (h, w, C, mult=1) -> (h, w, 1, C) for feature_group_count.
                    kernel = np.transpose(kernel, (0, 1, 3, 2))
                updates = {"kernel": jnp.asarray(kernel)}
                if "bias" in arrays:
                    updates["bias"] = jnp.asarray(arrays["bias"])
                _set_path(new_params, conv_paths[conv_seen], updates)
                conv_seen += 1
    if conv_seen != len(conv_paths) or bn_seen != len(bn_paths):
        raise ValueError(
            f"h5 transferred {conv_seen}/{len(conv_paths)} convs and "
            f"{bn_seen}/{len(bn_paths)} BNs — architecture mismatch")
    return new_params


def load_keras_h5_mapped(params: Dict[str, Any], h5_path: str,
                         name_map: Dict[str, Any]) -> Dict[str, Any]:
    """Transfer weights using an explicit {keras layer name: (our path,
    "conv"|"bn")} map (for models with stable semantic Keras names, e.g.
    ResNet50).  Raises if fewer than half the mapped layers are found —
    a sign of the wrong file generation."""
    import h5py
    import numpy as np
    import jax.numpy as jnp

    new_params = dict(params)
    found = 0
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for layer_name in root.keys():
            if layer_name not in name_map:
                continue
            path, kind = name_map[layer_name]
            group = root[layer_name]
            weight_names = [
                n.decode() if isinstance(n, bytes) else n
                for n in group.attrs.get("weight_names", [])
            ]
            arrays = {wn.split("/")[-1].split(":")[0]: np.asarray(group[wn])
                      for wn in weight_names}
            if kind == "conv":
                updates = {"kernel": jnp.asarray(arrays["kernel"])}
                if "bias" in arrays:
                    updates["bias"] = jnp.asarray(arrays["bias"])
            else:
                updates = {k: jnp.asarray(arrays[k])
                           for k in ("gamma", "beta", "moving_mean", "moving_variance")
                           if k in arrays}
            _set_path(new_params, path, updates)
            found += 1
    if found < len(name_map) // 2:
        raise ValueError(
            f"only {found}/{len(name_map)} mapped layers found in {h5_path}")
    return new_params
