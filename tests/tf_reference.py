"""Load the original TensorFlow ConfigNet model code for parity testing.

The reference at /root/reference is TF 2.1-era Keras code.  We run it under
``tf_keras`` (legacy Keras 2, selected via TF_USE_LEGACY_KERAS=1 in
tests/conftest.py) — the API family it was written for — and compare its
outputs against our Flax ports after transferring weights through
confignet_tpu.core.reference_import.

The reference package is imported under the alias ``refconfignet`` with a
synthetic parent module so that
- the heavy ``confignet/__init__.py`` (cv2, dataset, metrics imports) never
  executes, and
- the absent ``azureml`` dependency is stubbed out.
"""
from __future__ import annotations

import importlib
import os
import sys
import types

REF_ROOT = "/root/reference/confignet"

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")


def _ensure_pkg(name: str, path: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def _ensure_azureml_stub() -> None:
    """confignet_utils imports azure_ml_utils which needs the absent azureml
    package; replace it with an inert stub before it is ever imported."""
    name = "refconfignet.azure_ml_utils"
    if name in sys.modules:
        return
    stub = types.ModuleType(name)
    stub.get_aml_run = lambda: None
    stub.log_job_params = lambda run, args: None
    stub.log_losses = lambda *a, **k: None
    sys.modules[name] = stub


def load_ref_module(dotted: str) -> types.ModuleType:
    """Import e.g. ``"dnn_models.hologan_generator"`` from the reference tree
    as ``refconfignet.dnn_models.hologan_generator``."""
    assert os.environ.get("TF_USE_LEGACY_KERAS") == "1"
    if "tensorflow" in sys.modules:
        import tensorflow as tf

        assert tf.keras.Model.__module__.startswith("tf_keras"), (
            "tensorflow was imported without TF_USE_LEGACY_KERAS=1; parity "
            "tests need legacy Keras 2 semantics"
        )
    _ensure_pkg("refconfignet", REF_ROOT)
    _ensure_pkg("refconfignet.dnn_models", os.path.join(REF_ROOT, "dnn_models"))
    _ensure_azureml_stub()
    return importlib.import_module("refconfignet." + dotted)


def randomize_tf_weights(model, seed: int) -> None:
    """Give every weight a non-degenerate random value so parity comparisons
    exercise real numerics (default zero-biases / unit-gammas / He-collapsed
    deep activations would make many mismatches invisible)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    new = []
    for w in model.weights:
        shape = tuple(w.shape)
        name = w.name
        if "moving_variance" in name:
            val = rng.uniform(0.5, 1.5, shape)
        elif "gamma" in name:
            val = rng.uniform(0.8, 1.2, shape)
        elif "kernel" in name or name.endswith("W:0"):
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            val = rng.normal(0.0, 1.0 / np.sqrt(max(fan_in, 1)), shape)
        else:  # bias, beta, moving_mean
            val = rng.uniform(-0.2, 0.2, shape)
        new.append(val.astype(np.float32))
    model.set_weights(new)
