"""Perceptual losses on VGG activations.

Reference: confignet/perceptual_loss.py.  Two modes:

- ``"imagenet"``: VGG19 activations at Keras layer indices [1, 2, 8, 13]
  with caffe-style preprocessing.
- ``"VGGFace"``: VGG16 (keras-vggface weights when supplied) at indices
  [1, 2, 8, 12] with VGGFace mean subtraction.

The loss is the sum over taps of the MSE between the *whole-batch flattened*
activations (reference: perceptual_loss.py:63-82) — i.e. a plain mean over
every activation element, summed across taps.

Weights: initialized deterministically (no egress in the build environment);
call :meth:`PerceptualLoss.load_keras_weights` with the standard ``.h5`` file
to get the pretrained behavior.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from confignet_tpu.models.backbones.vgg import (
    VGGFeatures,
    vgg19_preprocess,
    vggface_preprocess,
)

_MODE_SETTINGS = {
    "imagenet": dict(arch="vgg19", taps=(1, 2, 8, 13), seed=1901),
    "VGGFace": dict(arch="vgg16", taps=(1, 2, 8, 12), seed=1602),
}


class PerceptualLoss:
    """Stateful convenience wrapper bundling the VGG module + params.

    The heavy lifting is the pure :meth:`loss_fn`, which is safe to call
    inside jitted train steps with the params passed explicitly.
    """

    def __init__(self, input_shape: Tuple[int, int, int], model_type: str = "imagenet",
                 dtype: Optional[jnp.dtype] = None, taps: Optional[Tuple[int, ...]] = None):
        if model_type not in _MODE_SETTINGS:
            raise ValueError(f"unknown perceptual loss mode {model_type!r}")
        self.model_type = model_type
        self.input_shape = tuple(input_shape)
        settings = _MODE_SETTINGS[model_type]
        taps = tuple(taps) if taps is not None else settings["taps"]
        self.module = VGGFeatures(arch=settings["arch"], taps=taps, dtype=dtype)
        dummy = jnp.zeros((1,) + self.input_shape, dtype=jnp.float32)
        from confignet_tpu.core.init_cache import cached_init

        self.variables = cached_init(
            self.module, jax.random.PRNGKey(settings["seed"]), dummy
        )

    def load_keras_weights(self, h5_path: str) -> None:
        from confignet_tpu.models.backbones.loader import load_keras_h5_weights

        new_params = load_keras_h5_weights(dict(self.variables["params"]), h5_path)
        self.variables = {"params": new_params}

    def _preprocess(self, images: jax.Array) -> jax.Array:
        if self.model_type == "VGGFace":
            return vggface_preprocess(images)
        return vgg19_preprocess(images)

    def activations(self, params, images: jax.Array) -> List[jax.Array]:
        return self.module.apply({"params": params}, self._preprocess(images))

    def loss_fn(self, params, predicted: jax.Array, data: jax.Array) -> jax.Array:
        """Pure function suitable for use inside jit; ``params`` is the VGG
        param pytree."""
        if predicted.ndim == 3:
            predicted = predicted[None]
        if data.ndim == 3:
            data = data[None]
        acts_pred = self.activations(params, predicted)
        acts_data = self.activations(params, data)
        total = 0.0
        for a_p, a_d in zip(acts_pred, acts_data):
            total = total + jnp.mean(jnp.square(a_p.reshape(-1) - a_d.reshape(-1)))
        return total

    def loss(self, predicted: jax.Array, data: jax.Array) -> jax.Array:
        return self.loss_fn(self.variables["params"], predicted, data)
