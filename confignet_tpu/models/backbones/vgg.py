"""VGG-16 / VGG-19 feature extractors for perceptual losses.

The reference uses Keras VGG19 (ImageNet) activations at layer indices
[1, 2, 8, 13] and a VGGFace VGG16 at [1, 2, 8, 12]
(reference: confignet/perceptual_loss.py:18-41).  Keras layer indices count
the input layer as 0 and each block's convs then pool sequentially; the
``KERAS_LAYER_NAMES`` tables below reproduce that numbering so tap indices
mean the same thing here.

The module builds only as deep as the deepest requested tap — the perceptual
loss never pays for conv5.
"""
from __future__ import annotations

from typing import List, Tuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from confignet_tpu.models.blocks import BIAS_INIT

# He init: with frozen-stat batch norms, variance must survive ~90 ReLU
# layers at random init (glorot underflows to zero features).
KERNEL_INIT = nn.initializers.he_normal()

# (convs_per_block, channels)
_VGG_CFG = {
    "vgg16": ([2, 2, 3, 3, 3], [64, 128, 256, 512, 512]),
    "vgg19": ([2, 2, 4, 4, 4], [64, 128, 256, 512, 512]),
}


def keras_layer_names(arch: str) -> List[str]:
    """Sequential layer names in Keras order (index 0 is the input)."""
    convs_per_block, _ = _VGG_CFG[arch]
    names = ["input"]
    for block, n_convs in enumerate(convs_per_block, start=1):
        for conv in range(1, n_convs + 1):
            names.append(f"block{block}_conv{conv}")
        names.append(f"block{block}_pool")
    return names


class VGGFeatures(nn.Module):
    """Runs VGG conv layers and returns the activations at ``taps``
    (Keras layer indices, post-ReLU)."""

    arch: str = "vgg19"
    taps: Tuple[int, ...] = (1, 2, 8, 13)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        names = keras_layer_names(self.arch)
        max_tap = max(self.taps)
        convs_per_block, channels = _VGG_CFG[self.arch]

        outputs = {}
        layer_idx = 0
        for block, (n_convs, ch) in enumerate(zip(convs_per_block, channels), start=1):
            for conv in range(1, n_convs + 1):
                layer_idx += 1
                if layer_idx > max_tap:
                    break
                x = nn.Conv(
                    ch, (3, 3), padding="SAME",
                    kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
                    dtype=self.dtype, name=f"block{block}_conv{conv}",
                )(x)
                x = jax.nn.relu(x)
                outputs[layer_idx] = x
            layer_idx += 1  # pool layer index
            if layer_idx > max_tap:
                break
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            outputs[layer_idx] = x

        return [outputs[t] for t in self.taps]


def vgg19_preprocess(images: jax.Array) -> jax.Array:
    """[-1,1] images -> Keras VGG19 'caffe' preprocessing: scale to [0,255],
    reverse channels, subtract BGR ImageNet means
    (reference: perceptual_loss.py:52-61)."""
    x = (images + 1.0) * 127.5
    x = x[..., ::-1]
    mean = jnp.asarray([103.939, 116.779, 123.68], dtype=x.dtype)
    return x - mean


def vggface_preprocess(images: jax.Array) -> jax.Array:
    """[-1,1] images -> VGGFace preprocessing: scale to [0,255] and subtract
    the VGGFace per-channel means, NO channel flip
    (reference: perceptual_loss.py:52-57)."""
    x = (images + 1.0) * 127.5
    mean = jnp.asarray([93.5940, 104.7624, 129.1863], dtype=x.dtype)
    return x - mean
