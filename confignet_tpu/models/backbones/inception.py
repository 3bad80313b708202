"""InceptionV3 feature extractor for FID/KID.

Reference use: confignet/metrics/inception_distance.py:9-27 builds Keras
``InceptionV3(include_top=False, pooling="avg")`` and extracts 2048-dim
pooled features in 1000-image chunks.

This is the standard InceptionV3 graph (Szegedy et al. 2015, as in Keras):
stem -> 3x block35-style "mixed" modules (5b-5d) -> grid reduction (6a) ->
4x 17x17 modules (6b-6e) -> reduction (7a) -> 2x 8x8 modules (7b-7c) ->
global average pool.  All convs are BN(scale=False)+ReLU as in Keras.
Weights initialize deterministically; supply the Keras ``.h5`` via
``backbones.loader`` for ImageNet behavior.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# He init: with frozen-stat batch norms, variance must survive ~90 ReLU
# layers at random init (glorot underflows to zero features).
KERNEL_INIT = nn.initializers.he_normal()
from confignet_tpu.models.backbones.resnet import FrozenBatchNorm


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, kernel_init=KERNEL_INIT, dtype=self.dtype, name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool_same(x):
    # count_include_pad=False: TF/Keras AveragePooling2D divides by the
    # number of VALID (non-padded) cells at borders; flax defaults to the
    # full window size.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=False)


class InceptionV3(nn.Module):
    """Returns globally average-pooled 2048-dim features."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cb = lambda f, k, s=(1, 1), p="SAME", n=None: ConvBN(
            f, k, s, p, dtype=self.dtype, name=n
        )

        # Stem
        x = cb(32, (3, 3), (2, 2), "VALID", "stem_1")(x)
        x = cb(32, (3, 3), (1, 1), "VALID", "stem_2")(x)
        x = cb(64, (3, 3), n="stem_3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = cb(80, (1, 1), (1, 1), "VALID", "stem_4")(x)
        x = cb(192, (3, 3), (1, 1), "VALID", "stem_5")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        # Mixed 5b, 5c, 5d (35x35)
        for i, pool_features in enumerate([32, 64, 64]):
            name = f"mixed5{'bcd'[i]}"
            b1 = cb(64, (1, 1), n=f"{name}_1x1")(x)
            b2 = cb(48, (1, 1), n=f"{name}_5x5_1")(x)
            b2 = cb(64, (5, 5), n=f"{name}_5x5_2")(b2)
            b3 = cb(64, (1, 1), n=f"{name}_3x3dbl_1")(x)
            b3 = cb(96, (3, 3), n=f"{name}_3x3dbl_2")(b3)
            b3 = cb(96, (3, 3), n=f"{name}_3x3dbl_3")(b3)
            b4 = cb(pool_features, (1, 1), n=f"{name}_pool")(_avg_pool_same(x))
            x = jnp.concatenate([b1, b2, b3, b4], axis=-1)

        # Mixed 6a (reduction to 17x17)
        b1 = cb(384, (3, 3), (2, 2), "VALID", "mixed6a_3x3")(x)
        b2 = cb(64, (1, 1), n="mixed6a_3x3dbl_1")(x)
        b2 = cb(96, (3, 3), n="mixed6a_3x3dbl_2")(b2)
        b2 = cb(96, (3, 3), (2, 2), "VALID", "mixed6a_3x3dbl_3")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b1, b2, b3], axis=-1)

        # Mixed 6b-6e (17x17, factorized 7x7)
        for i, c7 in enumerate([128, 160, 160, 192]):
            name = f"mixed6{'bcde'[i]}"
            b1 = cb(192, (1, 1), n=f"{name}_1x1")(x)
            b2 = cb(c7, (1, 1), n=f"{name}_7x7_1")(x)
            b2 = cb(c7, (1, 7), n=f"{name}_7x7_2")(b2)
            b2 = cb(192, (7, 1), n=f"{name}_7x7_3")(b2)
            b3 = cb(c7, (1, 1), n=f"{name}_7x7dbl_1")(x)
            b3 = cb(c7, (7, 1), n=f"{name}_7x7dbl_2")(b3)
            b3 = cb(c7, (1, 7), n=f"{name}_7x7dbl_3")(b3)
            b3 = cb(c7, (7, 1), n=f"{name}_7x7dbl_4")(b3)
            b3 = cb(192, (1, 7), n=f"{name}_7x7dbl_5")(b3)
            b4 = cb(192, (1, 1), n=f"{name}_pool")(_avg_pool_same(x))
            x = jnp.concatenate([b1, b2, b3, b4], axis=-1)

        # Mixed 7a (reduction to 8x8)
        b1 = cb(192, (1, 1), n="mixed7a_3x3_1")(x)
        b1 = cb(320, (3, 3), (2, 2), "VALID", "mixed7a_3x3_2")(b1)
        b2 = cb(192, (1, 1), n="mixed7a_7x7x3_1")(x)
        b2 = cb(192, (1, 7), n="mixed7a_7x7x3_2")(b2)
        b2 = cb(192, (7, 1), n="mixed7a_7x7x3_3")(b2)
        b2 = cb(192, (3, 3), (2, 2), "VALID", "mixed7a_7x7x3_4")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b1, b2, b3], axis=-1)

        # Mixed 7b, 7c (8x8 with split branches)
        for i in range(2):
            name = f"mixed7{'bc'[i]}"
            b1 = cb(320, (1, 1), n=f"{name}_1x1")(x)
            b2 = cb(384, (1, 1), n=f"{name}_3x3_1")(x)
            b2a = cb(384, (1, 3), n=f"{name}_3x3_2a")(b2)
            b2b = cb(384, (3, 1), n=f"{name}_3x3_2b")(b2)
            b2 = jnp.concatenate([b2a, b2b], axis=-1)
            b3 = cb(448, (1, 1), n=f"{name}_3x3dbl_1")(x)
            b3 = cb(384, (3, 3), n=f"{name}_3x3dbl_2")(b3)
            b3a = cb(384, (1, 3), n=f"{name}_3x3dbl_3a")(b3)
            b3b = cb(384, (3, 1), n=f"{name}_3x3dbl_3b")(b3)
            b3 = jnp.concatenate([b3a, b3b], axis=-1)
            b4 = cb(192, (1, 1), n=f"{name}_pool")(_avg_pool_same(x))
            x = jnp.concatenate([b1, b2, b3, b4], axis=-1)

        return jnp.mean(x, axis=(1, 2))


def inception_preprocess(images_uint8_or_float: jax.Array) -> jax.Array:
    """Keras 'tf' mode: [0,255] -> [-1,1], no channel flip
    (reference: inception_distance.py:24)."""
    return images_uint8_or_float.astype(jnp.float32) / 127.5 - 1.0


def inception_conv_bn_order():
    """Our ConvBN module names in the creation order of the Keras
    InceptionV3 graph (keras.applications.inception_v3 builds the same 94
    conv2d_bn calls in this sequence) — used by the ordered h5 loader."""
    names = [f"stem_{i}" for i in range(1, 6)]
    for b in "bcd":
        names += [f"mixed5{b}_{s}" for s in
                  ("1x1", "5x5_1", "5x5_2", "3x3dbl_1", "3x3dbl_2", "3x3dbl_3", "pool")]
    names += ["mixed6a_3x3", "mixed6a_3x3dbl_1", "mixed6a_3x3dbl_2", "mixed6a_3x3dbl_3"]
    for b in "bcde":
        names += [f"mixed6{b}_{s}" for s in
                  ("1x1", "7x7_1", "7x7_2", "7x7_3",
                   "7x7dbl_1", "7x7dbl_2", "7x7dbl_3", "7x7dbl_4", "7x7dbl_5", "pool")]
    names += [f"mixed7a_{s}" for s in
              ("3x3_1", "3x3_2", "7x7x3_1", "7x7x3_2", "7x7x3_3", "7x7x3_4")]
    for b in "bc":
        names += [f"mixed7{b}_{s}" for s in
                  ("1x1", "3x3_1", "3x3_2a", "3x3_2b",
                   "3x3dbl_1", "3x3dbl_2", "3x3dbl_3a", "3x3dbl_3b", "pool")]
    assert len(names) == 94
    return names
