"""ResNet50 backbone (Keras-v1 layout) for the real-image encoder.

Reference use: confignet/dnn_models/real_encoder.py:13 constructs Keras
``ResNet50(include_top=False, pooling="avg")``.  Architecture notes for
weight compatibility with the Keras implementation:

- stem: 7x7/2 conv (64) -> BN -> ReLU -> 3x3/2 max pool;
- 4 stages of bottleneck blocks [3, 4, 6, 3], base widths (64, 128, 256,
  512), expansion 4; the FIRST block of each stage has a projection
  shortcut, stages 2-4 downsample with stride 2 in the block's first conv
  (Keras v1 convention);
- batch norm runs in inference mode (scale/offset trainable, moving stats
  frozen) — matching how the reference's encoder behaves when called inside
  its training loop.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from confignet_tpu.models.blocks import BIAS_INIT

# He init: with frozen-stat batch norms, variance must survive ~90 ReLU
# layers at random init (glorot underflows to zero features).
KERNEL_INIT = nn.initializers.he_normal()


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm: y = scale * (x - mean) / sqrt(var + eps) + bias.
    ``mean``/``var`` are parameters so they checkpoint/restore with the rest,
    but receive no gradient in practice (they only enter linearly and are
    never updated by any optimizer we build for them)."""

    features: int
    eps: float = 1.001e-5  # Keras ResNet epsilon

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("gamma", nn.initializers.ones, (self.features,))
        bias = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = self.param("moving_mean", nn.initializers.zeros, (self.features,))
        var = self.param("moving_variance", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _resnet_norm(norm: str, features: int, name: str):
    """"frozen" = FrozenBatchNorm (imported Keras inference stats, the
    parity/import path).  "group" = GroupNorm — STATELESS, so it slots into
    the fused multi-player GAN step with no mutable batch_stats threading,
    and gives a from-scratch trunk real normalization (a random-init
    FrozenBN trunk barely trains: the round-5 judge/encoder pathology,
    docs/TEST_RUNS.md)."""
    if norm == "group":
        return nn.GroupNorm(num_groups=min(32, features), name=name)
    return FrozenBatchNorm(features, name=name)


class BottleneckBlock(nn.Module):
    width: int
    stride: int = 1
    project_shortcut: bool = False
    dtype: Optional[jnp.dtype] = None
    norm: str = "frozen"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        if self.project_shortcut:
            shortcut = nn.Conv(
                self.width * 4, (1, 1), strides=(self.stride, self.stride),
                kernel_init=KERNEL_INIT, bias_init=BIAS_INIT, dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = _resnet_norm(self.norm, self.width * 4, "shortcut_bn")(shortcut)

        y = nn.Conv(
            self.width, (1, 1), strides=(self.stride, self.stride),
            kernel_init=KERNEL_INIT, bias_init=BIAS_INIT, dtype=self.dtype, name="conv1",
        )(x)
        y = _resnet_norm(self.norm, self.width, "bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3), padding="SAME",
            kernel_init=KERNEL_INIT, bias_init=BIAS_INIT, dtype=self.dtype, name="conv2",
        )(y)
        y = _resnet_norm(self.norm, self.width, "bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.width * 4, (1, 1),
            kernel_init=KERNEL_INIT, bias_init=BIAS_INIT, dtype=self.dtype, name="conv3",
        )(y)
        y = _resnet_norm(self.norm, self.width * 4, "bn3")(y)
        return jax.nn.relu(y + shortcut)


class ResNet50(nn.Module):
    """Returns globally average-pooled 2048-dim features."""

    dtype: Optional[jnp.dtype] = None
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_widths: Sequence[int] = (64, 128, 256, 512)
    norm: str = "frozen"  # see _resnet_norm

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding="VALID",
            kernel_init=KERNEL_INIT, bias_init=BIAS_INIT, dtype=self.dtype, name="stem_conv",
        )(x)
        x = _resnet_norm(self.norm, 64, "stem_bn")(x)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.stage_widths)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BottleneckBlock(
                    width=width,
                    stride=stride,
                    project_shortcut=(block == 0),
                    dtype=self.dtype,
                    norm=self.norm,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x)

        return jnp.mean(x, axis=(1, 2))


def resnet50_preprocess(images_unit_range: jax.Array) -> jax.Array:
    """[-1,1] -> Keras ResNet50 'caffe' preprocessing
    (reference: real_encoder.py:24-25): scale to [0,255], reverse channels,
    subtract BGR ImageNet means."""
    x = (images_unit_range + 1.0) * 127.5
    x = x[..., ::-1]
    mean = jnp.asarray([103.939, 116.779, 123.68], dtype=x.dtype)
    return x - mean


def resnet50_keras_name_map(legacy: bool = False):
    """keras layer name -> (our module path, "conv"|"bn").

    Two generations of Keras ResNet50 naming exist: the current
    ``conv2_block1_1_conv`` scheme (keras.applications.resnet, 2.2.4+) and
    the legacy ``res2a_branch2a`` / ``bn2a_branch2a`` scheme of the original
    resnet50 module.  Both describe the identical graph, so both map onto
    our ``stage{s}_block{b}`` modules.
    """
    mapping = {}
    if legacy:
        mapping["conv1"] = ("stem_conv", "conv")
        mapping["bn_conv1"] = ("stem_bn", "bn")
    else:
        mapping["conv1_conv"] = ("stem_conv", "conv")
        mapping["conv1_bn"] = ("stem_bn", "bn")

    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for block in range(1, n_blocks + 1):
            ours = f"stage{stage + 1}_block{block}"
            if legacy:
                letter = chr(ord("a") + block - 1)
                base = f"{stage + 2}{letter}"
                branches = [("branch1", "shortcut"), ("branch2a", "1"),
                            ("branch2b", "2"), ("branch2c", "3")]
                for branch, which in branches:
                    if which == "shortcut" and block != 1:
                        continue
                    conv_path = (f"{ours}/shortcut_conv" if which == "shortcut"
                                 else f"{ours}/conv{which}")
                    bn_path = (f"{ours}/shortcut_bn" if which == "shortcut"
                               else f"{ours}/bn{which}")
                    mapping[f"res{base}_{branch}"] = (conv_path, "conv")
                    mapping[f"bn{base}_{branch}"] = (bn_path, "bn")
            else:
                base = f"conv{stage + 2}_block{block}"
                for idx, which in ((0, "shortcut"), (1, "1"), (2, "2"), (3, "3")):
                    if which == "shortcut" and block != 1:
                        continue
                    conv_path = (f"{ours}/shortcut_conv" if which == "shortcut"
                                 else f"{ours}/conv{which}")
                    bn_path = (f"{ours}/shortcut_bn" if which == "shortcut"
                               else f"{ours}/bn{which}")
                    mapping[f"{base}_{idx}_conv"] = (conv_path, "conv")
                    mapping[f"{base}_{idx}_bn"] = (bn_path, "bn")
    return mapping
