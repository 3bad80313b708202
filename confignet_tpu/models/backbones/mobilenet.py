"""MobileNetV2 backbone for the CelebA attribute classifier.

Reference use: confignet/metrics/celeba_attribute_prediction.py:56 builds
Keras ``MobileNetV2(include_top=False)``.  Standard inverted-residual
architecture (Sandler et al. 2018): stem 3x3/2 conv(32), bottleneck stages
(expansion, out_channels, repeats, stride) = (1,16,1,1), (6,24,2,2),
(6,32,3,2), (6,64,4,2), (6,96,3,1), (6,160,3,2), (6,320,1,1), final 1x1
conv(1280).  BN(frozen stats) + ReLU6 as in Keras inference behavior.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# He init: with frozen-stat batch norms, variance must survive ~90 ReLU
# layers at random init (glorot underflows to zero features).
KERNEL_INIT = nn.initializers.he_normal()
from confignet_tpu.models.backbones.resnet import FrozenBatchNorm

_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _make_norm(trainable_bn: bool, features: int, train: bool, name: str):
    """FrozenBatchNorm (imported Keras inference stats — the parity path)
    or a live nn.BatchNorm for FROM-SCRATCH training: without real batch
    statistics the trunk is 50+ unnormalized conv layers, which trains to
    little more than the label priors (docs/evidence_judge_diagnosis.json,
    round 5)."""
    if trainable_bn:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-3, name=name)
    bn = FrozenBatchNorm(features, eps=1e-3, name=name)
    return lambda x: bn(x)


class InvertedResidual(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    expansion: int
    dtype: Optional[jnp.dtype] = None
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda feats, name: _make_norm(self.trainable_bn, feats, train, name)
        hidden = self.in_channels * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                        dtype=self.dtype, name="expand")(y)
            y = norm(hidden, "expand_bn")(y)
            y = relu6(y)
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=hidden, use_bias=False, kernel_init=KERNEL_INIT,
            dtype=self.dtype, name="depthwise",
        )(y)
        y = norm(hidden, "depthwise_bn")(y)
        y = relu6(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                    dtype=self.dtype, name="project")(y)
        y = norm(self.out_channels, "project_bn")(y)
        if self.stride == 1 and self.in_channels == self.out_channels:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """Returns the final (B, H/32, W/32, 1280) feature map."""

    dtype: Optional[jnp.dtype] = None
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda feats, name: _make_norm(self.trainable_bn, feats, train, name)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    kernel_init=KERNEL_INIT, dtype=self.dtype, name="stem")(x)
        x = norm(32, "stem_bn")(x)
        x = relu6(x)

        in_ch = 32
        for stage_idx, (expansion, out_ch, repeats, stride) in enumerate(_STAGES):
            for block_idx in range(repeats):
                x = InvertedResidual(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    stride=stride if block_idx == 0 else 1,
                    expansion=expansion,
                    dtype=self.dtype,
                    trainable_bn=self.trainable_bn,
                    name=f"stage{stage_idx}_block{block_idx}",
                )(x, train=train)
                in_ch = out_ch

        x = nn.Conv(1280, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                    dtype=self.dtype, name="head")(x)
        x = norm(1280, "head_bn")(x)
        return relu6(x)


def mobilenet_preprocess(images_0_255: jax.Array) -> jax.Array:
    """Keras 'tf' mode: [0,255] -> [-1,1]
    (reference: celeba_attribute_prediction.py:103,139)."""
    return images_0_255.astype(jnp.float32) / 127.5 - 1.0


def mobilenet_conv_bn_order():
    """Conv/BN module paths in Keras MobileNetV2 creation order (stem, then
    expand/depthwise/project per inverted-residual block — block 0 has no
    expand — then the 1280 head conv) for the ordered h5 loader.  Returns
    (conv_paths, bn_paths)."""
    conv_paths, bn_paths = ["stem"], ["stem_bn"]
    block_names = []
    for stage_idx, (expansion, _, repeats, _) in enumerate(_STAGES):
        for block_idx in range(repeats):
            block_names.append((f"stage{stage_idx}_block{block_idx}", expansion))
    for name, expansion in block_names:
        if expansion != 1:
            conv_paths.append(f"{name}/expand")
            bn_paths.append(f"{name}/expand_bn")
        conv_paths.append(f"{name}/depthwise")
        bn_paths.append(f"{name}/depthwise_bn")
        conv_paths.append(f"{name}/project")
        bn_paths.append(f"{name}/project_bn")
    conv_paths.append("head")
    bn_paths.append("head_bn")
    assert len(conv_paths) == 52 and len(bn_paths) == 52
    return conv_paths, bn_paths
