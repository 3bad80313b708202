"""Building-block modules.

Parity notes vs the reference (confignet/dnn_models/building_blocks.py):

- Keras ``LeakyReLU()`` defaults to alpha=0.3; the AdaIN MLPs explicitly use
  alpha=0.2 (hologan_generator.py:21) and the projection conv uses
  ``tf.nn.leaky_relu`` whose default is 0.2 (hologan_generator.py:56).
  The ``negative_slope`` arguments below encode those choices explicitly.
- Keras Dense/Conv default to glorot-uniform kernels and zero biases, which
  we replicate so that trained-from-scratch behavior matches.
- ``MLP`` with ``num_layers=N`` means N-1 hidden layers (Dense+LeakyReLU)
  followed by a final Dense (building_blocks.py:152-173).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from confignet_tpu.ops.conv3d import Conv3d
from confignet_tpu.ops.norms import adain_modulate, layer_style, std_instance_norm
from confignet_tpu.ops.upconv import UpConv, resolve_upconv_impl
from confignet_tpu.ops.resample import upsample2d_nearest, upsample3d_nearest

KERNEL_INIT = nn.initializers.glorot_uniform()
BIAS_INIT = nn.initializers.zeros


def leaky_relu(x: jax.Array, negative_slope: float = 0.3) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


class MLP(nn.Module):
    """Generic Dense/LeakyReLU stack (reference ``MLPSimple``)."""

    num_layers: int
    num_hidden: int
    num_out: int
    negative_slope: float = 0.3
    final_activation: Optional[Callable[[jax.Array], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.num_hidden,
                kernel_init=KERNEL_INIT,
                bias_init=BIAS_INIT,
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            x = leaky_relu(x, self.negative_slope)
        x = nn.Dense(
            self.num_out,
            kernel_init=KERNEL_INIT,
            bias_init=BIAS_INIT,
            dtype=self.dtype,
            name=f"dense_{self.num_layers - 1}",
        )(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        return x


class AdaIN(nn.Module):
    """Adaptive instance norm: an MLP maps z to per-channel (scale, bias),
    the input is instance-normalized (no affine) over its spatial axes and
    modulated with ``x * (scale + 1) + bias``
    (reference: building_blocks.py:114-149).
    """

    num_features: int
    mlp_num_units: int
    mlp_num_layers: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        params = MLP(
            num_layers=self.mlp_num_layers,
            num_hidden=self.mlp_num_units,
            num_out=self.num_features * 2,
            negative_slope=0.2,
            dtype=self.dtype,
            name="mlp",
        )(z)
        # Reference reshapes the MLP output to (B, 2, ..., C): scale block
        # first, then bias (building_blocks.py:138-144).
        params = jnp.reshape(params, (x.shape[0], 2, self.num_features))
        scale, bias = params[:, 0], params[:, 1]
        spatial_axes = tuple(range(1, x.ndim - 1))
        return adain_modulate(x, scale, bias, spatial_axes)


class ConvAdaIN(nn.Module):
    """Conv -> LeakyReLU -> AdaIN, rank-generic (2D and 3D).

    Reference: ``Conv2dAdaIn``/``Conv3dAdaIn`` (building_blocks.py:11-80).
    ``double_conv`` inserts a second conv with a LeakyReLU in between, as in
    the reference's optional branch.
    """

    num_feature_maps: int
    kernel_size: int
    rank: int  # 2 or 3
    mlp_num_units: int
    mlp_num_layers: int
    double_conv: bool = False
    conv_negative_slope: float = 0.3
    dtype: Optional[jnp.dtype] = None
    # rank-3 conv lowering strategy (ops/conv3d.py) — parameter layout is
    # identical across impls, so this is a pure compute-graph knob.
    conv3d_impl: str = "auto"
    # Absorb a preceding nearest-2x upsample into this block (the
    # reference always pairs UpSampling with the next ConvAdaIN —
    # hologan_generator.py:139-170).  ``upconv_impl`` picks the lowering
    # (ops/upconv.py): "subpixel" convolves on the SMALL grid with
    # collapsed per-phase kernels (exact rewrite, 1.7-2.4x fewer FLOPs in
    # 3D, no materialised 4x tensor in 2D); "naive" materialises the
    # upsample.  Parameter pytree is identical across both.
    pre_upsample: bool = False
    upconv_impl: str = "auto"

    def _conv(self, name: str):
        ksize = (self.kernel_size,) * self.rank
        if self.rank == 3:
            return Conv3d(
                features=self.num_feature_maps,
                kernel_size=ksize,
                dtype=self.dtype,
                impl=self.conv3d_impl,
                name=name,
            )
        return nn.Conv(
            self.num_feature_maps,
            ksize,
            padding="SAME",
            kernel_init=KERNEL_INIT,
            bias_init=BIAS_INIT,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        if self.pre_upsample:
            if resolve_upconv_impl(self.upconv_impl) == "subpixel":
                x = UpConv(
                    features=self.num_feature_maps,
                    kernel_size=(self.kernel_size,) * self.rank,
                    dtype=self.dtype,
                    impl="subpixel",
                    name="conv_0",
                )(x)
            else:
                up = upsample3d_nearest if self.rank == 3 else upsample2d_nearest
                x = self._conv("conv_0")(up(x))
        else:
            x = self._conv("conv_0")(x)
        if self.double_conv:
            x = leaky_relu(x, self.conv_negative_slope)
            x = self._conv("conv_1")(x)
        x = leaky_relu(x, self.conv_negative_slope)
        x = AdaIN(
            num_features=self.num_feature_maps,
            mlp_num_units=self.mlp_num_units,
            mlp_num_layers=self.mlp_num_layers,
            dtype=self.dtype,
            name="adain",
        )(x, z)
        return x


class DiscrBlock(nn.Module):
    """Stride-2 conv block with optional style statistics output.

    Reference: building_blocks.py:83-111.  Style stats are computed on the
    conv output *before* the LeakyReLU; the block output goes through
    LeakyReLU then the keras-contrib-style instance norm (std + eps).
    """

    num_feature_maps: int
    kernel_size: int
    return_styles: bool = True
    conv_negative_slope: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        x = nn.Conv(
            self.num_feature_maps,
            (self.kernel_size, self.kernel_size),
            strides=(2, 2),
            padding="SAME",
            kernel_init=KERNEL_INIT,
            bias_init=BIAS_INIT,
            dtype=self.dtype,
            name="conv",
        )(x)

        styles = None
        if self.return_styles:
            styles = layer_style(x)

        x = leaky_relu(x, self.conv_negative_slope)
        gamma = self.param("in_gamma", nn.initializers.ones, (self.num_feature_maps,))
        beta = self.param("in_beta", nn.initializers.zeros, (self.num_feature_maps,))
        x = std_instance_norm(x, gamma, beta, spatial_axes=(1, 2))

        if self.return_styles:
            return x, styles
        return x
