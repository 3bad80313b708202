"""Multi-scale style discriminator and latent regressor.

Reference: confignet/dnn_models/hologan_discriminator.py.

``HologanDiscriminator`` stacks ``num_resample`` stride-2 DiscrBlocks with
channel growth ``expansion * 2^i`` capped at ``max_feature_maps``.  At each
scale a Dense(1) "style classifier" scores the concat(mean, std) channel
statistics; the trunk output is flattened into a final Dense(1) real/fake
score.  The call returns a dict of ``num_resample + 1`` logits in a fixed
order (5 style heads + final for the default config), which the losses
iterate over (reference: hologan_discriminator.py:48-64).

``HologanLatentRegressor`` is the same trunk without style heads, ending in a
Dense(latent_dim + 3) regressing the latent and rotation from an image
(reference: hologan_discriminator.py:66-112).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from confignet_tpu.models.blocks import BIAS_INIT, KERNEL_INIT, DiscrBlock


def _block_features(i: int, expansion: int, max_features: int) -> int:
    return min((2 ** i) * expansion, max_features)


class HologanDiscriminator(nn.Module):
    img_shape: Sequence[int]  # (H, W)
    num_resample: int = 5
    disc_kernel_size: int = 3
    disc_expansion_factor: int = 48
    disc_max_feature_maps: int = 512
    initial_from_rgb_layer_in_discr: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_img: jax.Array) -> Dict[str, jax.Array]:
        x = input_img
        if self.initial_from_rgb_layer_in_discr:
            x = nn.Conv(
                3, (1, 1), padding="SAME",
                kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
                dtype=self.dtype, name="from_rgb",
            )(x)

        outputs: Dict[str, jax.Array] = {}
        for i in range(self.num_resample):
            features = _block_features(i, self.disc_expansion_factor, self.disc_max_feature_maps)
            x, styles = DiscrBlock(
                num_feature_maps=features,
                kernel_size=self.disc_kernel_size,
                return_styles=True,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
            style_logit = nn.Dense(
                1, kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
                dtype=self.dtype, name=f"style_classifier_{i}",
            )(styles)
            outputs[f"discr_style_{i}"] = style_logit

        x = jnp.reshape(x, (x.shape[0], -1))
        outputs["discr_final"] = nn.Dense(
            1, kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
            dtype=self.dtype, name="disc_map",
        )(x)
        return outputs


class HologanLatentRegressor(nn.Module):
    latent_dim: int
    img_shape: Sequence[int]
    num_resample: int = 5
    disc_kernel_size: int = 3
    disc_expansion_factor: int = 48
    disc_max_feature_maps: int = 512
    initial_from_rgb_layer_in_discr: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_img: jax.Array) -> jax.Array:
        x = input_img
        if self.initial_from_rgb_layer_in_discr:
            x = nn.Conv(
                3, (1, 1), padding="SAME",
                kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
                dtype=self.dtype, name="from_rgb",
            )(x)

        for i in range(self.num_resample):
            features = _block_features(i, self.disc_expansion_factor, self.disc_max_feature_maps)
            x = DiscrBlock(
                num_feature_maps=features,
                kernel_size=self.disc_kernel_size,
                return_styles=False,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)

        x = jnp.reshape(x, (x.shape[0], -1))
        return nn.Dense(
            self.latent_dim + 3, kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
            dtype=self.dtype, name="latent_predictor",
        )(x)
