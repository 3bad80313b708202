"""Real-image encoder: ResNet50 trunk + rotation and embedding heads.

Reference: confignet/dnn_models/real_encoder.py.  The rotation head is a
Dense(3) with tanh scaled to the configured rotation ranges; the embedding
head is a Dense(latent_dim) over the pooled features.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from confignet_tpu.models.backbones.resnet import ResNet50, resnet50_preprocess
from confignet_tpu.models.blocks import BIAS_INIT


class RealEncoder(nn.Module):
    latent_dim: int
    rotation_ranges: Sequence[Sequence[float]]  # degrees, ((..),(..),(..))
    dtype: Optional[jnp.dtype] = None
    # "frozen" (FrozenBatchNorm, the Keras-import/parity path) or "group"
    # (stateless GroupNorm for FROM-SCRATCH training — see
    # backbones.resnet._resnet_norm).
    trunk_norm: str = "frozen"

    @nn.compact
    def __call__(self, input_img: jax.Array) -> Tuple[jax.Array, jax.Array]:
        features = ResNet50(dtype=self.dtype, norm=self.trunk_norm,
                            name="resnet")(resnet50_preprocess(input_img))

        # Both heads are ZERO-initialized (standard final-layer zero init):
        # fresh encoders then emit the latent-space center + neutral pose, so
        # decode(encode(x)) starts ON-manifold.  With the default dense init
        # and a RANDOM-weight trunk (this rig has no pretrained .h5), the
        # unnormalized ResNet features make initial embeddings enormous and
        # the stage-2 autoencode starts from G-loss ~5e10 off-manifold
        # garbage it may never recover from (round-5 chain,
        # docs/TEST_RUNS.md).  Weight IMPORTS overwrite these params, so
        # reference-release behavior is unaffected.
        raw_rotation = nn.Dense(
            3, kernel_init=nn.initializers.zeros, bias_init=BIAS_INIT,
            dtype=self.dtype, name="rotation_regressor",
        )(features)
        raw_rotation = jnp.tanh(raw_rotation)
        multiplier = np.pi * np.asarray(
            [self.rotation_ranges[0][1], self.rotation_ranges[1][1], self.rotation_ranges[2][1]],
            np.float32,
        ) / 180.0
        scaled_rotation = raw_rotation * jnp.asarray(multiplier)

        embedding = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, bias_init=BIAS_INIT,
            dtype=self.dtype, name="feature_to_latent",
        )(features)
        return embedding, scaled_rotation
