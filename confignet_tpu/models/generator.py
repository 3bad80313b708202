"""HoloGAN-style volumetric generator.

Architecture (reference: confignet/dnn_models/hologan_generator.py):

1. A learned constant (4, 4, 4, 512) input.  The reference produces it with a
   Dense layer (zero kernel, ones bias) applied to a zeros vector
   (hologan_generator.py:23-27,133-136); the kernel provably receives zero
   gradient forever, so here it is a plain learned parameter initialized to
   ones — mathematically identical, one fewer dead matmul.
2. Nearest 2x 3D upsample, two Conv3D+AdaIN blocks (256 -> 128 channels) with
   an upsample in between -> a (16, 16, 16, 128) feature volume.
3. The volume is rotated by per-sample Euler angles via trilinear resampling.
4. "Rendering": two plain Conv3D(64)+LeakyReLU layers, a depth-collapse
   reshape to (16, 16, 16*64), a 1x1 Conv2D projection to 512 channels with
   leaky_relu(0.2) (hologan_generator.py:49-56,151-157).
5. A 2D Conv+AdaIN/upsample chain 256 -> 64 -> 32 channels (to 128 px), plus
   one extra 32-channel block for >128 px and a 16-channel block for >256 px
   (hologan_generator.py:83-99,159-170).
6. Final Conv2D(3, 4x4) with tanh.

The latent can be a single vector (used for every AdaIN) or a 5-way list
feeding [z_3d_0, z_3d_1, z_2d_0, z_2d_1, z_2d_2]
(hologan_generator.py:109-127).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from confignet_tpu.core.transforms import (
    euler_angles_to_matrix,
    rotate_3d_grid,
    rotate_3d_grid_matmul,
)
from confignet_tpu.models.blocks import KERNEL_INIT, BIAS_INIT, ConvAdaIN, leaky_relu
from confignet_tpu.ops.conv3d import Conv3d
from confignet_tpu.ops.resample import upsample2d_nearest
from confignet_tpu.ops.upconv import UpConv, resolve_upconv_impl


def _resolve_rotation_impl(name: str):
    """Pick the rotation-resample implementation.

    - "pallas": fused VMEM kernel (TPU only, forward-only) — ~7x the gather form.
    - "pallas_fused": pallas fwd + custom-VJP bwd (grad w.r.t. features via a
      transpose kernel; grad w.r.t. rotation defined ZERO — training only).
    - "gather": XLA take_along_axis (any backend; fully differentiable).
    - "matmul": XLA one-hot matmul (any backend).
    - "auto":        pallas on TPU, gather elsewhere (inference paths).
    - "auto_train":  pallas_fused on TPU, gather elsewhere (train steps whose
      rotations are data, never optimized).
    """
    if name == "auto":
        import jax as _jax

        name = "pallas" if _jax.default_backend() == "tpu" else "gather"
    if name == "auto_train":
        import jax as _jax

        name = "pallas_fused" if _jax.default_backend() == "tpu" else "gather"
    if name == "pallas":
        from confignet_tpu.ops.rotate_pallas import rotate_3d_grid_pallas

        return rotate_3d_grid_pallas
    if name == "pallas_fused":
        from confignet_tpu.ops.rotate_pallas import rotate_3d_grid_fused

        return rotate_3d_grid_fused
    if name == "matmul":
        return rotate_3d_grid_matmul
    if name == "gather":
        return rotate_3d_grid
    raise ValueError(f"unknown rotation_resample implementation {name!r}")

LatentInput = Union[jax.Array, Sequence[jax.Array], Dict[str, jax.Array]]

_Z_KEYS = ("z_3d_0", "z_3d_1", "z_2d_0", "z_2d_1", "z_2d_2")


def build_input_dict(latent_vector, rotation) -> Dict[str, jax.Array]:
    """Map a single latent (or 5-way latent list) + rotation to per-block
    inputs (reference: hologan_generator.py:109-127)."""
    input_dict = {}
    if isinstance(latent_vector, (list, tuple)):
        for key, z in zip(_Z_KEYS, latent_vector):
            input_dict[key] = z
    else:
        for key in _Z_KEYS:
            input_dict[key] = latent_vector
    input_dict["rotation"] = rotation
    return input_dict


class HologanGenerator(nn.Module):
    latent_dim: int
    output_shape: Sequence[int]  # (H, W)
    n_adain_mlp_units: int = 128
    n_adain_mlp_layers: int = 2
    gen_output_activation: str = "tanh"
    const_shape: Sequence[int] = (4, 4, 4, 512)
    n_features_first: int = 256
    dtype: Optional[jnp.dtype] = None
    rotation_resample: str = "auto"
    # 3x3x3 conv lowering (ops/conv3d.py): "xla" (native conv3d) or
    # "zdecomp" (depth-tap 2D decomposition, exact same math and parameter
    # layout); "auto" resolves to the measured-best per backend.
    conv3d_impl: str = "auto"
    # Lowering for every upsample->conv pair (ops/upconv.py): "subpixel"
    # folds the nearest-2x upsample into the conv (exact rewrite, same
    # parameter pytree) or "naive" materialises it; "auto" resolves to the
    # measured-best.
    upconv_impl: str = "auto"

    def _conv_adain_3d(
        self, features: int, name: str, pre_upsample: bool = False
    ) -> ConvAdaIN:
        return ConvAdaIN(
            num_feature_maps=features,
            kernel_size=3,
            rank=3,
            mlp_num_units=self.n_adain_mlp_units,
            mlp_num_layers=self.n_adain_mlp_layers,
            dtype=self.dtype,
            conv3d_impl=self.conv3d_impl,
            pre_upsample=pre_upsample,
            upconv_impl=self.upconv_impl,
            name=name,
        )

    def _conv_adain_2d(
        self, features: int, name: str, pre_upsample: bool = False
    ) -> ConvAdaIN:
        return ConvAdaIN(
            num_feature_maps=features,
            kernel_size=4,
            rank=2,
            mlp_num_units=self.n_adain_mlp_units,
            mlp_num_layers=self.n_adain_mlp_layers,
            dtype=self.dtype,
            pre_upsample=pre_upsample,
            upconv_impl=self.upconv_impl,
            name=name,
        )

    @nn.compact
    def __call__(self, inputs: LatentInput, rotation: Optional[jax.Array] = None) -> jax.Array:
        if tuple(self.output_shape[:2]) not in ((128, 128), (256, 256), (512, 512)):
            # The fixed upsample chain (16px base, 3 doublings + the two
            # gated extra blocks) can only hit these square sizes; anything
            # else would silently render at the next size up and fail deep
            # inside the discriminator with a shape error.
            raise ValueError(
                f"output_shape {tuple(self.output_shape)} unsupported: the "
                "generator renders square 128/256/512 images (reference "
                "supports 256/512; 128 is the tiny test size)"
            )
        if isinstance(inputs, dict):
            input_dict = inputs
        else:
            if rotation is None:
                # A (latent, rotation) pair packed in one argument.
                latent_vector, rotation = inputs[0], inputs[1]
            else:
                latent_vector = inputs
            input_dict = build_input_dict(latent_vector, rotation)

        batch = input_dict["z_3d_0"].shape[0]
        nf = self.n_features_first

        const = self.param(
            "learned_input",
            nn.initializers.ones,
            (int(np.prod(self.const_shape)),),
        )
        x = jnp.broadcast_to(const, (batch,) + tuple([int(np.prod(self.const_shape))]))
        x = jnp.reshape(x, (batch,) + tuple(self.const_shape))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = self._conv_adain_3d(nf, "map_3d_0", pre_upsample=True)(
            x, input_dict["z_3d_0"]
        )
        x = self._conv_adain_3d(nf // 2, "map_3d_1", pre_upsample=True)(
            x, input_dict["z_3d_1"]
        )

        # Rotate the feature volume in 3D.  In float32 mode the resample runs
        # in float32 for parity with the reference's explicit cast
        # (confignet_utils.py:75-76); in bfloat16 mode it stays bf16 (halves
        # the kernel's VMEM traffic — coordinates are always computed at full
        # precision inside the resample regardless).
        transforms = euler_angles_to_matrix(input_dict["rotation"])
        rotate = _resolve_rotation_impl(self.rotation_resample)
        if self.dtype is None:
            x = rotate(x.astype(jnp.float32), transforms)
        else:
            x = rotate(x.astype(self.dtype), transforms)

        # 'Rendering' layers.
        for i in range(2):
            x = Conv3d(
                features=nf // 4,
                kernel_size=(3, 3, 3),
                dtype=self.dtype,
                impl=self.conv3d_impl,
                name=f"map_3d_post_{i}",
            )(x)
            x = leaky_relu(x, 0.3)

        b, d, h, w, c = x.shape
        x = jnp.reshape(x, (b, d, h, w * c))

        x = nn.Conv(
            512,
            (1, 1),
            padding="SAME",
            kernel_init=KERNEL_INIT,
            bias_init=BIAS_INIT,
            dtype=self.dtype,
            name="projection_conv",
        )(x)
        x = leaky_relu(x, 0.2)  # tf.nn.leaky_relu default

        x = self._conv_adain_2d(nf, "map_2d_0")(x, input_dict["z_2d_0"])
        x = self._conv_adain_2d(nf // 4, "map_2d_1", pre_upsample=True)(
            x, input_dict["z_2d_1"]
        )
        x = self._conv_adain_2d(nf // 8, "map_2d_2", pre_upsample=True)(
            x, input_dict["z_2d_2"]
        )
        if self.output_shape[0] > 128:
            x = self._conv_adain_2d(nf // 8, "map_2d_2b", pre_upsample=True)(
                x, input_dict["z_2d_2"]
            )
        if self.output_shape[0] > 256:
            x = self._conv_adain_2d(nf // 16, "map_2d_2c", pre_upsample=True)(
                x, input_dict["z_2d_2"]
            )

        if resolve_upconv_impl(self.upconv_impl) == "subpixel":
            x = UpConv(
                features=3, kernel_size=(4, 4), dtype=self.dtype,
                impl="subpixel", name="map_final",
            )(x)
        else:
            x = nn.Conv(
                3,
                (4, 4),
                padding="SAME",
                kernel_init=KERNEL_INIT,
                bias_init=BIAS_INIT,
                dtype=self.dtype,
                name="map_final",
            )(upsample2d_nearest(x))
        if self.gen_output_activation == "tanh":
            x = jnp.tanh(x)
        elif self.gen_output_activation not in (None, "linear"):
            raise ValueError(f"unknown output activation {self.gen_output_activation!r}")
        return x
