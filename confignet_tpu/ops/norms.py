"""Normalization primitives with the reference's exact numerics.

Two distinct instance-norm flavors exist in the reference and they are NOT
interchangeable:

1. ``spatial_instance_norm`` — used inside AdaIN.  Keras
   ``LayerNormalization(axis=spatial, center=False, scale=False)``:
   normalizes with ``(x - mean) * rsqrt(var + eps)``, eps = 1e-3, statistics
   over the *spatial* axes per (batch, channel)
   (reference: confignet/dnn_models/building_blocks.py:132-133).

2. ``std_instance_norm`` — used in discriminator blocks.  The keras-contrib
   ``InstanceNormalization`` copy normalizes with ``(x - mean) / (std + eps)``
   (std, not variance!), eps = 1e-3, with per-channel affine params
   (reference: confignet/dnn_models/instance_normalization.py:117-119).

Keeping the two separate (and the eps inside vs outside the sqrt) is what
makes weight-converted models bit-compatible within float tolerance.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def spatial_instance_norm(x: jax.Array, spatial_axes: Sequence[int], eps: float = 1e-3) -> jax.Array:
    """(x - mean) * rsqrt(var + eps) over ``spatial_axes``, no affine."""
    mean = jnp.mean(x, axis=tuple(spatial_axes), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=tuple(spatial_axes), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def std_instance_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    spatial_axes: Sequence[int],
    eps: float = 1e-3,
) -> jax.Array:
    """(x - mean) / (std + eps) * gamma + beta over ``spatial_axes``.

    ``gamma``/``beta`` are per-channel (last axis).
    """
    mean = jnp.mean(x, axis=tuple(spatial_axes), keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(x - mean), axis=tuple(spatial_axes), keepdims=True))
    normed = (x - mean) / (std + eps)
    shape = [1] * x.ndim
    shape[-1] = x.shape[-1]
    return normed * jnp.reshape(gamma, shape) + jnp.reshape(beta, shape)


def layer_style(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-channel spatial mean and std, concatenated along channels.

    Returns (B, 2C).  Used by the style discriminator heads
    (reference: confignet/confignet_utils.py:147-159 and
    dnn_models/building_blocks.py:100-102).
    """
    if x.ndim == 4:
        axes = (1, 2)
    elif x.ndim == 5:
        axes = (1, 2, 3)
    else:
        raise NotImplementedError(f"unsupported rank {x.ndim}")

    mean = jnp.mean(x, axis=axes)
    std = jnp.sqrt(jnp.mean(jnp.square(x - jnp.mean(x, axis=axes, keepdims=True)), axis=axes) + eps)
    return jnp.concatenate([mean, std], axis=-1)


def adain_modulate(x: jax.Array, scale: jax.Array, bias: jax.Array, spatial_axes: Sequence[int], eps: float = 1e-3, impl: str = "auto") -> jax.Array:
    """AdaIN: instance-normalize then modulate with per-(batch, channel)
    scale/bias predicted from the latent: ``norm(x) * (scale + 1) + bias``
    (reference: confignet/dnn_models/building_blocks.py:135-149).

    ``scale``/``bias`` have shape (B, C).  On TPU (``impl="auto"``) the
    full-spatial case lowers to the fused one-pass VMEM kernel
    (ops/adain_pallas.py) with an XLA backward; any other axis selection
    (or backend) uses the plain XLA form.
    """
    full_spatial = tuple(spatial_axes) == tuple(range(1, x.ndim - 1))
    if full_spatial:
        from confignet_tpu.ops.adain_pallas import (
            fused_adain, fused_adain_fits_vmem, resolve_adain_impl)

        if resolve_adain_impl(impl) == "pallas" and fused_adain_fits_vmem(x.shape, x.dtype):
            return fused_adain(x, scale, bias, eps)
    normed = spatial_instance_norm(x, spatial_axes, eps)
    shape = [x.shape[0]] + [1] * (x.ndim - 2) + [x.shape[-1]]
    scale = jnp.reshape(scale, shape)
    bias = jnp.reshape(bias, shape)
    return normed * (scale + 1.0) + bias
