"""Spatial up/down-sampling ops.

``UpSampling2D``/``UpSampling3D`` in the reference are nearest-neighbor 2x
repeats (reference: confignet/dnn_models/hologan_generator.py:139-170).  On
TPU a plain ``jnp.repeat``-style broadcast-reshape compiles to pure layout
ops that XLA fuses into the neighboring convolution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2d_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, fH, fW, C), nearest."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return jnp.reshape(x, (b, h * factor, w * factor, c))


def upsample3d_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """(B, D, H, W, C) -> (B, fD, fH, fW, C), nearest."""
    b, d, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :],
        (b, d, factor, h, factor, w, factor, c),
    )
    return jnp.reshape(x, (b, d * factor, h * factor, w * factor, c))
