"""Numerical-parity tests of our normalization/activation ops against the
exact Keras layers the reference uses.  TF runs on CPU here; these tests are
skipped when TF is unavailable.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from confignet_tpu.ops.norms import (
    adain_modulate,
    layer_style,
    spatial_instance_norm,
    std_instance_norm,
)
from confignet_tpu.ops.resample import upsample2d_nearest, upsample3d_nearest

tf = pytest.importorskip("tensorflow")


def test_spatial_instance_norm_matches_keras_layernorm_2d(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    layer = tf.keras.layers.LayerNormalization(axis=[1, 2], center=False, scale=False)
    expected = layer(tf.constant(x)).numpy()
    got = np.asarray(spatial_instance_norm(jnp.asarray(x), (1, 2)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_spatial_instance_norm_matches_keras_layernorm_3d(rng):
    x = rng.normal(size=(2, 4, 4, 4, 6)).astype(np.float32)
    layer = tf.keras.layers.LayerNormalization(axis=[1, 2, 3], center=False, scale=False)
    expected = layer(tf.constant(x)).numpy()
    got = np.asarray(spatial_instance_norm(jnp.asarray(x), (1, 2, 3)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_std_instance_norm_semantics(rng):
    # (x - mean) / (std + eps), eps OUTSIDE the sqrt -- the keras-contrib
    # quirk (reference instance_normalization.py:117-119).
    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    gamma = rng.normal(size=(4,)).astype(np.float32)
    beta = rng.normal(size=(4,)).astype(np.float32)

    mean = x.mean(axis=(1, 2), keepdims=True)
    std = x.std(axis=(1, 2), keepdims=True) + 1e-3
    expected = (x - mean) / std * gamma + beta

    got = np.asarray(std_instance_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), (1, 2)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_layer_style_matches_reference_formula(rng):
    x = rng.normal(size=(3, 5, 7, 4)).astype(np.float32)
    mean = x.mean(axis=(1, 2))
    std = np.sqrt(((x - x.mean(axis=(1, 2), keepdims=True)) ** 2).mean(axis=(1, 2)) + 1e-6)
    expected = np.concatenate([mean, std], axis=-1)
    got = np.asarray(layer_style(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_adain_modulate(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    scale = rng.normal(size=(2, 3)).astype(np.float32)
    bias = rng.normal(size=(2, 3)).astype(np.float32)
    normed = np.asarray(spatial_instance_norm(jnp.asarray(x), (1, 2)))
    expected = normed * (scale[:, None, None, :] + 1) + bias[:, None, None, :]
    got = np.asarray(adain_modulate(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), (1, 2)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_upsample2d_matches_keras(rng):
    x = rng.normal(size=(2, 3, 5, 4)).astype(np.float32)
    expected = tf.keras.layers.UpSampling2D()(tf.constant(x)).numpy()
    got = np.asarray(upsample2d_nearest(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)


def test_upsample3d_matches_keras(rng):
    x = rng.normal(size=(2, 3, 4, 5, 2)).astype(np.float32)
    expected = tf.keras.layers.UpSampling3D()(tf.constant(x)).numpy()
    got = np.asarray(upsample3d_nearest(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)


def test_conv_same_padding_matches_keras(rng):
    """Stride-2 SAME padding parity between flax and keras (asymmetric pad)."""
    from flax import linen as nn
    import jax

    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    keras_conv = tf.keras.layers.Conv2D(4, 3, strides=2, padding="same")
    expected = keras_conv(tf.constant(x)).numpy()
    kernel, bias = keras_conv.get_weights()

    flax_conv = nn.Conv(4, (3, 3), strides=(2, 2), padding="SAME")
    variables = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    got = np.asarray(flax_conv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_leaky_relu_keras_default_alpha(rng):
    from confignet_tpu.models.blocks import leaky_relu

    x = rng.normal(size=(4, 4)).astype(np.float32)
    expected = tf.keras.layers.LeakyReLU()(tf.constant(x)).numpy()
    got = np.asarray(leaky_relu(jnp.asarray(x)))  # default slope 0.3
    np.testing.assert_allclose(got, expected, atol=1e-6)

    expected02 = tf.nn.leaky_relu(tf.constant(x)).numpy()
    got02 = np.asarray(leaky_relu(jnp.asarray(x), 0.2))
    np.testing.assert_allclose(got02, expected02, atol=1e-6)
