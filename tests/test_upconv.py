"""Fused upsample+conv lowering (ops/upconv.py): exactness vs the naive
oracle (materialised nearest-2x upsample + stock XLA conv), forward and
gradient, plus whole-generator invariance across the ``upconv_impl`` knob.

Reference pairing being rewritten: UpSampling3D/2D followed by
Conv3D/Conv2D (confignet/dnn_models/hologan_generator.py:139-170).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confignet_tpu.ops.resample import upsample2d_nearest, upsample3d_nearest
from confignet_tpu.ops.upconv import (
    UpConv,
    resolve_upconv_impl,
    up2_conv2d_subpixel,
    up2_conv3d_subpixel,
)


def _naive2d(x, k):
    return jax.lax.conv_general_dilated(
        upsample2d_nearest(x), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _naive3d(x, k):
    return jax.lax.conv_general_dilated(
        upsample3d_nearest(x), k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("h,w,ci,co", [(4, 4, 8, 16), (5, 7, 3, 5), (16, 16, 8, 3)])
def test_subpixel2d_matches_naive(h, w, ci, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 4, ci, co)), jnp.float32)
    np.testing.assert_allclose(
        up2_conv2d_subpixel(x, k), _naive2d(x, k), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("d,ci,co", [(4, 8, 16), (3, 5, 7), (8, 4, 4)])
def test_subpixel3d_matches_naive(d, ci, co):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, d, d + 1, d, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)), jnp.float32)
    np.testing.assert_allclose(
        up2_conv3d_subpixel(x, k), _naive3d(x, k), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("rank", [2, 3])
def test_subpixel_gradients_match_naive(rank):
    rng = np.random.default_rng(2)
    if rank == 2:
        x = jnp.asarray(rng.normal(size=(2, 5, 5, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(4, 4, 4, 6)), jnp.float32)
        fused, naive = up2_conv2d_subpixel, _naive2d
    else:
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 6)), jnp.float32)
        fused, naive = up2_conv3d_subpixel, _naive3d
    cot = jnp.asarray(rng.normal(size=naive(x, k).shape), jnp.float32)
    gx_f, gk_f = jax.grad(lambda a, b: jnp.vdot(fused(a, b), cot), (0, 1))(x, k)
    gx_n, gk_n = jax.grad(lambda a, b: jnp.vdot(naive(a, b), cot), (0, 1))(x, k)
    np.testing.assert_allclose(gx_f, gx_n, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(gk_f, gk_n, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("rank", [2, 3])
def test_upconv_module_param_tree_and_impl_equality(rank):
    ksize = (4, 4) if rank == 2 else (3, 3, 3)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2,) + (4,) * rank + (8,)),
        jnp.float32,
    )
    mod_s = UpConv(features=6, kernel_size=ksize, impl="subpixel")
    mod_n = UpConv(features=6, kernel_size=ksize, impl="naive")
    params = mod_s.init(jax.random.PRNGKey(0), x)
    # Parameter pytree matches the unfused conv modules: kernel + bias.
    assert set(params["params"].keys()) == {"kernel", "bias"}
    assert params["params"]["kernel"].shape == ksize + (8, 6)
    out_s = mod_s.apply(params, x)
    out_n = mod_n.apply(params, x)
    assert out_s.shape == (2,) + (8,) * rank + (6,)
    np.testing.assert_allclose(out_s, out_n, atol=2e-5, rtol=1e-5)


def test_resolve_upconv_impl():
    assert resolve_upconv_impl("auto") in ("naive", "subpixel")
    assert resolve_upconv_impl("naive") == "naive"
    with pytest.raises(ValueError):
        resolve_upconv_impl("bogus")


@pytest.mark.parametrize("size", [128, 256])
def test_generator_invariant_across_upconv_impl(size):
    """The full generator produces the same image for the same params under
    both lowerings (f32; the knob is a pure compute-graph choice)."""
    from confignet_tpu.models.generator import HologanGenerator

    latent_dim = 33
    gen_n = HologanGenerator(
        latent_dim=latent_dim, output_shape=(size, size), upconv_impl="naive"
    )
    gen_s = HologanGenerator(
        latent_dim=latent_dim, output_shape=(size, size), upconv_impl="subpixel"
    )
    z = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, latent_dim)), jnp.float32
    )
    rot = jnp.asarray([[0.3, -0.1, 0.0], [-0.2, 0.05, 0.0]], jnp.float32)
    variables = gen_n.init(jax.random.PRNGKey(1), z, rot)
    out_n = gen_n.apply(variables, z, rot)
    out_s = gen_s.apply(variables, z, rot)
    assert out_n.shape == (2, size, size, 3)
    np.testing.assert_allclose(out_s, out_n, atol=5e-4, rtol=1e-4)
