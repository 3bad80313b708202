"""ops/conv3d.py: the depth-tap decomposition must be exact vs XLA's
native 3D conv, and the Conv3d module must be parameter-compatible with
nn.Conv (same pytree, same outputs) so checkpoints are interchangeable
across lowering strategies."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from confignet_tpu.ops.conv3d import (
    Conv3d,
    conv3d_xla,
    conv3d_zdecomp,
    resolve_conv3d_impl,
)


@pytest.mark.parametrize("kd", [1, 2, 3])
@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 6), (1, 4, 6, 5, 3)])
def test_zdecomp_matches_xla(kd, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(kd, 3, 3, shape[-1], 7)) * 0.1, jnp.float32)
    ref = conv3d_xla(x, k)
    got = conv3d_zdecomp(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_module_parameter_compatible_with_nn_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 4)), jnp.float32)

    ref_mod = nn.Conv(5, (3, 3, 3), padding="SAME")
    new_mod = Conv3d(features=5, kernel_size=(3, 3, 3), impl="zdecomp")

    ref_vars = ref_mod.init(jax.random.PRNGKey(0), x)
    new_vars = new_mod.init(jax.random.PRNGKey(0), x)

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_vars)
    new_shapes = jax.tree_util.tree_map(lambda a: a.shape, new_vars)
    assert ref_shapes == new_shapes  # identical pytree structure + shapes

    # transplant nn.Conv's params into Conv3d: outputs must match
    out_ref = ref_mod.apply(ref_vars, x)
    out_new = new_mod.apply(ref_vars, x)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref), atol=1e-5)


def test_gradients_agree_across_impls():
    """Train steps differentiate through the conv: grads w.r.t. input and
    kernel must match across lowerings (autodiff of the decomposition is
    three 2D conv grads summed)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 5, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 5, 5, 5, 4)), jnp.float32)

    def loss(fn, x, k):
        return jnp.sum(fn(x, k) * ct)

    gx_ref, gk_ref = jax.grad(lambda x, k: loss(conv3d_xla, x, k), (0, 1))(x, k)
    gx_new, gk_new = jax.grad(lambda x, k: loss(conv3d_zdecomp, x, k), (0, 1))(x, k)
    # kernel grads reach ~40 in magnitude; the reassociated sum differs at
    # float32 rounding (measured rel err ~3e-7)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_new), np.asarray(gk_ref),
                               rtol=1e-5, atol=1e-5)


def test_resolve_auto_and_unknown():
    assert resolve_conv3d_impl("xla") == "xla"
    assert resolve_conv3d_impl("zdecomp") == "zdecomp"
    assert resolve_conv3d_impl("auto") in ("xla", "zdecomp")
    with pytest.raises(ValueError, match="conv3d impl"):
        resolve_conv3d_impl("nope")


@pytest.mark.slow
def test_generator_impls_agree():
    """The full generator renders the same image under either conv3d
    lowering with shared parameters.  Slow: compiles the forward twice."""
    from confignet_tpu.models.generator import HologanGenerator

    latent_dim = 16
    kwargs = dict(
        latent_dim=latent_dim,
        output_shape=(128, 128),
        const_shape=(4, 4, 4, 16),
        n_features_first=16,
        n_adain_mlp_units=8,
    )
    gen_xla = HologanGenerator(conv3d_impl="xla", **kwargs)
    gen_z = HologanGenerator(conv3d_impl="zdecomp", **kwargs)

    z = jnp.asarray(np.random.default_rng(2).normal(size=(2, latent_dim)), jnp.float32)
    rot = jnp.asarray([[0.3, -0.1, 0.0], [0.0, 0.2, 0.0]], jnp.float32)

    variables = gen_xla.init(jax.random.PRNGKey(0), z, rot)
    out_xla = gen_xla.apply(variables, z, rot)
    out_z = gen_z.apply(variables, z, rot)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(out_xla), atol=2e-5)
