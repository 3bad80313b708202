"""Pallas rotation kernels through the interpreter on CPU: pins the kernel
LOGIC (slab-skip bounds, one-hot weights, transpose accumulation) in the
fast suite without TPU hardware.  tests/test_pallas_tpu.py runs the same
contracts compiled on a real chip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confignet_tpu.core.transforms import euler_angles_to_matrix, rotate_3d_grid
from confignet_tpu.ops.rotate_pallas import _pack_point_inputs, _rotate_grad_grid, rotate_3d_grid_pallas


def _case(size=8, channels=8, batch=3, seed=0):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(rng.normal(size=(batch, size, size, size, channels)), jnp.float32)
    # the reference pose distribution (yaw +-30deg, pitch +-10deg, roll 0) —
    # the slab-skip bounds are data-dependent, so use the real ranges plus
    # an exact-zero rotation row (degenerate floor==ceil indices)
    rot = rng.uniform(-1, 1, size=(batch, 3)) * np.array([np.pi / 6, np.pi / 18, 0.0])
    rot[0] = 0.0
    transforms = euler_angles_to_matrix(jnp.asarray(rot, jnp.float32))
    return grid, transforms


def test_forward_kernel_matches_gather_oracle():
    grid, transforms = _case()
    oracle = rotate_3d_grid(grid, transforms)
    got = rotate_3d_grid_pallas(grid, transforms, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=2e-5)


def test_forward_kernel_multiple_point_blocks():
    # point_block < P forces several kernel grid steps per sample
    grid, transforms = _case(size=8, channels=4, batch=2, seed=1)
    oracle = rotate_3d_grid(grid, transforms)
    got = rotate_3d_grid_pallas(grid, transforms, point_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=2e-5)


def test_grad_kernel_matches_gather_autodiff():
    """The transpose kernel must equal the gather form's autodiff gradient
    w.r.t. the feature grid."""
    from confignet_tpu.core.transforms import _source_coords

    grid, transforms = _case(size=8, channels=4, batch=2, seed=2)
    size = grid.shape[1]
    ct = jnp.asarray(
        np.random.default_rng(3).normal(size=grid.shape), jnp.float32)

    def loss(g):
        return jnp.sum(rotate_3d_grid(g, transforms) * ct)

    expected = jax.grad(loss)(grid)

    f, c, d = _source_coords(grid, transforms)
    pidx, sidx, frac = _pack_point_inputs(f, c, d, size)
    ct_flat = ct.reshape(grid.shape[0], size ** 3, grid.shape[4])
    got = _rotate_grad_grid(ct_flat, pidx, sidx, frac, size=size,
                            point_block=256, interpret=True)
    got = got.reshape(grid.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)


# ---------------------------------------------------------------------------
# Fused AdaIN kernel (ops/adain_pallas.py)
# ---------------------------------------------------------------------------

def _adain_oracle(x, scale, bias, eps=1e-3):
    from confignet_tpu.ops.norms import spatial_instance_norm

    spatial_axes = tuple(range(1, x.ndim - 1))
    normed = spatial_instance_norm(x, spatial_axes, eps)
    shape = [x.shape[0]] + [1] * (x.ndim - 2) + [x.shape[-1]]
    return normed * (jnp.reshape(scale, shape) + 1.0) + jnp.reshape(bias, shape)


@pytest.mark.parametrize("shape", [(3, 16, 16, 32), (2, 8, 8, 8, 16)])
def test_fused_adain_matches_xla(shape):
    from confignet_tpu.ops.adain_pallas import fused_adain

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(shape[0], shape[-1])), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(shape[0], shape[-1])), jnp.float32)
    got = fused_adain(x, scale, bias, 1e-3, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_adain_oracle(x, scale, bias)), atol=2e-5)


def test_fused_adain_bf16_dtype_and_tolerance():
    from confignet_tpu.ops.adain_pallas import fused_adain

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    got = fused_adain(x, scale, bias, 1e-3, True)
    assert got.dtype == jnp.bfloat16
    oracle = _adain_oracle(x.astype(jnp.float32), scale, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(oracle), atol=3e-2)


def test_fused_adain_gradients_match_autodiff():
    from confignet_tpu.ops.adain_pallas import fused_adain

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_adain(x, s, b, 1e-3, True) * w)

    def loss_oracle(x, s, b):
        return jnp.sum(_adain_oracle(x, s, b) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fused, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_adain_modulate_partial_axes_stays_xla():
    """Non-full spatial axis selections must bypass the fused kernel."""
    from confignet_tpu.ops.norms import adain_modulate, spatial_instance_norm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    out = adain_modulate(x, scale, bias, spatial_axes=(1,), impl="pallas")
    normed = spatial_instance_norm(x, (1,), 1e-3)
    want = normed * (scale[:, None, None, :] + 1.0) + bias[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_fused_adain_grad_dtypes_match_primals():
    """custom_vjp cotangents must match each primal's dtype even when scale
    and bias dtypes differ (e.g. bf16 scale with an f32 bias kept for
    stability) — regression for dbias being cast to scale.dtype."""
    from confignet_tpu.ops.adain_pallas import fused_adain

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(2, 8)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)

    grads = jax.grad(lambda x, s, b: jnp.sum(
        fused_adain(x, s, b, 1e-3, True).astype(jnp.float32)),
        argnums=(0, 1, 2))(x, scale, bias)
    assert grads[0].dtype == x.dtype
    assert grads[1].dtype == scale.dtype
    assert grads[2].dtype == bias.dtype
