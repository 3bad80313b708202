"""Pallas-kernel tests — these require a real TPU and are skipped on the CPU
test rig (run them manually: JAX_PLATFORMS= python -m pytest tests/test_pallas_tpu.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernels need TPU hardware", allow_module_level=True)

from confignet_tpu.core.transforms import euler_angles_to_matrix, rotate_3d_grid
from confignet_tpu.ops.rotate_pallas import rotate_3d_grid_fused, rotate_3d_grid_pallas


def test_pallas_forward_matches_gather(rng):
    grid = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 128)).astype(np.float32))
    mats = euler_angles_to_matrix(
        jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)).astype(np.float32))
    )
    out_g = np.asarray(jax.jit(rotate_3d_grid)(grid, mats))
    out_p = np.asarray(rotate_3d_grid_pallas(grid, mats))
    # MXU bf16 input truncation bounds the difference
    assert np.abs(out_g - out_p).max() < 5e-2


def test_pallas_fused_grad_matches_gather(rng):
    grid = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 128)).astype(np.float32))
    mats = euler_angles_to_matrix(
        jnp.asarray(rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32))
    )
    ct = jnp.asarray(rng.normal(size=grid.shape).astype(np.float32))

    g_fused = jax.jit(jax.grad(lambda g: jnp.sum(rotate_3d_grid_fused(g, mats) * ct)))(grid)
    g_gather = jax.jit(jax.grad(lambda g: jnp.sum(rotate_3d_grid(g, mats) * ct)))(grid)
    rel = float(jnp.max(jnp.abs(g_fused - g_gather)) / jnp.max(jnp.abs(g_gather)))
    assert rel < 5e-2


def test_pallas_fused_zero_rotation_grad(rng):
    grid = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 64)).astype(np.float32))
    mats = euler_angles_to_matrix(
        jnp.asarray(rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32))
    )
    g_t = jax.jit(jax.grad(lambda m: jnp.sum(rotate_3d_grid_fused(grid, m)), argnums=0))(mats)
    np.testing.assert_array_equal(np.asarray(g_t), 0.0)


def test_fused_adain_on_chip_matches_xla(rng):
    from confignet_tpu.ops.adain_pallas import fused_adain
    from confignet_tpu.ops.norms import spatial_instance_norm

    for shape in ((4, 32, 32, 32), (2, 16, 16, 16, 128)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(shape[0], shape[-1])).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(shape[0], shape[-1])).astype(np.float32))
        got = np.asarray(fused_adain(x, scale, bias))
        axes = tuple(range(1, x.ndim - 1))
        normed = spatial_instance_norm(x, axes, 1e-3)
        bshape = [shape[0]] + [1] * (x.ndim - 2) + [shape[-1]]
        want = np.asarray(normed * (jnp.reshape(scale, bshape) + 1.0)
                          + jnp.reshape(bias, bshape))
        assert np.abs(got - want).max() < 1e-4, shape
