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
