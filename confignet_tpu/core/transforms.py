"""3D transforms used by the volumetric generator.

Numerical contracts match the reference exactly so that a weight-converted
generator produces the same images:

- :func:`euler_angles_to_matrix` mirrors the reference's specific rotation
  composition (reference: confignet/confignet_utils.py:122-145).
- :func:`rotate_3d_grid` mirrors the trilinear resample of a cubic feature
  grid under a rotation about its center
  (reference: confignet/confignet_utils.py:63-120), reformulated for TPU:
  instead of 8 scattered ``gather_nd`` calls over a flattened volume, we do
  row-gathers over the flattened grid via ``take_along_axis``, which XLA
  lowers to efficient dynamic-slice sequences, with all index math batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def euler_angles_to_matrix(angle_vector: jax.Array) -> jax.Array:
    """(B, 3) Euler angles -> (B, 3, 3) rotation matrices.

    The composition order/axes follow the reference verbatim
    (confignet/confignet_utils.py:122-145); the matrix entries below are its
    closed form.
    """
    angles = jnp.reshape(angle_vector, (-1, 3))
    sins = jnp.sin(angles)
    coss = jnp.cos(angles)

    s0, s1, s2 = sins[:, 0], sins[:, 1], sins[:, 2]
    c0, c1, c2 = coss[:, 0], coss[:, 1], coss[:, 2]

    a11 = c2 * c1
    a12 = -s2
    a13 = c2 * s1
    a21 = s0 * s1 + c0 * c1 * s2
    a22 = c0 * c2
    a23 = c0 * s2 * s1 - c1 * s0
    a31 = c1 * s0 * s2 - c0 * s1
    a32 = c2 * s0
    a33 = c0 * c1 + s0 * s1 * s2

    mat = jnp.stack([a11, a12, a13, a21, a22, a23, a31, a32, a33], axis=-1)
    return jnp.reshape(mat, (-1, 3, 3))


def _grid_coords(grid_size: int) -> np.ndarray:
    """Static (3, S^3) integer lattice coordinates, 'ij' order (x fastest
    over dim 0 blocks), matching the reference's meshgrid+vstack layout."""
    r = np.arange(grid_size)
    xs, ys, zs = np.meshgrid(r, r, r, indexing="ij")
    return np.vstack((xs.flatten(), ys.flatten(), zs.flatten())).astype(np.float32)


def rotate_3d_grid(grid: jax.Array, transform: jax.Array) -> jax.Array:
    """Trilinearly resample a (B, S, S, S, C) grid under per-sample 3x3
    transforms applied about the grid center.

    Out-of-range source coordinates clamp to the border, exactly as the
    reference's ``clip_by_value`` does.
    """
    assert grid.shape[1] == grid.shape[2] == grid.shape[3], "grid must be cubic"
    batch = grid.shape[0]
    size = grid.shape[1]
    channels = grid.shape[4]
    num_points = size ** 3

    f, c, diffs = _source_coords(grid, transform)
    diffs = diffs.astype(grid.dtype)

    flat_grid = jnp.reshape(grid, (batch, num_points, channels))

    def flat_index(x_idx, y_idx, z_idx):
        return (x_idx * size + y_idx) * size + z_idx

    def fetch(x_idx, y_idx, z_idx):
        idx = flat_index(x_idx, y_idx, z_idx)  # (B, P)
        return jnp.take_along_axis(flat_grid, idx[:, :, None], axis=1)  # (B, P, C)

    c000 = fetch(f[:, 0], f[:, 1], f[:, 2])
    c100 = fetch(c[:, 0], f[:, 1], f[:, 2])
    c001 = fetch(f[:, 0], f[:, 1], c[:, 2])
    c101 = fetch(c[:, 0], f[:, 1], c[:, 2])
    c010 = fetch(f[:, 0], c[:, 1], f[:, 2])
    c110 = fetch(c[:, 0], c[:, 1], f[:, 2])
    c011 = fetch(f[:, 0], c[:, 1], c[:, 2])
    c111 = fetch(c[:, 0], c[:, 1], c[:, 2])

    dx = diffs[:, 0][:, :, None]
    dy = diffs[:, 1][:, :, None]
    dz = diffs[:, 2][:, :, None]

    c00 = c000 * (1 - dx) + c100 * dx
    c01 = c001 * (1 - dx) + c101 * dx
    c10 = c010 * (1 - dx) + c110 * dx
    c11 = c011 * (1 - dx) + c111 * dx

    c0 = c00 * (1 - dy) + c10 * dy
    c1 = c01 * (1 - dy) + c11 * dy

    out = c0 * (1 - dz) + c1 * dz
    return jnp.reshape(out, grid.shape)


def _source_coords(grid: jax.Array, transform: jax.Array):
    """Shared coordinate math for all resample variants: returns clipped
    source coords, floor/ceil indices and the fractional weights.

    Always computed in (at least) float32 — coordinate/weight precision
    determines which interpolation cell each point lands in, independent of
    the feature dtype.
    """
    size = grid.shape[1]
    center = (size - 1) / 2.0
    coord_dtype = grid.dtype if grid.dtype == jnp.float64 else jnp.float32
    coords = jnp.asarray(_grid_coords(size), dtype=coord_dtype)
    transform = transform.astype(coord_dtype)
    src = (
        jnp.einsum(
            "bij,jp->bip", transform, coords - center,
            precision=jax.lax.Precision.HIGHEST,
        )
        + center
    )
    src = jnp.clip(src, 0.0, size - 1)
    floor = jnp.clip(jnp.floor(src), 0.0, size - 1)
    ceil = jnp.clip(floor + 1.0, 0.0, size - 1)
    return floor.astype(jnp.int32), ceil.astype(jnp.int32), src - floor


def rotate_3d_grid_matmul(grid: jax.Array, transform: jax.Array) -> jax.Array:
    """MXU-native trilinear rotation resample.

    Identical interpolation contract to :func:`rotate_3d_grid`, but instead
    of 8 scattered gathers (which XLA scalarizes on TPU — measured ~75% of
    the whole generator's time) the sample is computed as a sum over the 16
    source z-slices of batched one-hot matmuls:

        out[b,p,c] = sum_s Wz[b,p,s] * (Wxy[b,p,:] @ G[b,:,s,:])

    where Wxy is the (P, S^2) interpolation matrix over the combined (x, y)
    plane (4 nonzeros/row: the bilinear corner weights) and Wz the (P, S)
    linear weights over z (2 nonzeros/row).  ~0.55 TFLOP at B=128 — a few ms
    on the MXU vs ~50 ms for the gather form.  Peak extra memory is one
    (B, P, S^2) one-hot plus a (B, P, C) accumulator.
    """
    assert grid.shape[1] == grid.shape[2] == grid.shape[3], "grid must be cubic"
    batch, size, channels = grid.shape[0], grid.shape[1], grid.shape[4]
    num_points = size ** 3

    f, c, d = _source_coords(grid, transform)
    dx = d[:, 0][..., None]  # (B, P, 1)
    dy = d[:, 1][..., None]
    dz = d[:, 2][..., None]

    plane = size * size
    xy_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, plane), 2)

    def xy_onehot(x_idx, y_idx):
        flat = (x_idx * size + y_idx)[..., None]  # (B, P, 1)
        return (xy_iota == flat).astype(grid.dtype)

    # Bilinear weights over the (x, y) plane, 4 corners.
    w_xy = (
        xy_onehot(f[:, 0], f[:, 1]) * ((1 - dx) * (1 - dy))
        + xy_onehot(c[:, 0], f[:, 1]) * (dx * (1 - dy))
        + xy_onehot(f[:, 0], c[:, 1]) * ((1 - dx) * dy)
        + xy_onehot(c[:, 0], c[:, 1]) * (dx * dy)
    )  # (B, P, S^2)

    z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    w_z = (
        (z_iota == f[:, 2][..., None]).astype(jnp.float32) * (1 - dz)
        + (z_iota == c[:, 2][..., None]).astype(jnp.float32) * dz
    )  # (B, P, S), f32 — z weights are applied outside the MXU

    # The matmul operands take the grid dtype (bf16 grids run the MXU in
    # bf16, same as the Pallas kernel), but the per-slice interpolation is
    # accumulated in f32 and only the final result is cast back — matching
    # the Pallas kernel's f32 accumulator so the two paths agree.
    w_xy = w_xy.astype(grid.dtype)

    # grid as (B, S^2, S, C): contiguous (x*S+y) rows per z-slice.
    g = jnp.reshape(grid, (batch, plane, size, channels))

    def body(s, acc):
        slice_s = jax.lax.dynamic_index_in_dim(g, s, axis=2, keepdims=False)  # (B, S^2, C)
        sampled = jnp.einsum(
            "bpq,bqc->bpc", w_xy, slice_s,
            preferred_element_type=jnp.float32,
        )  # MXU, f32 accumulation
        return acc + w_z[:, :, s][..., None] * sampled

    out = jax.lax.fori_loop(
        0, size, body, jnp.zeros((batch, num_points, channels), jnp.float32)
    )
    return jnp.reshape(out, grid.shape).astype(grid.dtype)


def rotate_3d_grid_reference_numpy(grid: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Pure-numpy oracle implementing the same contract; used by tests to
    validate the JAX/Pallas paths."""
    batch, size = grid.shape[0], grid.shape[1]
    center = (size - 1) / 2.0
    coords = _grid_coords(size).astype(grid.dtype)

    out = np.zeros_like(grid)
    for b in range(batch):
        src = transform[b].astype(grid.dtype) @ (coords - center) + center
        src = np.clip(src, 0, size - 1)
        floor = np.clip(np.floor(src), 0, size - 1)
        ceil = np.clip(floor + 1, 0, size - 1)
        d = src - floor
        fi, ci = floor.astype(int), ceil.astype(int)
        g = grid[b]

        def fv(x, y, z):
            return g[x, y, z]

        c000 = fv(fi[0], fi[1], fi[2])
        c100 = fv(ci[0], fi[1], fi[2])
        c001 = fv(fi[0], fi[1], ci[2])
        c101 = fv(ci[0], fi[1], ci[2])
        c010 = fv(fi[0], ci[1], fi[2])
        c110 = fv(ci[0], ci[1], fi[2])
        c011 = fv(fi[0], ci[1], ci[2])
        c111 = fv(ci[0], ci[1], ci[2])

        dx, dy, dz = d[0][:, None], d[1][:, None], d[2][:, None]
        c00 = c000 * (1 - dx) + c100 * dx
        c01 = c001 * (1 - dx) + c101 * dx
        c10 = c010 * (1 - dx) + c110 * dx
        c11 = c011 * (1 - dx) + c111 * dx
        c0 = c00 * (1 - dy) + c10 * dy
        c1 = c01 * (1 - dy) + c11 * dy
        vals = c0 * (1 - dz) + c1 * dz
        out[b] = vals.reshape(grid.shape[1:])
    return out
