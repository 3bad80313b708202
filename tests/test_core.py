import numpy as np
import pytest

import jax
import jax.numpy as jnp

from confignet_tpu.core.config import merge_configs
from confignet_tpu.core.images import (
    build_image_matrix,
    flip_random_subset_of_images,
    uint8_to_unit_range,
    unit_range_to_uint8,
)
from confignet_tpu.core.transforms import (
    euler_angles_to_matrix,
    rotate_3d_grid,
    rotate_3d_grid_reference_numpy,
)


def test_merge_configs_recursive():
    default = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    override = {"b": {"c": 99}, "f": "new"}
    merged = merge_configs(default, override)
    assert merged == {"a": 1, "b": {"c": 99, "d": 3}, "e": [1, 2], "f": "new"}


def test_merge_configs_does_not_mutate():
    default = {"a": {"b": 1}}
    override = {"a": {"b": 2}}
    merged = merge_configs(default, override)
    merged["a"]["b"] = 77
    assert default["a"]["b"] == 1


def test_image_range_roundtrip(rng):
    imgs = rng.integers(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
    as_float = uint8_to_unit_range(imgs)
    assert as_float.min() >= -1.0 and as_float.max() <= 1.0
    back = unit_range_to_uint8(as_float)
    # Truncation (not rounding) in the uint8 cast can lose 1 LSB, exactly as
    # the reference's `((x + 1) * 127.5).astype(np.uint8)` does.
    assert np.max(np.abs(imgs.astype(np.int32) - back.astype(np.int32))) <= 1


def test_build_image_matrix_layout(rng):
    imgs = rng.integers(0, 256, size=(6, 4, 4, 3), dtype=np.uint8)
    matrix = build_image_matrix(imgs, 2, 3)
    assert matrix.shape == (8, 12, 3)
    # image j*n_cols+i at row j, col i
    np.testing.assert_array_equal(matrix[0:4, 0:4], imgs[0])
    np.testing.assert_array_equal(matrix[0:4, 4:8], imgs[1])
    np.testing.assert_array_equal(matrix[4:8, 0:4], imgs[3])


def test_flip_random_subset(rng):
    imgs = rng.normal(size=(16, 4, 6, 3)).astype(np.float32)
    orig = imgs.copy()
    flipped = flip_random_subset_of_images(imgs, rng)
    for i in range(16):
        same = np.allclose(flipped[i], orig[i])
        mirrored = np.allclose(flipped[i], orig[i][:, ::-1])
        assert same or mirrored


def test_euler_angles_identity():
    mats = euler_angles_to_matrix(jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(mats), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)


def test_euler_angles_orthonormal(rng):
    angles = rng.uniform(-0.5, 0.5, size=(8, 3)).astype(np.float32)
    mats = np.asarray(euler_angles_to_matrix(jnp.asarray(angles)))
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_rotate_3d_grid_identity(rng):
    grid = rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    out = np.asarray(rotate_3d_grid(jnp.asarray(grid), jnp.asarray(eye)))
    np.testing.assert_allclose(out, grid, atol=1e-5)


def test_rotate_3d_grid_matches_oracle(rng):
    grid = rng.normal(size=(3, 8, 8, 8, 5)).astype(np.float32)
    angles = rng.uniform(-0.6, 0.6, size=(3, 3)).astype(np.float32)
    mats = np.asarray(euler_angles_to_matrix(jnp.asarray(angles)))
    out = np.asarray(rotate_3d_grid(jnp.asarray(grid), jnp.asarray(mats)))
    oracle = rotate_3d_grid_reference_numpy(grid, mats)
    # Tolerate rare floor-flips where a source coordinate sits within float
    # rounding of an integer; everything else must match tightly.
    mismatch = np.abs(out - oracle) > 1e-4
    assert mismatch.mean() < 0.005, mismatch.mean()


def test_rotate_3d_grid_under_jit(rng):
    grid = rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32)
    angles = rng.uniform(-0.3, 0.3, size=(2, 3)).astype(np.float32)

    @jax.jit
    def fn(g, a):
        return rotate_3d_grid(g, euler_angles_to_matrix(a))

    out = np.asarray(fn(jnp.asarray(grid), jnp.asarray(angles)))
    oracle = rotate_3d_grid_reference_numpy(
        grid, np.asarray(euler_angles_to_matrix(jnp.asarray(angles)))
    )
    # float32 path: tolerate rare floor-flips at near-integer coordinates
    # (identical interpolation logic is pinned by the float64 oracle test).
    mismatch = np.abs(out - oracle) > 1e-4
    assert mismatch.mean() < 0.01


def test_pretrained_backbone_discovery(tmp_path, capsys):
    """core/pretrained.py: files present are applied, missing ones skipped."""
    from confignet_tpu.core.pretrained import backbone_path, maybe_load

    assert backbone_path(None, "vgg19") is None
    assert backbone_path(str(tmp_path), "vgg19") is None

    target = tmp_path / "vgg19_notop.h5"
    target.write_bytes(b"")
    assert backbone_path(str(tmp_path), "vgg19") == str(target)

    seen = []
    assert maybe_load(seen.append, str(tmp_path), "vgg19") is True
    assert seen == [str(target)]
    assert maybe_load(seen.append, str(tmp_path), "inception_v3") is False
    assert len(seen) == 1
