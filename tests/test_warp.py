import numpy as np
import pytest

import jax.numpy as jnp

from confignet_tpu.ops.warp import affine_warp

cv2 = pytest.importorskip("cv2")


def test_affine_warp_matches_cv2(rng):
    img = rng.random((1, 40, 50, 3)).astype(np.float32)
    angle, scale = 12.0, 0.8
    M = cv2.getRotationMatrix2D((25, 20), angle, scale).astype(np.float32)

    expected = cv2.warpAffine(img[0], M, (48, 36))
    got = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(M[None]), (36, 48)))[0]

    # interiors match tightly; borders differ by cv2's edge handling
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(got[interior], expected[interior], atol=2e-2)


def test_affine_warp_identity(rng):
    img = rng.random((2, 16, 16, 1)).astype(np.float32)
    M = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(M), (16, 16)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_align_image_roundtrip(rng):
    from confignet_tpu.data.normalizer import align_image

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    canonical = np.array([[16, 16], [48, 16], [32, 48]], np.float32)
    # identity landmark placement -> identity warp
    out = align_image(img, canonical, (64, 64), canonical)
    np.testing.assert_allclose(out, img, atol=1)


def test_rotate_matmul_bf16_dtype():
    """The one-hot-matmul rotation must preserve a bfloat16 grid dtype
    (the f32 fractional weights used to promote the scan carry, breaking
    bf16 generators configured with rotation_resample='matmul')."""
    import jax.numpy as jnp
    from confignet_tpu.core.transforms import rotate_3d_grid, rotate_3d_grid_matmul

    rng = np.random.default_rng(11)
    grid = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 4)).astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1)))
    out = rotate_3d_grid_matmul(grid, t)
    assert out.dtype == jnp.bfloat16
    ref = rotate_3d_grid(grid, t)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
