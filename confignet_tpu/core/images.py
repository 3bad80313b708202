"""Image-space conventions, in one place.

The whole framework uses the reference's conventions
(reference: confignet/confignet_first_stage.py:442, confignet_second_stage.py:302-304):

- On disk / in datasets: ``uint8`` BGR (OpenCV layout), shape (H, W, 3).
- On device: ``float32``/``bfloat16`` in [-1, 1], NHWC.

The ``uint8 -> float`` conversion is ``x / 127.5 - 1``; the inverse clips to
[-1, 1] then maps back.  These appear at every host<->device boundary so they
live here instead of being scattered around.
"""
from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jnp = None


def uint8_to_unit_range(images: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1]."""
    return images.astype(np.float32) / 127.5 - 1.0


def unit_range_to_uint8(images) -> np.ndarray:
    """float [-1,1] -> uint8 [0,255] with clipping.

    Reference counterpart: confignet/confignet_first_stage.py:636-637.
    """
    images = np.asarray(images)
    images = np.clip(images, -1.0, 1.0)
    return ((images + 1.0) * 127.5).astype(np.uint8)


def build_image_matrix(images: np.ndarray, n_rows: int, n_cols: int) -> np.ndarray:
    """Tile a stack of images into an (n_rows, n_cols) grid.

    Image ``j * n_cols + i`` lands at grid row ``j``, column ``i``
    (reference: confignet/confignet_utils.py:182-190).
    """
    image_shape = images.shape[1:]
    matrix = np.zeros((n_rows * image_shape[0], n_cols * image_shape[1], 3), dtype=np.uint8)
    for i in range(n_cols):
        for j in range(n_rows):
            matrix[
                j * image_shape[0] : (j + 1) * image_shape[0],
                i * image_shape[1] : (i + 1) * image_shape[1],
            ] = images[j * n_cols + i]
    return matrix


def flip_random_subset_of_images(images: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
    """Horizontally flip a random ~50% subset of a batch, in place.

    Reference counterpart: confignet/confignet_utils.py:198-204.
    """
    if rng is None:
        flip_or_not = np.random.randint(0, 2, size=images.shape[0])
    else:
        flip_or_not = rng.integers(0, 2, size=images.shape[0])
    for i, flip in enumerate(flip_or_not):
        if flip == 1:
            images[i] = np.fliplr(images[i])
    return images


def batched_hflip(images, flip_mask):
    """Device-side conditional horizontal flip (vectorized, jit-friendly).

    ``flip_mask`` is a (B,) bool/int array; flipped where true.  This is the
    TPU-native replacement for the host-side loop above when augmentation
    happens inside the compiled step.
    """
    flipped = jnp.flip(images, axis=2)
    mask = jnp.reshape(flip_mask.astype(images.dtype), (-1, 1, 1, 1))
    return images * (1 - mask) + flipped * mask
