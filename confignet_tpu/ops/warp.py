"""Batched affine image warping on device.

The host normalization pipeline warps with OpenCV (data/normalizer.py); this
is the jit-friendly batched equivalent for on-device preprocessing at
serving time (SURVEY.md §7 data item b): a 2x3 affine ``M`` maps OUTPUT
pixel coordinates to SOURCE coordinates' inverse the same way
``cv2.warpAffine`` does — i.e. ``M`` maps source->dest and we sample with
its inverse, bilinear, zero-padded borders.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _invert_affine(M: jax.Array) -> jax.Array:
    """Invert a (2, 3) affine like cv2.invertAffineTransform."""
    A = M[:, :2]
    t = M[:, 2]
    A_inv = jnp.linalg.inv(A)
    t_inv = -A_inv @ t
    return jnp.concatenate([A_inv, t_inv[:, None]], axis=1)


def affine_warp(images: jax.Array, M: jax.Array, output_shape) -> jax.Array:
    """Warp a batch of images with per-image 2x3 affines.

    ``images``: (B, H, W, C) float; ``M``: (B, 2, 3) source->dest affines in
    (x, y) convention; ``output_shape``: (out_h, out_w).  Bilinear sampling,
    zero outside the source.  Matches ``cv2.warpAffine(img, M, (w, h))``.
    """
    out_h, out_w = output_shape[:2]
    batch = images.shape[0]

    M_inv = jax.vmap(_invert_affine)(M.astype(jnp.float32))

    ys, xs = jnp.meshgrid(jnp.arange(out_h), jnp.arange(out_w), indexing="ij")
    dest = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=0).astype(jnp.float32)
    dest = jnp.concatenate([dest, jnp.ones((1, out_h * out_w), jnp.float32)], axis=0)

    # (B, 2, P): source (x, y) for each output pixel
    src = jnp.einsum("bij,jp->bip", M_inv, dest, precision=jax.lax.Precision.HIGHEST)

    h, w = images.shape[1:3]
    x, y = src[:, 0], src[:, 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    dx = (x - x0f)[..., None]
    dy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = images.reshape(batch, h * w, -1)

    def fetch(yy, xx):
        # zero-border bilinear (cv2 BORDER_CONSTANT 0): out-of-range corners
        # contribute nothing rather than clamping
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        values = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return values * inside[..., None].astype(values.dtype)

    top = fetch(y0, x0) * (1 - dx) + fetch(y0, x1) * dx
    bottom = fetch(y1, x0) * (1 - dx) + fetch(y1, x1) * dx
    sampled = top * (1 - dy) + bottom * dy

    return sampled.reshape(batch, out_h, out_w, images.shape[-1])
