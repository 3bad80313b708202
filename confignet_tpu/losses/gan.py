"""GAN and auxiliary losses as pure functions.

Reference: confignet/losses.py.  The R1 gradient penalty is computed with
``jax.vjp`` against the discriminator input; because ``vjp`` is itself
differentiable, the grad-of-grad needed when optimizing the discriminator
parameters composes cleanly under ``jit`` — the JAX-native replacement for
the reference's persistent ``GradientTape`` (losses.py:26-47).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def gan_g_loss(scores: jax.Array) -> jax.Array:
    """Non-saturating generator loss (losses.py:7-8)."""
    return jnp.mean(jax.nn.softplus(-scores))


def gan_d_loss(labels, scores: jax.Array) -> jax.Array:
    """Label-weighted softplus discriminator loss (losses.py:10-11)."""
    labels = jnp.asarray(labels, dtype=scores.dtype)
    return jnp.mean(labels * jax.nn.softplus(-scores) + (1.0 - labels) * jax.nn.softplus(scores))


def eye_loss(gt_imgs: jax.Array, gen_imgs: jax.Array, eye_masks: jax.Array) -> jax.Array:
    """Masked MSE over the eye region, normalized per image by mask area
    (losses.py:13-18).  ``eye_masks`` is (B, H, W) in {0, 1}."""
    masks = eye_masks.astype(gt_imgs.dtype)
    img_diff = (gt_imgs - gen_imgs) * masks[..., None]
    per_img = jnp.sum(jnp.square(img_diff), axis=(1, 2, 3)) / (1.0 + jnp.sum(masks, axis=(1, 2)))
    return jnp.mean(per_img)


def r1_penalty(gradients: jax.Array) -> jax.Array:
    """R1 penalty: 10 * 0.5 * mean_b ||grad_b||^2 (losses.py:75-82)."""
    sq = jnp.square(gradients)
    per_sample = jnp.sum(jnp.reshape(sq, (sq.shape[0], -1)), axis=1)
    return 10.0 * 0.5 * jnp.mean(per_sample)


def compute_discriminator_loss(
    discriminator_fn: Callable[[jax.Array], Dict[str, jax.Array]],
    real_imgs: jax.Array,
    fake_imgs: jax.Array,
    r1_heads: str = "all",
) -> Dict[str, jax.Array]:
    """Full multi-head discriminator loss: per-head GAN loss on real & fake
    plus R1 on real inputs (losses.py:20-47).

    ``discriminator_fn`` maps images to an ordered dict of logits.

    ``r1_heads``: "all" penalizes every head like the reference; "final"
    applies R1 only to the last (full-image) head — the common single-head
    R1 recipe (Mescheder et al.).  On TPU the per-head pullbacks fuse well
    under XLA, so this is a regularization-behavior option rather than a
    speed knob.
    """
    out_real, pullback = jax.vjp(discriminator_fn, real_imgs)
    out_fake = discriminator_fn(fake_imgs)

    losses: Dict[str, jax.Array] = {}
    # Head order comes from the DIRECT call: jax.vjp rebuilds its output
    # pytree with sorted dict keys, which would put "discr_final" first and
    # misalign the per-head loss indices vs the reference's insertion-order
    # enumeration (losses.py:32-43).
    head_keys = list(out_fake.keys())

    for i, key in enumerate(head_keys):
        losses[f"GAN_loss_real_{i}"] = gan_d_loss(1.0, out_real[key])
    for i, key in enumerate(head_keys):
        losses[f"GAN_loss_fake_{i}"] = gan_d_loss(0.0, out_fake[key])

    if r1_heads == "all":
        r1_keys = head_keys
    elif r1_heads == "final":
        r1_keys = head_keys[-1:]
    else:
        raise ValueError(f"unknown r1_heads mode {r1_heads!r}")

    for key in r1_keys:
        i = head_keys.index(key)
        cotangent = {
            k: jnp.ones_like(v) if k == key else jnp.zeros_like(v)
            for k, v in out_real.items()
        }
        (grads_wrt_input,) = pullback(cotangent)
        losses[f"gp_loss_{i}"] = r1_penalty(grads_wrt_input)

    losses["loss_sum"] = sum(losses.values())
    return losses


def compute_latent_discriminator_loss(
    latent_discriminator_fn: Callable[[jax.Array], jax.Array],
    real_latents: jax.Array,
    fake_latents: jax.Array,
) -> Dict[str, jax.Array]:
    """Single-head latent discriminator loss with R1 (losses.py:49-73)."""
    out_real, pullback = jax.vjp(latent_discriminator_fn, real_latents)
    out_fake = latent_discriminator_fn(fake_latents)

    losses: Dict[str, jax.Array] = {}
    losses["GAN_loss_real"] = gan_d_loss(1.0, out_real)
    losses["GAN_loss_fake"] = gan_d_loss(0.0, out_fake)
    (grads_wrt_input,) = pullback(jnp.ones_like(out_real))
    losses["gp_loss"] = r1_penalty(grads_wrt_input)
    losses["loss_sum"] = sum(losses.values())
    return losses


def latent_regression_loss(predictions: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain MSE between regressor output and (latent, weighted rotation)
    labels (losses.py:85-90)."""
    return jnp.mean(jnp.square(predictions - labels))


def normalized_latent_regression_loss(
    predictions: jax.Array,
    labels: jax.Array,
    regression_weight: float,
    eps: float = 1e-3,
) -> jax.Array:
    """Variance-normalized latent regression used by the second stage
    (reference: confignet_second_stage.py:93-107).

    Both predictions and labels are re-centered and scaled by the label
    std-dev per dimension (rotations, the last 3 dims, are left unscaled).
    """
    denominator = jnp.sqrt(jnp.var(labels, axis=0, keepdims=True) + eps)
    denominator = jnp.concatenate(
        [denominator[:, :-3], jnp.ones((1, 3), dtype=denominator.dtype)], axis=1
    )

    pred_mean = jnp.mean(predictions, axis=0)
    label_mean = jnp.mean(labels, axis=0)
    predictions = pred_mean + (predictions - pred_mean) / denominator
    labels = label_mean + (labels - label_mean) / denominator

    loss = jnp.mean(jnp.square(predictions - labels))
    return loss * regression_weight
