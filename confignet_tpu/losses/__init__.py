from confignet_tpu.losses.gan import (
    gan_g_loss,
    gan_d_loss,
    eye_loss,
    r1_penalty,
    compute_discriminator_loss,
    compute_latent_discriminator_loss,
    latent_regression_loss,
    normalized_latent_regression_loss,
)

__all__ = [
    "gan_g_loss",
    "gan_d_loss",
    "eye_loss",
    "r1_penalty",
    "compute_discriminator_loss",
    "compute_latent_discriminator_loss",
    "latent_regression_loss",
    "normalized_latent_regression_loss",
]
