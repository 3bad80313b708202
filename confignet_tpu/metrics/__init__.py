"""GAN metrics: FID/KID, controllability, attribute classification."""
