"""Training orchestrators: ConfigNet stages, LatentGAN, attribute classifier."""
