"""HDRI illumination encoding: PCA model over log-domain environment maps."""
