"""Data layer: landmark backends, face-image normalization, dataset
container, sampling distributions, CelebA attribute parsing."""
