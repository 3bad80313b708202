"""Flax model definitions: generator, discriminators, encoders and the
pretrained backbones used by losses and metrics."""
