"""Pretrained-style backbone architectures (VGG, ResNet50, InceptionV3,
MobileNetV2) as Flax modules, with import shims for externally supplied
weights.

No weight files ship with this repo (the build environment has no network
egress); backbones initialize deterministically from a fixed seed and can be
upgraded in place via :func:`confignet_tpu.models.backbones.loader.load_keras_h5_weights`
when the standard Keras ``.h5`` files are available.
"""
