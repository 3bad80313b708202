"""ConfigNet-TPU: a TPU-native reimplementation of CONFIG (Controllable Neural
Face Image Generation, ECCV 2020) built on JAX/Flax/XLA/Pallas.

This package provides the same capabilities as the reference TensorFlow
implementation (microsoft/ConfigNet) redesigned for TPU hardware:

- Two-stage ConfigNet GAN training (``ConfigNetFirstStage`` / ``ConfigNet``)
  as single jitted, mesh-shardable train steps.
- ``LatentGAN`` sampler over the ConfigNet latent space.
- ``CelebaAttributeClassifier`` controllability judge.
- Dataset generation, face-image normalization, controllability and
  FID/KID metrics, HDRI PCA encoding and the interactive demo.

Public API mirrors the reference's ``confignet/__init__.py`` re-exports
(reference: confignet/__init__.py:4-14).
"""

__version__ = "0.1.0"

_LAZY_EXPORTS = {
    "ConfigNetFirstStage": "confignet_tpu.training.first_stage",
    "ConfigNet": "confignet_tpu.training.second_stage",
    "LatentGAN": "confignet_tpu.training.latent_gan",
    "CelebaAttributeClassifier": "confignet_tpu.metrics.celeba_attribute_prediction",
    "NeuralRendererDataset": "confignet_tpu.data.dataset",
    "FaceImageNormalizer": "confignet_tpu.data.normalizer",
    "ControllabilityMetrics": "confignet_tpu.metrics.controllability",
    "InceptionMetrics": "confignet_tpu.metrics.controllability",
    "ControllabilityMetricConfigs": "confignet_tpu.metrics.controllability_metric_configs",
    "load_confignet": "confignet_tpu.core.model_io",
    "ConfigNetServer": "confignet_tpu.serving",
}


def __getattr__(name):
    if name in _LAZY_EXPORTS:
        import importlib

        module = importlib.import_module(_LAZY_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'confignet_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY_EXPORTS.keys()))
