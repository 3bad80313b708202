"""The package-level public API mirrors the reference's re-exports."""


def test_lazy_exports():
    import confignet_tpu

    assert confignet_tpu.ConfigNetFirstStage.MODEL_TYPE == "ConfigNetFirstStage"
    assert confignet_tpu.ConfigNet.MODEL_TYPE == "ConfigNet"
    assert confignet_tpu.LatentGAN.MODEL_TYPE == "LatentGAN"
    assert confignet_tpu.CelebaAttributeClassifier.MODEL_TYPE == "CelebaAttributeClassifier"
    assert hasattr(confignet_tpu.NeuralRendererDataset, "generate_face_dataset")
    assert hasattr(confignet_tpu.FaceImageNormalizer, "normalize_individual_image")
    assert hasattr(confignet_tpu.ControllabilityMetrics, "get_metrics")
    assert hasattr(confignet_tpu.InceptionMetrics, "get_metrics")
    assert len(confignet_tpu.ControllabilityMetricConfigs.all_configs()) == 8
    assert callable(confignet_tpu.load_confignet)


def test_dir_lists_exports():
    import confignet_tpu

    names = dir(confignet_tpu)
    for expected in ("ConfigNet", "LatentGAN", "NeuralRendererDataset"):
        assert expected in names
