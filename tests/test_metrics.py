import os

import numpy as np
import pytest

from helpers import FakeDataset, FakeDistribution, TINY_FIRST_STAGE_CONFIG


def test_fid_kid_semantics(rng):
    from confignet_tpu.metrics.inception import compute_FID, compute_KID

    a = rng.normal(size=(64, 16)).astype(np.float32)
    b = rng.normal(size=(64, 16)).astype(np.float32)

    # identical sets -> FID ~ 0 (up to scipy sqrtm numerics).  KID's unbiased
    # estimator subtracts the diagonal only from the within-set terms, so for
    # x == y it comes out slightly NEGATIVE — same as the reference's
    # formulation (inception_distance.py:45-59).
    assert abs(compute_FID(a, a)) < 0.5
    assert compute_KID(a, a) < 0.0
    # distinct same-distribution sets: near zero
    assert abs(compute_KID(a, b)) < 0.5

    shifted = a + 3.0
    assert compute_FID(shifted, a) > compute_FID(b, a) * 0 + 5.0
    assert compute_KID(shifted, a) > 0.1

    # KID matches sklearn's polynomial kernel formulation
    from sklearn.metrics.pairwise import polynomial_kernel

    k_ab = polynomial_kernel(a, b, degree=3, coef0=1.0)
    from confignet_tpu.metrics.inception import _poly_kernel

    np.testing.assert_allclose(_poly_kernel(a, b), k_ab, rtol=1e-5)


def test_inception_feature_extractor_shapes(rng):
    from confignet_tpu.metrics.inception import InceptionFeatureExtractor

    extractor = InceptionFeatureExtractor((128, 128, 3))
    imgs = rng.integers(0, 256, (3, 128, 128, 3), dtype=np.uint8)
    feats = extractor.get_features(imgs, max_chunk_size=2)
    assert feats.shape == (3, 2048)
    assert np.all(np.isfinite(feats))
    # deterministic
    np.testing.assert_array_equal(feats, extractor.get_features(imgs, max_chunk_size=2))


ATTRS = sorted(
    [
        "Black_Hair", "Blond_Hair", "Brown_Hair", "Gray_Hair",
        "Mouth_Slightly_Open", "Narrow_Eyes", "Smiling", "Mustache",
        "No_Beard", "Goatee", "Sideburns",
    ]
)


@pytest.fixture(scope="module")
def classifier():
    from confignet_tpu.metrics.celeba_attribute_prediction import CelebaAttributeClassifier

    return CelebaAttributeClassifier(
        {"input_shape": (64, 64, 3), "predicted_attributes": ATTRS}
    )


@pytest.mark.slow
def test_attribute_classifier_train_and_predict(classifier, tmp_path, rng):
    class AttrDataset(FakeDataset):
        pass

    ds = FakeDataset(n_images=8, img_size=64, with_attributes=False)
    ds.attributes = [{n: int(rng.random() > 0.5) for n in ATTRS} for _ in range(8)]

    classifier.train(ds, ds, str(tmp_path), n_epochs=2, steps_per_epoch=2)
    assert len(classifier.logs["val_binary_accuracy"]) == 2
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoints", "0001.json"))
    assert os.path.exists(os.path.join(str(tmp_path), "logs.txt"))

    probs = classifier.predict_attributes(
        rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    )
    assert probs.shape == (3, len(ATTRS))
    assert probs.min() >= 0 and probs.max() <= 1

    # resize path: different input resolution
    probs2 = classifier.predict_attributes(
        rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    )
    assert probs2.shape == (2, len(ATTRS))


@pytest.mark.slow
def test_attribute_classifier_save_load(classifier, tmp_path, rng):
    classifier.save(str(tmp_path), "clf")
    from confignet_tpu.metrics.celeba_attribute_prediction import CelebaAttributeClassifier

    loaded = CelebaAttributeClassifier.load(os.path.join(str(tmp_path), "clf.json"))
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        classifier.predict_attributes(imgs), loaded.predict_attributes(imgs), atol=1e-5
    )


def test_controllability_configs_complete():
    from confignet_tpu.metrics.controllability_metric_configs import (
        ControllabilityMetricConfigs,
    )

    configs = ControllabilityMetricConfigs.all_configs()
    assert len(configs) == 8
    names = [name for name, _ in configs]
    assert names == sorted(names)
    drivens = {c.driven_attribute for _, c in configs}
    assert drivens == {
        "Black_Hair", "Blond_Hair", "Brown_Hair", "Gray_Hair",
        "Mouth_Slightly_Open", "Smiling", "Narrow_Eyes", "Mustache",
    }


def test_blendshape_names_layout():
    from confignet_tpu.metrics.blendshape_names import blendshape_names

    assert len(blendshape_names) == 62
    assert blendshape_names[-1] == "jaw_opening"
    assert "mouthSmileLeft" in blendshape_names


@pytest.mark.slow
def test_controllability_metrics_end_to_end(classifier, rng, tmp_path):
    from confignet_tpu.metrics.controllability import ControllabilityMetrics
    from confignet_tpu.training.second_stage import ConfigNet

    config = dict(TINY_FIRST_STAGE_CONFIG)
    config["facemodel_inputs"] = {
        "blendshape_values": (62, 6),
        "head_hair_color": (3, 4),
        "beard_style_embedding": (9, 4),
    }
    model = ConfigNet(config)
    model.facemodel_param_distributions = {
        "blendshape_values": FakeDistribution(rng.random((4, 62)).astype(np.float32)),
        "head_hair_color": FakeDistribution(rng.random((4, 3)).astype(np.float32)),
        "beard_style_embedding": FakeDistribution(rng.normal(size=(4, 9)).astype(np.float32)),
    }

    metrics_obj = ControllabilityMetrics(model, classifier)
    imgs = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    metrics = metrics_obj.get_metrics(imgs)

    assert "contr_attribute_means" in metrics
    assert "controllability" in metrics
    assert len(metrics["contr_attribute_means"]) == 4
    assert np.isfinite(metrics["controllability"])
    assert len([k for k in metrics if k.endswith("_config")]) == 8

    history = {"training_step_number": [0]}
    metrics_obj.update_and_log_metrics(imgs, history, str(tmp_path))
    assert os.path.exists(os.path.join(str(tmp_path), "controllability_metrics.json"))


def test_fid_lowrank_matches_dense(rng):
    """compute_FID's small-sample Gram path (n < dim, the training-cadence
    shape) must equal the dense covariance formulation exactly."""
    from confignet_tpu.metrics.inception import _trace_sqrt_product, compute_FID

    # n << d, asymmetric counts (64 generated vs 96 cached GT features)
    a = rng.normal(size=(64, 256)).astype(np.float32)
    b = rng.normal(size=(96, 256)).astype(np.float32) * 1.3 - 0.2

    lowrank = compute_FID(a, b)

    cov_a, cov_b = np.cov(a, rowvar=False), np.cov(b, rowvar=False)
    mean_dist = float(np.linalg.norm(a.mean(0) - b.mean(0)) ** 2)
    dense = mean_dist + float(np.trace(cov_a + cov_b)) \
        - 2.0 * _trace_sqrt_product(cov_a, cov_b)

    np.testing.assert_allclose(lowrank, dense, rtol=1e-6)


def test_fid_eigh_matches_sqrtm(rng):
    """The eigh-based trace-of-sqrt-product must equal the reference's
    scipy.linalg.sqrtm formulation on PSD covariances."""
    import scipy.linalg

    from confignet_tpu.metrics.inception import _trace_sqrt_product

    a = rng.normal(size=(40, 12)).astype(np.float64)
    b = rng.normal(size=(50, 12)).astype(np.float64) * 1.7 + 0.3
    cov_a, cov_b = np.cov(a, rowvar=False), np.cov(b, rowvar=False)
    ours = _trace_sqrt_product(cov_a, cov_b)
    ref = float(np.real(np.trace(scipy.linalg.sqrtm(cov_a @ cov_b))))
    np.testing.assert_allclose(ours, ref, rtol=1e-8)
