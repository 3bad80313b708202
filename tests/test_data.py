import json
import os

import numpy as np
import pytest

from confignet_tpu.data.celeba import parse_celeba_attribute_file
from confignet_tpu.data.distributions import (
    ExemplarDistribution,
    GaussianDistribution,
    OneHotDistribution,
    fit_distribution,
)
from confignet_tpu.data.landmarks import (
    FakeLandmarkBackend,
    read_estimated_intrinsics,
    read_landmarks_and_pose_from_csv,
)
from confignet_tpu.data.normalizer import (
    FaceImageNormalizer,
    euler_matrix_rxyz,
    get_similarity_transform,
)


def _write_face_image(path, size=200, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 100, (size, size, 3), dtype=np.uint8)
    cv2.ellipse(img, (size // 2, size // 2), (size // 3, size // 2 - 10), 0, 0, 360,
                (180, 150, 120), -1)
    cv2.imwrite(path, img)
    return img


def _make_metadata(seed=0, head_pose=(0.0, 0.0, 0.0)):
    rng = np.random.default_rng(seed)
    blend_names = [f"shape_{i}" for i in range(5)]
    return {
        "blendshape_values": {n: float(rng.random()) for n in blend_names},
        "bone_rotations": {
            "neck": [0.0, 0.0, 0.0],
            "head": list(head_pose),
            "jaw": [float(rng.random() * 0.1), 0.0, 0.0],
            "left_eye": [0.0, 0.0, 0.0],
            "right_eye": [0.0, 0.0, 0.0],
        },
        "geometry_identity_params": [float(x) for x in rng.normal(size=6)],
        "texture_embedding": [float(x) for x in rng.normal(size=4)],
        "head_hair_style": rng.choice(["spiky", "bald", None]).tolist()
        if False else ["spiky", "bald", None][seed % 3],
        "head_hair_color": {"melanin": 0.5, "redness": 0.3, "greyness": 0.0},
    }


# ---------------------------------------------------------------------------


def test_distributions(rng):
    one_hot = OneHotDistribution()
    one_hot.fit(np.eye(4, dtype=np.float32))
    samples, idx = one_hot.sample(10)
    assert samples.shape == (10, 4)
    np.testing.assert_array_equal(samples.sum(axis=1), np.ones(10))

    data = rng.normal(size=(20, 3)).astype(np.float32)
    ex = ExemplarDistribution()
    ex.fit(data)
    samples, _ = ex.sample(5)
    for s in samples:
        assert any(np.allclose(s, row) for row in data)

    gauss = GaussianDistribution()
    gauss.fit(data)
    samples, _ = gauss.sample(1000)
    assert samples.shape == (1000, 3)
    np.testing.assert_allclose(samples.mean(axis=0), data.mean(axis=0), atol=0.3)

    assert isinstance(fit_distribution(data, "GMM"), GaussianDistribution)
    assert isinstance(fit_distribution(data, "exemplar"), ExemplarDistribution)


def test_celeba_parse(tmp_path):
    path = os.path.join(str(tmp_path), "list_attr_celeba.txt")
    with open(path, "w") as fp:
        fp.write("2\n")
        fp.write("Smiling Mustache\n")
        fp.write("img1.jpg 1 -1\n")
        fp.write("img2.jpg -1 1\n")
    attrs = parse_celeba_attribute_file(path)
    assert attrs["img1"] == {"Smiling": 1, "Mustache": 0}
    assert attrs["img2"] == {"Smiling": 0, "Mustache": 1}


def test_similarity_transform_recovers_known(rng):
    src = rng.normal(size=(5, 2)).astype(np.float64)
    angle, scale = 0.4, 1.7
    R = scale * np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
    t_true = np.array([3.0, -2.0])
    dst = src @ R.T + t_true
    A, t = get_similarity_transform(dst, src)
    np.testing.assert_allclose(A, R, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_euler_matrix_rxyz_orthonormal():
    R = euler_matrix_rxyz(0.3, -0.2, 0.5)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) == pytest.approx(1.0)
    np.testing.assert_allclose(euler_matrix_rxyz(0, 0, 0), np.eye(3), atol=1e-12)


def test_fake_landmark_backend_and_csv_roundtrip(tmp_path):
    d = str(tmp_path)
    _write_face_image(os.path.join(d, "img_000.png"))
    FakeLandmarkBackend().detect_dir(d)

    csv_path = os.path.join(d, "processed", "img_000.csv")
    assert os.path.exists(csv_path)
    landmarks, landmarks_3d, pose = read_landmarks_and_pose_from_csv(csv_path)
    assert landmarks.shape == (68, 2)
    assert landmarks_3d.shape == (68, 3)
    assert pose.shape == (6,)
    K = read_estimated_intrinsics(os.path.join(d, "processed", "img_000_of_details.txt"))
    assert K.shape == (3, 3) and K[0, 0] > 0

    # idempotent: a second run is a no-op (sentinel)
    FakeLandmarkBackend().detect_dir(d)


def test_normalize_individual_image(tmp_path):
    import cv2

    img = _write_face_image(os.path.join(str(tmp_path), "src.png"))
    normalized = FaceImageNormalizer.normalize_individual_image(
        img, (64, 64), landmark_backend="fake"
    )
    assert normalized is not None
    assert normalized.shape == (64, 64, 3)


def test_generate_and_load_dataset(tmp_path):
    """Full real-image dataset build through the fake landmark backend."""
    from confignet_tpu.data.dataset import NeuralRendererDataset

    data_dir = os.path.join(str(tmp_path), "data")
    os.makedirs(data_dir)
    for i in range(3):
        _write_face_image(os.path.join(data_dir, f"img_{i:03d}.png"), seed=i)
    with open(os.path.join(data_dir, "list_attr_celeba.txt"), "w") as fp:
        fp.write("3\nSmiling Mustache\n")
        for i in range(3):
            fp.write(f"img_{i:03d}.png 1 -1\n")

    out_path = os.path.join(str(tmp_path), "ds_res_64.pck")
    dataset = NeuralRendererDataset((64, 64, 3), is_synthetic=False)
    dataset.generate_face_dataset(
        data_dir, out_path,
        attribute_label_file_path=os.path.join(data_dir, "list_attr_celeba.txt"),
        pre_normalize=True, landmark_backend="fake",
        compute_inception_features=False,
    )
    assert os.path.exists(out_path)
    assert os.path.exists(os.path.join(str(tmp_path), "ds_res_64_imgs.dat"))

    loaded = NeuralRendererDataset.load(out_path)
    assert loaded.imgs.shape == (3, 64, 64, 3)
    assert loaded.attributes[0] == {"Smiling": 1, "Mustache": 0}
    np.testing.assert_array_equal(
        loaded.get_attribute_values([0, 1], ["Mustache"]), [[0], [0]]
    )


def test_synthetic_dataset_metadata_processing(tmp_path):
    from confignet_tpu.data.dataset import NeuralRendererDataset

    data_dir = os.path.join(str(tmp_path), "data")
    os.makedirs(data_dir)
    # synth pose axis order is (y, x, z) relative to ConfigNet's; axis 1 maps
    # to the (0, 0) roll range so it must be exactly 0 to survive filtering
    poses = [(0.0, 0.0, 0.0), (0.01, 0.0, -0.01), (2.0, 0.0, 0.0)]  # last out of range
    for i, pose in enumerate(poses):
        _write_face_image(os.path.join(data_dir, f"img_{i:03d}.png"), seed=i)
        with open(os.path.join(data_dir, f"meta_{i:03d}.json"), "w") as fp:
            json.dump(_make_metadata(seed=i, head_pose=pose), fp)

    out_path = os.path.join(str(tmp_path), "synth_res_64.pck")
    dataset = NeuralRendererDataset((64, 64, 3), is_synthetic=True)
    dataset.generate_face_dataset(
        data_dir, out_path, pre_normalize=False, landmark_backend="fake",
        compute_inception_features=False,
    )
    # the out-of-range head pose got rejected
    assert dataset.imgs.shape[0] == 2
    assert dataset.eye_masks.shape == (2, 64, 64)

    config = {
        "facemodel_inputs": {
            "blendshape_values": (None, 6),
            "head_hair_style": (None, 2),
            "texture_embedding": (None, 4),
            "bone_rotations:left_eye": (None, 2),
        }
    }
    dataset.process_metadata(config, update_config=True)
    # dict input: 5 blendshapes + appended jaw_opening = 6 dims
    assert config["facemodel_inputs"]["blendshape_values"][0] == 6
    assert dataset.metadata_input_labels["blendshape_values"][-1] == "jaw_opening"
    # string input -> one-hot over unique values
    n_styles = config["facemodel_inputs"]["head_hair_style"][0]
    assert dataset.metadata_inputs["head_hair_style"].shape == (2, n_styles)
    # list input keeps its length
    assert config["facemodel_inputs"]["texture_embedding"][0] == 4
    # nested key access via ':'
    assert dataset.metadata_inputs["bone_rotations:left_eye"].shape == (2, 3)
    # rotations reordered [2, 0, 1]
    assert dataset.metadata_inputs["rotations"].shape == (2, 3)
    meta_head = np.array([(0.0, 0.0, 0.0), (0.01, 0.0, -0.01)])
    np.testing.assert_allclose(
        dataset.metadata_inputs["rotations"], meta_head[:, [2, 0, 1]], atol=1e-6
    )
    # distributions are samplable
    samples, _ = dataset.metadata_input_distributions["blendshape_values"].sample(4)
    assert samples.shape == (4, 6)

    # save/load roundtrip preserves processed metadata
    dataset.save(out_path)
    loaded = NeuralRendererDataset.load(out_path)
    assert loaded.metadata_inputs["rotations"].shape == (2, 3)
    s, _ = loaded.metadata_input_distributions["head_hair_style"].sample(2)
    assert s.shape[1] == n_styles


def test_batch_prefetcher_order_and_close():
    """BatchPrefetcher yields sampled batches in order, stages them as jax
    arrays, propagates sampler errors, and shuts down cleanly."""
    import jax
    import numpy as np

    from confignet_tpu.data.prefetch import BatchPrefetcher

    counter = {"n": 0}

    def sample():
        i = counter["n"]
        counter["n"] += 1
        return {"idx": np.full((2,), i, np.int32), "imgs": np.zeros((2, 4, 4, 3), np.uint8)}

    with BatchPrefetcher(sample, depth=2) as pf:
        for expect in range(5):
            batch = pf.next()
            assert isinstance(batch["idx"], jax.Array)
            assert int(batch["idx"][0]) == expect

    def bad_sample():
        raise ValueError("boom")

    pf = BatchPrefetcher(bad_sample)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        pf.next()
    # every subsequent call re-raises too (a dead worker must never leave
    # the consumer blocking on an empty queue)
    with _pytest.raises(ValueError, match="boom"):
        pf.next()
    pf.close()
