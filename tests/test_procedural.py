"""Procedural face dataset (data/procedural.py) — the trainer-facing duck
type used for training-quality evidence runs."""
import numpy as np

from confignet_tpu.data.procedural import (
    FACEMODEL_DIMS,
    ProceduralFaceDataset,
    _render_face,
)


def test_dataset_duck_type():
    ds = ProceduralFaceDataset(n_images=6, img_size=64, seed=3)
    assert ds.imgs.shape == (6, 64, 64, 3) and ds.imgs.dtype == np.uint8
    assert ds.eye_masks.shape == (6, 64, 64)
    assert ds.eye_masks.any(), "eye masks must mark the eye pixels"
    for name, dim in FACEMODEL_DIMS.items():
        assert ds.metadata_inputs[name].shape == (6, dim)
        sampled, _ = ds.metadata_input_distributions[name].sample(4)
        assert sampled.shape == (4, dim)
    assert ds.metadata_inputs["rotations"].shape == (6, 3)
    assert np.all(np.abs(ds.metadata_inputs["rotations"][:, 0]) <= np.pi / 6 + 1e-6)
    cfg = ds.facemodel_inputs_config()
    assert set(cfg) == set(FACEMODEL_DIMS)


def test_parameters_move_pixels():
    """The controllable parameters must actually change the render — a GAN
    can only learn (and FID can only detect) variation that exists."""
    base = {
        "blendshape_values": np.zeros(8, np.float32),
        "head_hair_color": np.array([0.1, 0.2, 0.3], np.float32),
        "eye_color": np.array([0.5, 0.5, 0.5], np.float32),
        "geometry_identity_params": np.zeros(4, np.float32),
    }
    img0, mask0 = _render_face(128, 0.0, 0.0, base, canvas_seed=1)

    jaw = dict(base, blendshape_values=np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32))
    img_jaw, _ = _render_face(128, 0.0, 0.0, jaw, canvas_seed=1)
    assert (img0 != img_jaw).any(), "jaw_open must open the mouth"

    hair = dict(base, head_hair_color=np.array([0.9, 0.1, 0.9], np.float32))
    img_hair, _ = _render_face(128, 0.0, 0.0, hair, canvas_seed=1)
    assert (img0 != img_hair).any(), "hair color must recolor the cap"

    img_yaw, mask_yaw = _render_face(128, 0.5, 0.0, base, canvas_seed=1)
    assert (img0 != img_yaw).any(), "yaw must move the face"
    assert (mask0 != mask_yaw).any(), "yaw must move the eye mask"


def test_deterministic_given_seed():
    a = ProceduralFaceDataset(n_images=3, img_size=32, seed=7)
    b = ProceduralFaceDataset(n_images=3, img_size=32, seed=7)
    np.testing.assert_array_equal(a.imgs, b.imgs)
    for name in a.metadata_inputs:
        np.testing.assert_array_equal(a.metadata_inputs[name], b.metadata_inputs[name])
