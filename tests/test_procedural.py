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


def _named_blendshapes(**values):
    from confignet_tpu.metrics.blendshape_names import blendshape_names

    bs = np.zeros(len(blendshape_names), np.float32)
    for name, v in values.items():
        bs[blendshape_names.index(name)] = v
    return bs


def test_parameters_move_pixels():
    """The controllable parameters must actually change the render — a GAN
    can only learn (and FID can only detect) variation that exists.  The
    blendshape dims are addressed by the REFERENCE names so the Table-2
    controllability protocol drives real pixels on this family."""
    base = {
        "blendshape_values": _named_blendshapes(),
        "head_hair_color": np.array([0.1, 0.2, 0.3], np.float32),
        "eye_color": np.array([0.5, 0.5, 0.5], np.float32),
        "beard_style_embedding": np.full(9, -1.0, np.float32),
        "geometry_identity_params": np.zeros(4, np.float32),
    }
    img0, mask0 = _render_face(128, 0.0, 0.0, base, canvas_seed=1)

    jaw = dict(base, blendshape_values=_named_blendshapes(jaw_opening=1.0))
    img_jaw, _ = _render_face(128, 0.0, 0.0, jaw, canvas_seed=1)
    assert (img0 != img_jaw).any(), "jaw_opening must open the mouth"

    blink = dict(base, blendshape_values=_named_blendshapes(
        EyeBLinkLeft=0.9, EyeBLinkRight=0.9))
    img_blink, _ = _render_face(128, 0.0, 0.0, blink, canvas_seed=1)
    assert (img0 != img_blink).any(), "blink must narrow the eyes"

    hair = dict(base, head_hair_color=np.array([0.9, 0.1, 0.9], np.float32))
    img_hair, _ = _render_face(128, 0.0, 0.0, hair, canvas_seed=1)
    assert (img0 != img_hair).any(), "hair color must recolor the cap"

    tache = dict(base, beard_style_embedding=np.full(9, 1.5, np.float32))
    img_tache, _ = _render_face(128, 0.0, 0.0, tache, canvas_seed=1)
    assert (img0 != img_tache).any(), "the beard axis must draw a mustache"

    img_yaw, mask_yaw = _render_face(128, 0.5, 0.0, base, canvas_seed=1)
    assert (img0 != img_yaw).any(), "yaw must move the face"
    assert (mask0 != mask_yaw).any(), "yaw must move the eye mask"


def test_derived_attributes_cover_both_classes():
    """The procedural judge needs positives AND negatives for every driven
    attribute of the controllability protocol."""
    from confignet_tpu.data.procedural import ATTRIBUTE_NAMES

    ds = ProceduralFaceDataset(n_images=64, img_size=32, seed=11)
    labels = ds.get_attribute_values(range(64), ATTRIBUTE_NAMES)
    assert labels.shape == (64, 8)
    frac = labels.mean(axis=0)
    for name, f in zip(ATTRIBUTE_NAMES, frac):
        assert 0.02 < f < 0.98, f"{name} has a degenerate class balance ({f})"
    # hair labels are one-hot among the four colors
    assert np.all(labels[:, :4].sum(axis=1) == 1)


def test_deterministic_given_seed():
    a = ProceduralFaceDataset(n_images=3, img_size=32, seed=7)
    b = ProceduralFaceDataset(n_images=3, img_size=32, seed=7)
    np.testing.assert_array_equal(a.imgs, b.imgs)
    for name in a.metadata_inputs:
        np.testing.assert_array_equal(a.metadata_inputs[name], b.metadata_inputs[name])


def test_labels_agree_with_rendered_pixels():
    """Mustache / Narrow_Eyes labels must describe what _render_face draws
    (round-4 review: ~29% of faces rendered a faint mustache labeled 0, and
    a blink countered by EyeWide rendered open eyes labeled 'narrow')."""
    from confignet_tpu.data.procedural import derive_attributes

    base = {
        "blendshape_values": _named_blendshapes(),
        "head_hair_color": np.array([0.1, 0.2, 0.3], np.float32),
        "eye_color": np.array([0.5, 0.5, 0.5], np.float32),
        "geometry_identity_params": np.zeros(4, np.float32),
    }

    # Mustache: the render threshold IS the label threshold (beard0 = 0);
    # just below it nothing is drawn and the label is 0, just above both flip.
    for beard0, expect in [(-0.2, 0), (0.2, 1)]:
        beard = np.zeros(9, np.float32)
        beard[0] = beard0
        p = dict(base, beard_style_embedding=beard)
        assert derive_attributes(p)["Mustache"] == expect
    below = dict(base, beard_style_embedding=np.array([-0.2] + [0.0] * 8, np.float32))
    above = dict(base, beard_style_embedding=np.array([0.2] + [0.0] * 8, np.float32))
    none = dict(base, beard_style_embedding=np.array([-3.0] + [0.0] * 8, np.float32))
    img_below, _ = _render_face(128, 0.0, 0.0, below, canvas_seed=1)
    img_none, _ = _render_face(128, 0.0, 0.0, none, canvas_seed=1)
    img_above, _ = _render_face(128, 0.0, 0.0, above, canvas_seed=1)
    assert (img_below == img_none).all(), "label-0 face must not draw a mustache"
    assert (img_above != img_none).any(), "label-1 face must draw a mustache"

    # Narrow_Eyes follows the rendered eye opening: a strong blink counters
    # wide-open lids, so blink+wide is NOT narrow while blink alone is.
    beard_off = np.full(9, -3.0, np.float32)
    blink_only = dict(base, beard_style_embedding=beard_off,
                      blendshape_values=_named_blendshapes(
                          EyeBLinkLeft=0.6, EyeBLinkRight=0.6))
    blink_and_wide = dict(base, beard_style_embedding=beard_off,
                          blendshape_values=_named_blendshapes(
                              EyeBLinkLeft=0.6, EyeBLinkRight=0.6,
                              EyeWideLeft=1.0, EyeWideRight=1.0))
    assert derive_attributes(blink_only)["Narrow_Eyes"] == 1
    assert derive_attributes(blink_and_wide)["Narrow_Eyes"] == 0
