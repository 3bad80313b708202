import os

import numpy as np
import pytest

from confignet_tpu.hdri.pca import (
    HDRIModelPCA,
    WhitenedPCA,
    apply_random_rotations,
    rotate_hdri,
)


def _fake_hdris(n=4, h=32, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish positive HDR data
    base = rng.random((n, h, w, 3)).astype(np.float32) * 3
    return base


def test_whitened_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    X = rng.normal(size=(30, 10)).astype(np.float64)
    ours = WhitenedPCA(4).fit(X)
    sk = PCA(4, svd_solver="full", whiten=True).fit(X)

    np.testing.assert_allclose(ours.explained_variance_, sk.explained_variance_, rtol=1e-5)
    # components may differ in sign
    z_ours = ours.transform(X)
    z_sk = sk.transform(X)
    signs = np.sign(np.sum(z_ours * z_sk, axis=0))
    np.testing.assert_allclose(z_ours * signs, z_sk, atol=1e-4)
    np.testing.assert_allclose(ours.inverse_transform(z_ours), sk.inverse_transform(z_sk), atol=1e-4)


def test_pca_variance_fraction_selection(rng):
    X = rng.normal(size=(50, 8)) * np.array([10, 5, 2, 1, 0.1, 0.05, 0.01, 0.01])
    pca = WhitenedPCA(0.95).fit(X)
    assert 1 <= pca.components_.shape[0] < 8


def test_rotate_hdri_roll():
    img = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    rotated = rotate_hdri(img, 90)  # 90 deg = 2 columns of 8
    np.testing.assert_array_equal(rotated, np.roll(img, 2, axis=1))
    np.testing.assert_array_equal(rotate_hdri(img, 360), img)


def test_hdri_model_roundtrip(tmp_path):
    np.random.seed(0)
    hdris = _fake_hdris(6)
    model = HDRIModelPCA((16, 32), n_rotations_per_image=3)
    model.fit(hdris, n_components=10)

    encoded = model.transform(hdris)
    assert encoded.shape == (6, 10)
    decoded = model.inverse_transform(encoded)
    assert decoded.shape == (6, 16, 32, 3)

    # transform(inverse_transform(z)) is idempotent to high precision
    re_encoded = model.transform(decoded)
    np.testing.assert_allclose(re_encoded, encoded, atol=1e-3)

    path = os.path.join(str(tmp_path), "hdri_model.pck")
    model.save(path)
    loaded = HDRIModelPCA.load(path)
    np.testing.assert_allclose(loaded.transform(hdris), encoded, atol=1e-5)


def test_turntable_cli(tmp_path):
    import cv2

    from confignet_tpu.hdri import cli

    np.random.seed(0)
    hdri_dir = os.path.join(str(tmp_path), "hdris")
    os.makedirs(hdri_dir)
    for i, img in enumerate(_fake_hdris(3, 32, 64)):
        cv2.imwrite(os.path.join(hdri_dir, f"env_{i}.hdr"), img)

    out_dir = os.path.join(str(tmp_path), "model_out")
    cli.build_model([
        "--hdri_dir", hdri_dir, "--output_dir", out_dir, "--n_components", "5",
        "--output_shape", "16", "32", "--n_rotations_per_image", "2",
    ])
    model_path = os.path.join(out_dir, "hdri_model.pck")
    assert os.path.exists(model_path)
    assert os.path.exists(os.path.join(out_dir, "pca_basis", "000.png"))

    turntable_path = os.path.join(str(tmp_path), "turntable.npy")
    cli.generate_turntable([
        "--hdri_file_path", os.path.join(hdri_dir, "env_0.hdr"),
        "--hdri_model_path", model_path,
        "--output_file_path", turntable_path,
        "--n_hdri_rotations", "12",
    ])
    embeddings = np.load(turntable_path)
    assert embeddings.shape == (12, 5)
    # rotations produce varying embeddings
    assert embeddings.std(axis=0).mean() > 1e-3


def test_shipped_hdri_model_asset():
    """assets/hdri_model.pck loads and embeds to the 50-dim hdri_embedding
    schema (the reference's own asset is a missing large blob; ours is
    regenerated — see setup/generate_hdri_model_asset.py)."""
    from confignet_tpu.hdri.pca import HDRIModelPCA

    path = os.path.join(os.path.dirname(__file__), "..", "assets", "hdri_model.pck")
    model = HDRIModelPCA.load(path)
    assert model.pca_model.components_.shape[0] == 50

    rng = np.random.default_rng(3)
    hdris = rng.uniform(0, 4, size=(2, 64, 128, 3)).astype(np.float32)
    emb = model.transform(hdris)
    assert emb.shape == (2, 50)
    rec = model.inverse_transform(emb)
    assert rec.shape == (2, 64, 128, 3)
    assert np.all(np.isfinite(rec))
