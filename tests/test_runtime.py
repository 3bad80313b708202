import numpy as np

from confignet_tpu.runtime import gather_images, gather_rows, native_available


def test_native_builds():
    # the C++ library should compile on this machine (g++ available)
    assert native_available()


def test_gather_rows_matches_numpy(rng):
    data = rng.integers(0, 256, (20, 7, 5), dtype=np.uint8)
    idx = rng.integers(0, 20, 13)
    np.testing.assert_array_equal(gather_rows(data, idx), data[idx])


def test_gather_images_with_flip(rng):
    imgs = rng.integers(0, 256, (10, 6, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 10, 5)
    flips = np.array([1, 0, 1, 0, 1], np.uint8)
    out = gather_images(imgs, idx, flips)
    for i in range(5):
        expected = imgs[idx[i]]
        if flips[i]:
            expected = expected[:, ::-1]
        np.testing.assert_array_equal(out[i], expected)


def test_gather_images_memmap(tmp_path, rng):
    # memmap path: exactly how the dataset container stores images
    path = str(tmp_path / "imgs.dat")
    data = rng.integers(0, 256, (16, 4, 4, 3), dtype=np.uint8)
    mm = np.memmap(path, np.uint8, "w+", shape=data.shape)
    mm[:] = data
    mm.flush()
    ro = np.memmap(path, np.uint8, "r", shape=data.shape)
    idx = rng.integers(0, 16, 8)
    np.testing.assert_array_equal(gather_images(ro, idx), data[idx])


def test_numpy_fallback(monkeypatch, rng):
    monkeypatch.setenv("CONFIGNET_TPU_DISABLE_NATIVE", "1")
    import importlib

    from confignet_tpu.runtime import native

    importlib.reload(native)
    data = rng.integers(0, 256, (6, 3, 3, 3), dtype=np.uint8)
    idx = np.array([0, 5, 2])
    np.testing.assert_array_equal(native.gather_images(data, idx), data[idx])
    assert not native.native_available()
    monkeypatch.delenv("CONFIGNET_TPU_DISABLE_NATIVE")
    importlib.reload(native)
