"""ConfigNetServer: the fused encode -> splice -> generate serving pipeline."""
import numpy as np
import pytest

from helpers import TINY_FIRST_STAGE_CONFIG
from confignet_tpu.serving import ConfigNetServer
from confignet_tpu.training.second_stage import ConfigNet


@pytest.fixture(scope="module")
def server():
    model = ConfigNet(dict(TINY_FIRST_STAGE_CONFIG))
    return ConfigNetServer(model, chunk=4), model


def test_encode_generate_roundtrip(server):
    srv, model = server
    imgs = np.random.default_rng(0).integers(0, 256, (3, 128, 128, 3), dtype=np.uint8)
    latents, rotations = srv.encode(imgs)
    assert latents.shape == (3, model.config["latent_dim"])
    assert rotations.shape == (3, 3)

    out = srv.generate(latents, rotations)
    assert out.shape == (3, 128, 128, 3)
    assert out.dtype == np.uint8

    # matches the unfused reference-style API path.  Tolerances are
    # relative: the random-init ResNet trunk amplifies activations to ~1e5,
    # where conv tiling differences across batch shapes show at ~1e-3.
    lat_ref, rot_ref = model.encode_images(imgs)
    np.testing.assert_allclose(latents, lat_ref, rtol=2e-2)
    np.testing.assert_allclose(rotations, rot_ref, atol=1e-2)
    img_ref = model.generate_images(latents, rotations)
    assert np.mean(np.abs(out.astype(int) - img_ref.astype(int))) < 1.0


def test_render_with_attribute_fused(server):
    srv, model = server
    imgs = np.random.default_rng(1).integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    n_blend = model.config["facemodel_inputs"]["blendshape_values"][0]
    value = np.zeros((1, n_blend), np.float32)

    out = srv.render_with_attribute(imgs, "blendshape_values", value)
    assert out.shape == (2, 128, 128, 3) and out.dtype == np.uint8

    # equivalent unfused path
    latents, rotations = model.encode_images(imgs)
    latents = model.set_facemodel_param_in_latents(latents, "blendshape_values", value)
    ref = model.generate_images(latents, rotations)
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 1.0

    # fixed rotations override the encoder pose
    rot0 = np.zeros((2, 3), np.float32)
    out_rot = srv.render_with_attribute(imgs, "blendshape_values", value, rotations=rot0)
    assert out_rot.shape == (2, 128, 128, 3)


def test_padding_chunks(server):
    srv, _ = server
    imgs = np.random.default_rng(2).integers(0, 256, (5, 128, 128, 3), dtype=np.uint8)
    latents, rotations = srv.encode(imgs)  # 5 pads to 2 chunks of 4
    assert latents.shape[0] == 5 and rotations.shape[0] == 5


def test_sample_requires_latent_gan(server):
    srv, _ = server
    with pytest.raises(ValueError, match="LatentGAN"):
        srv.sample(2)


def test_sample_with_latent_gan(server):
    srv, model = server
    from confignet_tpu.training.latent_gan import LatentGAN

    gan = LatentGAN({"latent_dim": model.config["latent_dim"], "batch_size": 4})
    srv2 = ConfigNetServer(model, latent_gan=gan, chunk=4)
    out = srv2.sample(2, truncation=0.7)
    assert out.shape == (2, 128, 128, 3) and out.dtype == np.uint8


@pytest.mark.slow
def test_server_mesh_sharded():
    """ConfigNetServer over an 8-device data mesh: params replicated,
    chunks sharded; results match single-device serving."""
    import jax

    from confignet_tpu.parallel import create_mesh

    model = ConfigNet(dict(TINY_FIRST_STAGE_CONFIG))
    mesh = create_mesh(jax.devices()[:8])
    srv_mesh = ConfigNetServer(model, chunk=8, mesh=mesh)
    srv_one = ConfigNetServer(model, chunk=8)

    imgs = np.random.default_rng(7).integers(0, 256, (8, 128, 128, 3), dtype=np.uint8)
    lat_m, rot_m = srv_mesh.encode(imgs)
    lat_1, rot_1 = srv_one.encode(imgs)
    np.testing.assert_allclose(lat_m, lat_1, rtol=2e-2)
    np.testing.assert_allclose(rot_m, rot_1, atol=1e-2)

    out = srv_mesh.generate(lat_m, rot_m)
    assert out.shape == (8, 128, 128, 3) and out.dtype == np.uint8

    with pytest.raises(ValueError, match="divisible"):
        ConfigNetServer(model, chunk=6, mesh=mesh)


def test_render_with_attribute_per_image_values(server):
    """A per-image (n, k) attribute-value batch is chunked alongside the
    images (5 images cross the chunk=4 boundary) and each row is spliced
    into its own image's latent; a mismatched batch dim raises."""
    srv, model = server
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (5, 128, 128, 3), dtype=np.uint8)
    n_blend = model.config["facemodel_inputs"]["blendshape_values"][0]
    values = rng.normal(size=(5, n_blend)).astype(np.float32)

    out = srv.render_with_attribute(imgs, "blendshape_values", values)
    assert out.shape == (5, 128, 128, 3) and out.dtype == np.uint8

    # equivalent unfused path (set_facemodel_param_in_latents broadcasts
    # per-row when given a matching batch)
    latents, rotations = model.encode_images(imgs)
    latents = model.set_facemodel_param_in_latents(
        latents, "blendshape_values", values)
    ref = model.generate_images(latents, rotations)
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 1.0

    # rows must differ from a single broadcast row (values actually applied)
    out_bcast = srv.render_with_attribute(
        imgs, "blendshape_values", values[:1])
    assert not np.array_equal(out[1:], out_bcast[1:])

    with pytest.raises(ValueError, match="batch dim"):
        srv.render_with_attribute(imgs, "blendshape_values", values[:3])


def test_render_with_attribute_value_not_baked(server):
    """Two calls with different attribute values must not reuse the first
    value through the jit cache (values travel as arguments, not closure
    captures)."""
    srv, model = server
    imgs = np.random.default_rng(3).integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    n_blend = model.config["facemodel_inputs"]["blendshape_values"][0]

    out_zero = srv.render_with_attribute(
        imgs, "blendshape_values", np.zeros((1, n_blend), np.float32))
    out_one = srv.render_with_attribute(
        imgs, "blendshape_values", np.full((1, n_blend), 3.0, np.float32))
    assert not np.array_equal(out_zero, out_one)


def test_refresh_serves_new_weights(server):
    """Snapshot semantics: a server built before fine-tuning keeps serving
    the construction-time weights; refresh() re-snapshots and serves the
    fine-tuned generator."""
    srv, model = server
    latents = np.zeros((1, model.config["latent_dim"]), np.float32)
    rotations = np.zeros((1, 3), np.float32)
    before = srv.generate(latents, rotations)

    img = np.random.default_rng(7).integers(0, 256, (128, 128, 3), dtype=np.uint8)
    model.fine_tune_on_img(img, n_iters=2)

    stale = srv.generate(latents, rotations)
    np.testing.assert_array_equal(before, stale)  # documented: snapshot is fixed

    srv.refresh()
    fresh = srv.generate(latents, rotations)
    assert not np.array_equal(before, fresh)

    # restore the module-scoped fixture's state for other tests
    model._fine_tuned_generator_params = None
    srv.refresh()


def test_snapshot_survives_donated_train_step(server):
    """The trainer's fused step donates model.state
    (jax.jit(..., donate_argnums=(0,)) in first_stage.py), deleting the old
    buffers.  The server must have COPIED its snapshot at refresh() time,
    not aliased those buffers, or serve-after-train raises on deleted
    arrays instead of rendering the documented construction-time weights."""
    import jax

    srv, model = server
    latents = np.zeros((1, model.config["latent_dim"]), np.float32)
    rotations = np.zeros((1, 3), np.float32)
    before = srv.generate(latents, rotations)

    # Donate the state exactly as the fused train step does; the old
    # buffers backing model.state (and any aliases) are deleted.
    model.state = jax.jit(lambda s: jax.tree_util.tree_map(lambda x: x + 0, s),
                          donate_argnums=(0,))(model.state)

    after = srv.generate(latents, rotations)  # must not raise
    np.testing.assert_array_equal(before, after)
