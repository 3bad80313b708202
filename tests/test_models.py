import numpy as np
import pytest

import jax
import jax.numpy as jnp

from confignet_tpu.models.blocks import MLP, AdaIN, ConvAdaIN, DiscrBlock
from confignet_tpu.models.discriminator import HologanDiscriminator, HologanLatentRegressor
from confignet_tpu.models.generator import HologanGenerator, build_input_dict
from confignet_tpu.models.synthetic_encoder import SyntheticDataEncoder

LATENT_DIM = 24


def test_mlp_structure():
    mlp = MLP(num_layers=3, num_hidden=16, num_out=4)
    variables = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    params = variables["params"]
    assert set(params.keys()) == {"dense_0", "dense_1", "dense_2"}
    assert params["dense_0"]["kernel"].shape == (8, 16)
    assert params["dense_2"]["kernel"].shape == (16, 4)
    out = mlp.apply(variables, jnp.ones((2, 8)))
    assert out.shape == (2, 4)


def test_adain_shapes():
    adain = AdaIN(num_features=6, mlp_num_units=8, mlp_num_layers=2)
    x = jnp.ones((2, 4, 4, 6))
    z = jnp.ones((2, LATENT_DIM))
    variables = adain.init(jax.random.PRNGKey(0), x, z)
    out = adain.apply(variables, x, z)
    assert out.shape == x.shape


def test_conv_adain_2d_3d():
    for rank, shape in [(2, (2, 8, 8, 3)), (3, (2, 4, 4, 4, 3))]:
        block = ConvAdaIN(num_feature_maps=5, kernel_size=3, rank=rank, mlp_num_units=8, mlp_num_layers=2)
        x = jnp.ones(shape)
        z = jnp.ones((2, LATENT_DIM))
        variables = block.init(jax.random.PRNGKey(0), x, z)
        out = block.apply(variables, x, z)
        assert out.shape == shape[:-1] + (5,)


def test_discr_block_styles():
    block = DiscrBlock(num_feature_maps=8, kernel_size=3, return_styles=True)
    x = jnp.ones((2, 16, 16, 3))
    variables = block.init(jax.random.PRNGKey(0), x)
    out, styles = block.apply(variables, x)
    assert out.shape == (2, 8, 8, 8)
    assert styles.shape == (2, 16)


@pytest.mark.parametrize("resolution,expected_extra", [(128, 0), (256, 1)])
def test_generator_output_shape(resolution, expected_extra):
    gen = HologanGenerator(latent_dim=LATENT_DIM, output_shape=(resolution, resolution))
    z = jnp.zeros((2, LATENT_DIM))
    rot = jnp.zeros((2, 3))
    variables = gen.init(jax.random.PRNGKey(0), z, rot)
    out = jax.jit(lambda v, z, r: gen.apply(v, z, r))(variables, z, rot)
    assert out.shape == (2, resolution, resolution, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0
    names = set(variables["params"].keys())
    assert ("map_2d_2b" in names) == (resolution > 128)


@pytest.mark.parametrize("shape", [(64, 64), (96, 96), (256, 128)])
def test_generator_rejects_unsupported_output_shape(shape):
    gen = HologanGenerator(latent_dim=LATENT_DIM, output_shape=shape)
    z = jnp.zeros((1, LATENT_DIM))
    rot = jnp.zeros((1, 3))
    with pytest.raises(ValueError, match="output_shape"):
        gen.init(jax.random.PRNGKey(0), z, rot)


def test_generator_latent_list_input():
    gen = HologanGenerator(latent_dim=LATENT_DIM, output_shape=(128, 128))
    z = jnp.zeros((1, LATENT_DIM))
    rot = jnp.zeros((1, 3))
    variables = gen.init(jax.random.PRNGKey(0), z, rot)
    zs = [z + i * 0.1 for i in range(5)]
    out = gen.apply(variables, build_input_dict(zs, rot))
    assert out.shape == (1, 128, 128, 3)
    # per-block latents must differ from the single-z path
    out_single = gen.apply(variables, build_input_dict(z, rot))
    assert not np.allclose(np.asarray(out), np.asarray(out_single))


def test_discriminator_heads():
    disc = HologanDiscriminator(img_shape=(64, 64), num_resample=3, disc_expansion_factor=8, disc_max_feature_maps=32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(variables, x)
    assert list(out.keys()) == ["discr_style_0", "discr_style_1", "discr_style_2", "discr_final"]
    for v in out.values():
        assert v.shape == (2, 1)


def test_latent_regressor_output():
    reg = HologanLatentRegressor(
        latent_dim=LATENT_DIM, img_shape=(64, 64), num_resample=3,
        disc_expansion_factor=8, disc_max_feature_maps=32,
    )
    x = jnp.zeros((2, 64, 64, 3))
    variables = reg.init(jax.random.PRNGKey(0), x)
    out = reg.apply(variables, x)
    assert out.shape == (2, LATENT_DIM + 3)


def test_synthetic_encoder_concat_and_split():
    inputs_spec = (
        ("alpha", (4, 3)),
        ("beta", (6, 5)),
    )
    enc = SyntheticDataEncoder(facemodel_inputs=inputs_spec)
    values = [jnp.ones((2, 4)), jnp.ones((2, 6))]
    variables = enc.init(jax.random.PRNGKey(0), values)
    out = enc.apply(variables, values)
    assert out.shape == (2, 8)

    stacked = jnp.concatenate(values, axis=1)
    out_stacked = enc.apply(variables, stacked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_stacked), atol=1e-6)

    # single-param encoding must match its slice of the full output
    single = enc.apply(variables, "beta", values[1], method=enc.encode_single_param)
    np.testing.assert_allclose(np.asarray(out[:, 3:8]), np.asarray(single), atol=1e-6)


def test_losses_sanity(rng):
    from confignet_tpu.losses import (
        compute_discriminator_loss,
        compute_latent_discriminator_loss,
        eye_loss,
        gan_d_loss,
        gan_g_loss,
        latent_regression_loss,
        normalized_latent_regression_loss,
    )

    scores = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    assert float(gan_g_loss(scores)) == pytest.approx(
        float(np.mean(np.log1p(np.exp(-np.asarray(scores))))), abs=1e-5
    )
    assert float(gan_d_loss(1.0, scores)) == pytest.approx(float(gan_g_loss(scores)), abs=1e-6)

    gt = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    gen = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    masks = jnp.asarray((rng.random((2, 8, 8)) > 0.5).astype(np.float32))
    el = float(eye_loss(gt, gen, masks))
    manual = np.mean(
        np.sum((np.asarray(gt - gen) * np.asarray(masks)[..., None]) ** 2, axis=(1, 2, 3))
        / (1 + np.asarray(masks).sum(axis=(1, 2)))
    )
    assert el == pytest.approx(manual, rel=1e-5)

    pred = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    labels = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    assert float(latent_regression_loss(pred, labels)) == pytest.approx(
        float(np.mean((np.asarray(pred) - np.asarray(labels)) ** 2)), rel=1e-5
    )
    norm_loss = float(normalized_latent_regression_loss(pred, labels, 10.0))
    assert np.isfinite(norm_loss) and norm_loss > 0

    # Discriminator loss with a linear toy discriminator: R1 analytically = 10*0.5*sum(w^2) per head.
    w = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    def toy_disc(x):
        flat = jnp.reshape(x, (x.shape[0], -1))
        return {"h0": flat @ w[:, None]}

    real = jnp.asarray(rng.normal(size=(3, 2, 2, 3)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(3, 2, 2, 3)).astype(np.float32))
    losses = compute_discriminator_loss(toy_disc, real, fake)
    assert float(losses["gp_loss_0"]) == pytest.approx(5.0 * float(jnp.sum(w ** 2)), rel=1e-5)
    assert set(losses.keys()) == {"GAN_loss_real_0", "GAN_loss_fake_0", "gp_loss_0", "loss_sum"}

    def toy_latent_disc(z):
        return z @ w[:7, None]

    lat_losses = compute_latent_discriminator_loss(toy_latent_disc, pred, labels)
    assert float(lat_losses["gp_loss"]) == pytest.approx(5.0 * float(jnp.sum(w[:7] ** 2)), rel=1e-5)


def test_r1_differentiable_wrt_params(rng):
    """R1 grad-of-grad must compose under jax.grad (discriminator update)."""
    from confignet_tpu.losses import compute_discriminator_loss

    real = jnp.asarray(rng.normal(size=(2, 2, 2, 1)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(2, 2, 2, 1)).astype(np.float32))

    def loss_of_w(w):
        def disc(x):
            flat = jnp.reshape(x, (x.shape[0], -1))
            return {"h": jnp.tanh(flat @ w)}

        return compute_discriminator_loss(disc, real, fake)["loss_sum"]

    w = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    g = jax.grad(loss_of_w)(w)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_generator_512_path():
    """The >256 branch adds map_2d_2c and yields 512px output."""
    gen = HologanGenerator(
        latent_dim=LATENT_DIM, output_shape=(512, 512),
        n_features_first=16, const_shape=(4, 4, 4, 8), n_adain_mlp_units=8,
    )
    z = jnp.zeros((1, LATENT_DIM))
    rot = jnp.zeros((1, 3))
    variables = gen.init(jax.random.PRNGKey(0), z, rot)
    names = set(variables["params"].keys())
    assert {"map_2d_2b", "map_2d_2c"} <= names
    out = gen.apply(variables, z, rot)
    assert out.shape == (1, 512, 512, 3)


def test_generator_bf16_matches_f32():
    """bf16 compute (incl. the bf16 feature-volume resample,
    models/generator.py) must stay close to the f32 image: bounds the
    numeric cost of the throughput mode."""
    import jax
    import jax.numpy as jnp
    from confignet_tpu.models.generator import HologanGenerator

    kw = dict(latent_dim=8, output_shape=(128, 128), n_adain_mlp_units=8,
              rotation_resample="gather")
    gen_f32 = HologanGenerator(**kw)
    gen_bf16 = HologanGenerator(dtype=jnp.bfloat16, **kw)

    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    rot = jax.random.uniform(jax.random.PRNGKey(2), (2, 3), minval=-0.4, maxval=0.4)
    params = gen_f32.init(jax.random.PRNGKey(0), z, rot)["params"]

    out_f32 = np.asarray(gen_f32.apply({"params": params}, z, rot), np.float32)
    out_bf16 = np.asarray(
        gen_bf16.apply({"params": params}, z, rot), np.float32
    )
    assert out_f32.shape == out_bf16.shape
    diff = np.abs(out_f32 - out_bf16)
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.99) < 0.1, np.quantile(diff, 0.99)
