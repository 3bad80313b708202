"""Cross-framework numerical parity: the ORIGINAL TensorFlow reference models
vs our Flax ports, with weights transferred through
``confignet_tpu.core.reference_import``.

This is the composed-model contract test the reference pins with pretrained
checkpoints (reference: tests/inference_test.py:23-52).  No pretrained
weights exist in this environment, so instead we instantiate the actual
reference Keras model classes (under legacy Keras 2 via tf_keras), randomize
their weights, export ``get_weights()`` exactly the way reference
checkpoints are written (confignet_first_stage.py:129-139,173-175), import
through the weight-order declarations in ``reference_import.py``, and assert
matching outputs.  Any drift in layer semantics, epsilon, activation slope,
padding, or weight ordering turns these red.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from tests.tf_reference import load_ref_module, randomize_tf_weights

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from confignet_tpu.core import reference_import as ri

pytestmark = pytest.mark.tf_parity


def _to_np(x):
    return np.asarray(jax.device_get(x))


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def _generator_parity(output_size: int, batch: int, latent_dim: int = 16,
                      mlp_units: int = 32) -> None:
    ref_gen_mod = load_ref_module("dnn_models.hologan_generator")
    rng = np.random.default_rng(output_size)
    z = rng.normal(size=(batch, latent_dim)).astype(np.float32)
    rot = rng.uniform(-0.5, 0.5, size=(batch, 3)).astype(np.float32)

    tf_gen = ref_gen_mod.HologanGenerator(
        latent_dim, (output_size, output_size, 3), mlp_units, 2, "tanh")
    inputs_tf = tf_gen.build_input_dict(tf.constant(z), tf.constant(rot))
    tf_gen(inputs_tf)  # build
    randomize_tf_weights(tf_gen, seed=output_size + 1)
    # The learned-input kernel is dead (multiplied by a zeros vector); keep it
    # zero as in any real checkpoint — the importer refuses nonzero values.
    wl = tf_gen.get_weights()
    wl[0] = np.zeros_like(wl[0])
    tf_gen.set_weights(wl)
    out_tf = tf_gen(inputs_tf).numpy()

    from confignet_tpu.models.generator import HologanGenerator, build_input_dict

    gen = HologanGenerator(
        latent_dim=latent_dim, output_shape=(output_size, output_size),
        n_adain_mlp_units=mlp_units, n_adain_mlp_layers=2,
        rotation_resample="gather")
    inputs = build_input_dict(jnp.asarray(z), jnp.asarray(rot))
    params = gen.init(jax.random.PRNGKey(0), inputs)["params"]
    params = ri.assign_weight_list(
        params, wl, ri.generator_weight_paths(output_size), "generator")
    out_jax = _to_np(gen.apply({"params": params}, inputs))

    assert out_jax.shape == out_tf.shape == (batch, output_size, output_size, 3)
    np.testing.assert_allclose(out_jax, out_tf, atol=5e-4)


def test_generator_parity_128():
    _generator_parity(128, batch=2)


@pytest.mark.slow
def test_generator_parity_256():
    _generator_parity(256, batch=1)


@pytest.mark.slow
def test_generator_parity_512():
    _generator_parity(512, batch=1)


# ---------------------------------------------------------------------------
# Discriminator / latent regressor
# ---------------------------------------------------------------------------

_DISCR_KW = dict(num_resample=3, disc_max_feature_maps=64,
                 disc_kernel_size=3, disc_expansion_factor=8,
                 initial_from_rgb_layer_in_discr=True)


def test_discriminator_parity():
    ref_mod = load_ref_module("dnn_models.hologan_discriminator")
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)

    tf_disc = ref_mod.HologanDiscriminator(img_shape=(32, 32), **_DISCR_KW)
    tf_disc(tf.constant(img))
    randomize_tf_weights(tf_disc, seed=2)
    out_tf = {k: v.numpy() for k, v in tf_disc(tf.constant(img)).items()}

    from confignet_tpu.models.discriminator import HologanDiscriminator

    disc = HologanDiscriminator(
        img_shape=(32, 32), num_resample=3, disc_kernel_size=3,
        disc_expansion_factor=8, disc_max_feature_maps=64,
        initial_from_rgb_layer_in_discr=True)
    params = disc.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]

    wl = tf_disc.get_weights()
    # Resolve the Keras list-attribute ordering by measurement: exactly one
    # of the two declared orders must fit the shapes.
    try:
        params = ri.assign_weight_list(
            params, wl, ri.discriminator_weight_paths(3, True, "grouped"),
            "discriminator")
    except (ValueError, KeyError):
        params = ri.assign_weight_list(
            params, wl, ri.discriminator_weight_paths(3, True, "interleaved"),
            "discriminator")

    out_jax = disc.apply({"params": params}, jnp.asarray(img))
    assert set(out_jax) == set(out_tf)
    for key in out_tf:
        np.testing.assert_allclose(
            _to_np(out_jax[key]), out_tf[key], atol=1e-3, rtol=1e-4,
            err_msg=key)


def test_latent_regressor_parity():
    ref_mod = load_ref_module("dnn_models.hologan_discriminator")
    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    latent_dim = 16

    tf_reg = ref_mod.HologanLatentRegressor(latent_dim, img_shape=(32, 32), **_DISCR_KW)
    tf_reg(tf.constant(img))
    randomize_tf_weights(tf_reg, seed=4)
    out_tf = tf_reg(tf.constant(img)).numpy()

    from confignet_tpu.models.discriminator import HologanLatentRegressor

    reg = HologanLatentRegressor(
        latent_dim=latent_dim, img_shape=(32, 32), num_resample=3,
        disc_kernel_size=3, disc_expansion_factor=8, disc_max_feature_maps=64,
        initial_from_rgb_layer_in_discr=True)
    params = reg.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = ri.assign_weight_list(
        params, tf_reg.get_weights(), ri.latent_regressor_weight_paths(3, True),
        "latent_regressor")
    out_jax = _to_np(reg.apply({"params": params}, jnp.asarray(img)))
    np.testing.assert_allclose(out_jax, out_tf, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Synthetic encoder + generic MLP (covers the LatentGAN nets)
# ---------------------------------------------------------------------------

def test_synthetic_encoder_parity():
    from collections import OrderedDict

    ref_mod = load_ref_module("dnn_models.synthetic_encoder")
    spec = OrderedDict([("blendshape_values", (4, 6)),
                        ("eye_color", (3, 4)),
                        ("hair_color", (3, 6))])
    rng = np.random.default_rng(5)
    inputs = {k: rng.normal(size=(2, dims[0])).astype(np.float32)
              for k, dims in spec.items()}

    tf_enc = ref_mod.SyntheticDataEncoder(spec, num_layers=2)
    tf_enc({k: tf.constant(v) for k, v in inputs.items()})
    randomize_tf_weights(tf_enc, seed=6)
    out_tf = tf_enc({k: tf.constant(v) for k, v in inputs.items()}).numpy()

    from confignet_tpu.models.synthetic_encoder import SyntheticDataEncoder

    enc = SyntheticDataEncoder(facemodel_inputs=tuple(spec.items()), num_layers=2)
    jx = {k: jnp.asarray(v) for k, v in inputs.items()}
    params = enc.init(jax.random.PRNGKey(0), jx)["params"]
    params = ri.assign_weight_list(
        params, tf_enc.get_weights(),
        ri.synthetic_encoder_weight_paths(tuple(spec.items()), 2),
        "synthetic_encoder")
    out_jax = _to_np(enc.apply({"params": params}, jx))
    np.testing.assert_allclose(out_jax, out_tf, atol=1e-4, rtol=1e-4)


def test_mlp_parity():
    """MLPSimple vs blocks.MLP — the shared building block of the latent
    discriminator and both LatentGAN networks (latent_gan.py:88-110)."""
    ref_mod = load_ref_module("dnn_models.building_blocks")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 16)).astype(np.float32)

    keras = tf.keras
    tf_mlp = ref_mod.MLPSimple(num_layers=4, num_in=16, num_hidden=32,
                               num_out=16, non_linear=keras.layers.LeakyReLU,
                               non_linear_last=None)
    tf_mlp(tf.constant(x))
    randomize_tf_weights(tf_mlp, seed=8)
    out_tf = tf_mlp(tf.constant(x)).numpy()

    from confignet_tpu.models.blocks import MLP

    mlp = MLP(num_layers=4, num_hidden=32, num_out=16)
    params = mlp.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = ri.assign_weight_list(
        params, tf_mlp.get_weights(), ri.mlp_weight_paths(4), "mlp")
    out_jax = _to_np(mlp.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out_jax, out_tf, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Real encoder (ResNet50 trunk + heads)
# ---------------------------------------------------------------------------

def test_real_encoder_parity(monkeypatch):
    ref_mod = load_ref_module("dnn_models.real_encoder")
    # No egress: force weights=None instead of the ImageNet download.
    orig_ctor = ref_mod.resnet50.ResNet50
    monkeypatch.setattr(
        ref_mod.resnet50, "ResNet50",
        lambda **kw: orig_ctor(**{**kw, "weights": None}))

    rng = np.random.default_rng(9)
    img = rng.uniform(-1, 1, size=(2, 128, 128, 3)).astype(np.float32)
    latent_dim = 16
    rotation_ranges = ((-30, 30), (-10, 10), (0, 0))

    tf_enc = ref_mod.RealEncoder(latent_dim, (128, 128, 3), rotation_ranges)
    tf_enc(tf.constant(img))
    randomize_tf_weights(tf_enc, seed=10)
    emb_tf, rot_tf = tf_enc(tf.constant(img))

    from confignet_tpu.models.real_encoder import RealEncoder

    enc = RealEncoder(latent_dim=latent_dim, rotation_ranges=rotation_ranges)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = ri.assign_weight_list(
        params, tf_enc.get_weights(), ri.real_encoder_weight_paths(),
        "real_encoder")
    emb_jax, rot_jax = enc.apply({"params": params}, jnp.asarray(img))

    np.testing.assert_allclose(_to_np(emb_jax), emb_tf.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(_to_np(rot_jax), rot_tf.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Perceptual losses (VGG19 / VGGFace VGG16) through the h5 loader
# ---------------------------------------------------------------------------

def _perceptual_parity(tmp_path, monkeypatch, model_type: str, arch_builder):
    ref_pl = load_ref_module("perceptual_loss")
    keras = tf.keras

    h5_path = str(tmp_path / f"{model_type}.h5")

    tf_backbone = arch_builder(weights=None, include_top=False,
                               input_shape=(64, 64, 3))
    randomize_tf_weights(tf_backbone, seed=11)
    tf_backbone.save_weights(h5_path)

    if model_type == "imagenet":
        monkeypatch.setattr(
            keras.applications.vgg19, "VGG19",
            lambda **kw: arch_builder(**{**kw, "weights": None}) if "weights" in kw
            else arch_builder(weights=None, **kw))
        # Give the reference model our randomized weights.
        pl_tf = ref_pl.PerceptualLoss((64, 64, 3), model_type="imagenet")
        pl_tf._pretrained_dnn_activations.load_weights(h5_path, by_name=True)
    else:
        monkeypatch.setattr(keras.utils, "get_file", lambda *a, **k: h5_path)
        monkeypatch.setattr(
            keras.applications.vgg16, "VGG16",
            lambda **kw: arch_builder(weights=None, **kw))
        pl_tf = ref_pl.PerceptualLoss((64, 64, 3), model_type="VGGFace")

    rng = np.random.default_rng(12)
    pred = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    data = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    loss_tf = float(pl_tf.loss(tf.constant(pred), tf.constant(data)).numpy())

    from confignet_tpu.losses.perceptual import PerceptualLoss

    pl = PerceptualLoss((64, 64, 3), model_type=model_type)
    pl.load_keras_weights(h5_path)
    loss_jax = float(pl.loss(jnp.asarray(pred), jnp.asarray(data)))

    np.testing.assert_allclose(loss_jax, loss_tf, rtol=1e-4)

    # Tap activations must match individually, not just in aggregate.
    acts_tf = pl_tf._pretrained_dnn_activations(
        pl_tf._preprocess_input(tf.constant(pred)))
    acts_jax = pl.activations(pl.variables["params"], jnp.asarray(pred))
    assert len(acts_tf) == len(acts_jax) == 4
    for a_tf, a_jax in zip(acts_tf, acts_jax):
        np.testing.assert_allclose(
            _to_np(a_jax), a_tf.numpy(), atol=1e-3, rtol=1e-3)


def test_perceptual_vgg19_parity(tmp_path, monkeypatch):
    _perceptual_parity(tmp_path, monkeypatch, "imagenet",
                       tf.keras.applications.vgg19.VGG19)


def test_perceptual_vggface_parity(tmp_path, monkeypatch):
    _perceptual_parity(tmp_path, monkeypatch, "VGGFace",
                       tf.keras.applications.vgg16.VGG16)


# ---------------------------------------------------------------------------
# Full reference-format checkpoint import (npz + json), end to end
# ---------------------------------------------------------------------------

@pytest.mark.slow
def _build_matched_first_stage(tmp_path, stage2=False):
    """Build the full set of TF reference models with random weights, write
    them as a reference-format checkpoint
    (confignet_first_stage.py:129-139,173-175; second stage adds the real
    encoder, confignet_second_stage.py:35-43), and load it through
    ``load_reference_confignet`` — returning both sides with identical
    weights for composed-model parity tests."""
    from collections import OrderedDict

    gen_mod = load_ref_module("dnn_models.hologan_generator")
    disc_mod = load_ref_module("dnn_models.hologan_discriminator")
    synth_mod = load_ref_module("dnn_models.synthetic_encoder")
    bb_mod = load_ref_module("dnn_models.building_blocks")
    keras = tf.keras

    facemodel_inputs = OrderedDict(
        [("blendshape_values", (4, 6)), ("eye_color", (3, 4)),
         ("hair_color", (3, 6))])
    latent_dim = 16
    size = 128

    tf_gen = gen_mod.HologanGenerator(latent_dim, (size, size, 3), 32, 2, "tanh")
    tf_gen_s = gen_mod.HologanGenerator(latent_dim, (size, size, 3), 32, 2, "tanh")
    discr_kw = dict(img_shape=(size, size), num_resample=3,
                    disc_max_feature_maps=64, disc_kernel_size=3,
                    disc_expansion_factor=8,
                    initial_from_rgb_layer_in_discr=True)
    tf_disc = disc_mod.HologanDiscriminator(**discr_kw)
    tf_synth_disc = disc_mod.HologanDiscriminator(**discr_kw)
    tf_reg = disc_mod.HologanLatentRegressor(latent_dim, **discr_kw)
    tf_latent_disc = bb_mod.MLPSimple(
        num_layers=3, num_in=latent_dim, num_hidden=latent_dim, num_out=1,
        non_linear=keras.layers.LeakyReLU, non_linear_last=None)
    tf_synth_enc = synth_mod.SyntheticDataEncoder(facemodel_inputs, num_layers=2)

    rng = np.random.default_rng(13)
    z = rng.normal(size=(2, latent_dim)).astype(np.float32)
    rot = rng.uniform(-0.4, 0.4, size=(2, 3)).astype(np.float32)
    img = rng.uniform(-1, 1, size=(2, size, size, 3)).astype(np.float32)

    # Build + randomize.
    for i, (model, inp) in enumerate([
            (tf_gen, tf_gen.build_input_dict(tf.constant(z), tf.constant(rot))),
            (tf_gen_s, tf_gen_s.build_input_dict(tf.constant(z), tf.constant(rot))),
            (tf_disc, tf.constant(img)), (tf_synth_disc, tf.constant(img)),
            (tf_reg, tf.constant(img)), (tf_latent_disc, tf.constant(z)),
            (tf_synth_enc, {k: tf.constant(rng.normal(size=(2, d[0])).astype(np.float32))
                            for k, d in facemodel_inputs.items()})]):
        model(inp)
        randomize_tf_weights(model, seed=20 + i)

    for tf_g in (tf_gen, tf_gen_s):
        wl = tf_g.get_weights()
        wl[0] = np.zeros_like(wl[0])
        tf_g.set_weights(wl)

    tf_encoder = None
    if stage2:
        enc_mod = load_ref_module("dnn_models.real_encoder")
        orig_resnet = enc_mod.resnet50.ResNet50
        enc_mod.resnet50.ResNet50 = (
            lambda **kw: orig_resnet(**{**kw, "weights": None}))
        try:
            tf_encoder = enc_mod.RealEncoder(
                latent_dim, (size, size, 3), ((-30, 30), (-10, 10), (0, 0)))
            tf_encoder(tf.constant(img))
        finally:
            enc_mod.resnet50.ResNet50 = orig_resnet
        randomize_tf_weights(tf_encoder, seed=30)

    config = {
        "model_type": "ConfigNet" if stage2 else "ConfigNetFirstStage",
        "output_shape": (size, size, 3),
        "n_adain_mlp_units": 32,
        "n_adain_mlp_layers": 2,
        "n_discr_layers": 3,
        "max_discr_filters": 64,
        "n_discr_features_at_layer_0": 8,
        "discr_conv_kernel_size": 3,
        "initial_from_rgb_layer_in_discr": True,
        "n_latent_discr_layers": 3,
        "num_synth_encoder_layers": 2,
        "facemodel_inputs": {k: list(v) for k, v in facemodel_inputs.items()},
        "batch_size": 2,
        "perceptual_taps": (1, 2),
        "rotation_resample": "gather",
    }
    json_path = str(tmp_path / "model.json")
    with open(json_path, "w") as fp:
        json.dump(config, fp)
    extra = {}
    if stage2:
        extra["real_encoder_weights"] = np.array(
            tf_encoder.get_weights(), dtype=object)
    np.savez(
        str(tmp_path / "model.npz"),
        **extra,
        generator_weights=np.array(tf_gen.get_weights(), dtype=object),
        generator_smoothed_weights=np.array(tf_gen_s.get_weights(), dtype=object),
        discriminator_weights=np.array(tf_disc.get_weights(), dtype=object),
        synth_discriminator_weights=np.array(tf_synth_disc.get_weights(), dtype=object),
        latent_regressor_weights=np.array(tf_reg.get_weights(), dtype=object),
        latent_discriminator_weights=np.array(tf_latent_disc.get_weights(), dtype=object),
        synthetic_encoder_weights=np.array(tf_synth_enc.get_weights(), dtype=object),
    )

    model = ri.load_reference_confignet(json_path)
    return dict(
        model=model, config=config, facemodel_inputs=facemodel_inputs,
        latent_dim=latent_dim, size=size, z=z, rot=rot, img=img,
        tf_gen=tf_gen, tf_gen_s=tf_gen_s, tf_disc=tf_disc,
        tf_synth_disc=tf_synth_disc, tf_reg=tf_reg,
        tf_latent_disc=tf_latent_disc, tf_synth_enc=tf_synth_enc,
        tf_encoder=tf_encoder,
    )


@pytest.fixture(scope="module")
def matched_first_stage(tmp_path_factory):
    return _build_matched_first_stage(tmp_path_factory.mktemp("refckpt"))


@pytest.mark.slow
def test_reference_checkpoint_import_end_to_end(matched_first_stage):
    """Generated images from the imported checkpoint must match the TF
    generator (the composed-model contract of reference
    tests/inference_test.py:23-52)."""
    m = matched_first_stage
    out_tf = m["tf_gen_s"](
        m["tf_gen_s"].build_input_dict(tf.constant(m["z"]), tf.constant(m["rot"]))
    ).numpy()
    out_jax = _to_np(m["model"].generator_module_ft.apply(
        {"params": m["model"].state.generator_smoothed},
        jnp.asarray(m["z"]), jnp.asarray(m["rot"])))
    np.testing.assert_allclose(out_jax, out_tf, atol=5e-4)


@pytest.mark.slow
def test_g_step_loss_parity(matched_first_stage, tmp_path, monkeypatch):
    """The COMPLETE generator-step loss assembly vs the reference
    (confignet_first_stage.py:506-554): perceptual + eye + per-head GAN on
    both discriminators + domain-adversarial latent GAN + latent
    regression, with every sub-model's weights transferred from the same
    TF instances.  The TF side mirrors the reference tape body line by
    line (the reference computes it inside a method of its god-class)."""
    from tests.tf_reference import load_ref_module as _lrm

    m = matched_first_stage
    model = m["model"]
    keras = tf.keras
    ref_losses = _lrm("losses")
    size = m["size"]

    # Shared VGG19 weights for the perceptual loss, taps (1, 2) as in the
    # imported config (reference uses fixed taps [1,2,8,13]; the tap SET is
    # config here, the math is identical and pinned by test_perceptual_*).
    vgg = keras.applications.vgg19.VGG19(weights=None, include_top=False,
                                         input_shape=(size, size, 3))
    randomize_tf_weights(vgg, seed=77)
    h5_path = str(tmp_path / "vgg19.h5")
    vgg.save_weights(h5_path)
    model.perceptual_loss.load_keras_weights(h5_path)
    tf_acts = keras.Model(vgg.input, [vgg.layers[i].output for i in (1, 2)])

    def tf_perceptual(a, b):  # mirror reference perceptual_loss.py:42-82
        pa = keras.applications.vgg19.preprocess_input((a + 1) * 127.5)
        pb = keras.applications.vgg19.preprocess_input((b + 1) * 127.5)
        terms = []
        for act_a, act_b in zip(tf_acts(pa), tf_acts(pb)):
            terms.append(tf.reduce_mean(tf.losses.mean_squared_error(
                tf.reshape(act_a, [-1]), tf.reshape(act_b, [-1]))))
        return tf.reduce_mean(tf.add_n(terms))

    rng = np.random.default_rng(55)
    n_synth, n_real = 2, 2
    facemodel = [rng.normal(size=(n_synth, d[0])).astype(np.float32)
                 for d in m["facemodel_inputs"].values()]
    synth_rot = rng.uniform(-0.3, 0.3, size=(n_synth, 3)).astype(np.float32)
    gt_u8 = rng.integers(0, 256, size=(n_synth, size, size, 3)).astype(np.uint8)
    gt = gt_u8.astype(np.float32) / 127.5 - 1.0
    eye_masks = (rng.uniform(size=(n_synth, size, size)) > 0.8).astype(np.float32)
    z_real = rng.normal(size=(n_real, m["latent_dim"])).astype(np.float32)
    rot_real = rng.uniform(-0.3, 0.3, size=(n_real, 3)).astype(np.float32)

    cfg = model.config

    # ---- TF side: mirror of generator_training_step's tape body ----
    tf_fm = {k: tf.constant(v) for k, v in
             zip(m["facemodel_inputs"].keys(), facemodel)}
    synth_latents_tf = m["tf_synth_enc"](tf_fm)
    out_synth_tf = m["tf_gen"]((synth_latents_tf, tf.constant(synth_rot)))
    out_real_tf = m["tf_gen"]((tf.constant(z_real), tf.constant(rot_real)))

    losses_tf = {}
    losses_tf["image_loss"] = cfg["image_loss_weight"] * tf_perceptual(
        tf.constant(gt), out_synth_tf)
    losses_tf["eye_loss"] = cfg["eye_loss_weight"] * ref_losses.eye_loss(
        tf.constant(gt), out_synth_tf, eye_masks)
    for i, head in enumerate(m["tf_synth_disc"](out_synth_tf).values()):
        losses_tf[f"GAN_loss_synth_{i}"] = ref_losses.GAN_G_loss(head)
    for i, head in enumerate(m["tf_disc"](out_real_tf).values()):
        losses_tf[f"GAN_loss_real_{i}"] = ref_losses.GAN_G_loss(head)
    losses_tf["latent_GAN_loss"] = cfg["domain_adverserial_loss_weight"] *         ref_losses.GAN_G_loss(m["tf_latent_disc"](synth_latents_tf))
    stacked_lat = tf.concat((synth_latents_tf, tf.constant(z_real)), axis=0)
    stacked_img = tf.concat((out_synth_tf, out_real_tf), axis=0)
    stacked_rot = tf.concat((tf.constant(synth_rot), tf.constant(rot_real)), axis=0)
    labels_tf = tf.concat(
        (stacked_lat, cfg["latent_regressor_rot_weight"] * stacked_rot), axis=-1)
    losses_tf["latent_regression_loss"] = cfg["latent_regression_weight"] *         ref_losses.compute_latent_regression_loss(stacked_img, labels_tf, m["tf_reg"])
    losses_tf["loss_sum"] = tf.add_n(list(losses_tf.values()))

    # ---- our side: the same assembly through the model's pure helpers
    # (identical code path to the fused step's g_step_losses) ----
    batch = {
        "g_facemodel": tuple(jnp.asarray(f) for f in facemodel),
        "g_rotations": jnp.asarray(synth_rot),
        "g_gt_imgs": jnp.asarray(gt_u8),
        "g_eye_masks": jnp.asarray(eye_masks),
    }
    vgg_params = model.perceptual_loss.variables["params"]
    gen_player = model.state.generator.params
    synth_latents = model._synth_enc_apply(gen_player["synthetic_encoder"],
                                           batch["g_facemodel"])
    out_synth = model._gen_apply(gen_player["generator"], synth_latents,
                                 batch["g_rotations"])
    out_real = model._gen_apply(gen_player["generator"], jnp.asarray(z_real),
                                jnp.asarray(rot_real))
    from confignet_tpu.losses import gan as our_losses

    losses_jax = {}
    gt_jax = batch["g_gt_imgs"].astype(jnp.float32) / 127.5 - 1.0
    losses_jax["image_loss"] = cfg["image_loss_weight"] *         model.perceptual_loss.loss_fn(vgg_params, gt_jax, out_synth)
    losses_jax["eye_loss"] = cfg["eye_loss_weight"] * our_losses.eye_loss(
        gt_jax, out_synth, batch["g_eye_masks"])
    for i, head in enumerate(model._synth_disc_apply(
            model.state.synth_discriminator.params, out_synth).values()):
        losses_jax[f"GAN_loss_synth_{i}"] = our_losses.gan_g_loss(head)
    for i, head in enumerate(model._disc_apply(
            model.state.discriminator.params, out_real).values()):
        losses_jax[f"GAN_loss_real_{i}"] = our_losses.gan_g_loss(head)
    losses_jax["latent_GAN_loss"] = cfg["domain_adverserial_loss_weight"] *         our_losses.gan_g_loss(model._latent_disc_apply(
            model.state.latent_discriminator.params, synth_latents))
    stacked_lat_j = jnp.concatenate([synth_latents, jnp.asarray(z_real)], axis=0)
    stacked_img_j = jnp.concatenate([out_synth, out_real], axis=0)
    stacked_rot_j = jnp.concatenate(
        [batch["g_rotations"], jnp.asarray(rot_real)], axis=0)
    labels_j = jnp.concatenate(
        [stacked_lat_j, cfg["latent_regressor_rot_weight"] * stacked_rot_j], axis=-1)
    reg_out = model._regressor_apply(gen_player["latent_regressor"], stacked_img_j)
    losses_jax["latent_regression_loss"] = cfg["latent_regression_weight"] *         our_losses.latent_regression_loss(reg_out, labels_j)
    losses_jax["loss_sum"] = sum(losses_jax.values())

    assert set(losses_jax) == set(losses_tf)
    for key in losses_tf:
        np.testing.assert_allclose(
            float(losses_jax[key]), float(losses_tf[key].numpy()),
            rtol=1e-2, atol=1e-4, err_msg=f"G-step loss {key}")


# ---------------------------------------------------------------------------
# Loss functions vs the reference TF implementations (losses.py)
# ---------------------------------------------------------------------------

def test_elementwise_losses_parity():
    """gan_g_loss / gan_d_loss / eye_loss vs reference losses.py:7-18."""
    ref_losses = load_ref_module("losses")
    from confignet_tpu.losses import gan as our

    rng = np.random.default_rng(21)
    scores = rng.normal(size=(8, 1)).astype(np.float32) * 3.0
    labels = rng.integers(0, 2, size=(8, 1)).astype(np.float32)

    np.testing.assert_allclose(
        float(our.gan_g_loss(jnp.asarray(scores))),
        float(ref_losses.GAN_G_loss(tf.constant(scores)).numpy()), rtol=1e-6)
    np.testing.assert_allclose(
        float(our.gan_d_loss(jnp.asarray(labels), jnp.asarray(scores))),
        float(ref_losses.GAN_D_loss(tf.constant(labels), tf.constant(scores)).numpy()),
        rtol=1e-6)

    gt = rng.uniform(-1, 1, size=(4, 16, 16, 3)).astype(np.float32)
    gen = rng.uniform(-1, 1, size=(4, 16, 16, 3)).astype(np.float32)
    masks = (rng.uniform(size=(4, 16, 16)) > 0.7).astype(np.float32)
    np.testing.assert_allclose(
        float(our.eye_loss(jnp.asarray(gt), jnp.asarray(gen), jnp.asarray(masks))),
        float(ref_losses.eye_loss(tf.constant(gt), tf.constant(gen), masks).numpy()),
        rtol=1e-5)


def _linear_multihead_weights(rng, in_dim, n_heads):
    return [rng.normal(size=(in_dim, 1)).astype(np.float32) * 0.3
            for _ in range(n_heads)], [rng.normal(size=(1,)).astype(np.float32)
                                       for _ in range(n_heads)]


def test_discriminator_loss_parity():
    """compute_discriminator_loss incl. per-head R1 grad-of-input penalties
    vs reference losses.py:20-47, using an analytically-identical linear
    multi-head discriminator on both sides."""
    import collections

    ref_losses = load_ref_module("losses")
    from confignet_tpu.losses import gan as our

    rng = np.random.default_rng(22)
    shape = (4, 8, 8, 3)
    in_dim = int(np.prod(shape[1:]))
    n_heads = 3
    kernels, biases = _linear_multihead_weights(rng, in_dim, n_heads)
    real = rng.uniform(-1, 1, size=shape).astype(np.float32)
    fake = rng.uniform(-1, 1, size=shape).astype(np.float32)

    class TfDisc:
        def __call__(self, x):
            flat = tf.reshape(x, (x.shape[0], -1))
            out = collections.OrderedDict()
            for i, (k, b) in enumerate(zip(kernels, biases)):
                out[f"head_{i}"] = tf.matmul(flat, k) + b
            return out

    losses_tf = ref_losses.compute_discriminator_loss(
        TfDisc(), tf.constant(real), tf.constant(fake))

    def jax_disc(x):
        flat = jnp.reshape(x, (x.shape[0], -1))
        return {f"head_{i}": flat @ jnp.asarray(k) + jnp.asarray(b)
                for i, (k, b) in enumerate(zip(kernels, biases))}

    losses_jax = our.compute_discriminator_loss(
        jax_disc, jnp.asarray(real), jnp.asarray(fake))

    for key, val in losses_tf.items():
        np.testing.assert_allclose(
            float(losses_jax[key]), float(val.numpy()), rtol=1e-5,
            err_msg=f"discriminator loss head {key}")


def test_latent_discriminator_loss_parity():
    """compute_latent_discriminator_loss vs reference losses.py:49-73."""
    ref_losses = load_ref_module("losses")
    from confignet_tpu.losses import gan as our

    rng = np.random.default_rng(23)
    k = rng.normal(size=(12, 1)).astype(np.float32) * 0.5
    b = rng.normal(size=(1,)).astype(np.float32)
    real = rng.normal(size=(6, 12)).astype(np.float32)
    fake = rng.normal(size=(6, 12)).astype(np.float32)

    losses_tf = ref_losses.compute_latent_discriminator_loss(
        lambda x: tf.matmul(x, k) + b, tf.constant(real), tf.constant(fake))
    losses_jax = our.compute_latent_discriminator_loss(
        lambda x: x @ jnp.asarray(k) + jnp.asarray(b),
        jnp.asarray(real), jnp.asarray(fake))

    for key, val in losses_tf.items():
        np.testing.assert_allclose(
            float(losses_jax[key]), float(val.numpy()), rtol=1e-5,
            err_msg=f"latent discriminator loss {key}")


def test_latent_regression_losses_parity():
    """Plain MSE regression loss (losses.py:85-90) and the stage-2
    variance-normalized variant (confignet_second_stage.py:93-107)."""
    ref_losses = load_ref_module("losses")
    from confignet_tpu.losses import gan as our

    rng = np.random.default_rng(24)
    preds = rng.normal(size=(8, 19)).astype(np.float32)
    labels = rng.normal(size=(8, 19)).astype(np.float32) * 2.0

    loss_tf = ref_losses.compute_latent_regression_loss(
        tf.constant(preds), tf.constant(labels), lambda x: x)
    np.testing.assert_allclose(
        float(our.latent_regression_loss(jnp.asarray(preds), jnp.asarray(labels))),
        float(loss_tf.numpy()), rtol=1e-5)

    # Normalized variant: replicate the reference's inline math in TF.
    weight = 1.7
    denominator = tf.sqrt(tf.math.reduce_variance(tf.constant(labels), axis=0,
                                                  keepdims=True) + 1e-3)
    denominator = tf.concat((denominator[:, :-3], tf.ones((1, 3), tf.float32)), axis=1)
    p = tf.constant(preds)
    l = tf.constant(labels)
    p = tf.reduce_mean(p, axis=0) + (p - tf.reduce_mean(p, axis=0)) / denominator
    l = tf.reduce_mean(l, axis=0) + (l - tf.reduce_mean(l, axis=0)) / denominator
    ref_val = float(tf.reduce_mean(tf.losses.mean_squared_error(l, p)).numpy()) * weight

    ours_val = float(our.normalized_latent_regression_loss(
        jnp.asarray(preds), jnp.asarray(labels), weight))
    np.testing.assert_allclose(ours_val, ref_val, rtol=1e-5)


# ---------------------------------------------------------------------------
# FID / KID vs the reference numpy/scipy implementations
# ---------------------------------------------------------------------------

def test_fid_kid_parity():
    """compute_FID (scipy sqrtm there, eigh trace-of-sqrt here) and
    compute_KID vs reference metrics/inception_distance.py:29-59."""
    ref_id = load_ref_module("metrics.inception_distance")
    from confignet_tpu.metrics.inception import compute_FID, compute_KID

    rng = np.random.default_rng(25)
    feats_g = rng.normal(size=(96, 24)).astype(np.float64)
    feats_r = rng.normal(loc=0.3, size=(80, 24)).astype(np.float64)

    np.testing.assert_allclose(
        compute_FID(feats_g, feats_r), ref_id.compute_FID(feats_g, feats_r),
        rtol=1e-6)
    np.testing.assert_allclose(
        compute_KID(feats_g, feats_r), ref_id.compute_KID(feats_g, feats_r),
        rtol=1e-8)


# ---------------------------------------------------------------------------
# FID / classifier backbones through the ordered h5 loader
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_inception_v3_h5_parity(tmp_path):
    """Our InceptionV3 (FID/KID feature extractor) vs tf.keras
    InceptionV3(include_top=False, pooling='avg') with weights transferred
    via the creation-order h5 loader (reference: metrics/inception_distance.py:9-27)."""
    keras = tf.keras
    tf_model = keras.applications.inception_v3.InceptionV3(
        weights=None, include_top=False, pooling="avg", input_shape=(128, 128, 3))
    randomize_tf_weights(tf_model, seed=31)
    h5_path = str(tmp_path / "inception.h5")
    tf_model.save_weights(h5_path)

    rng = np.random.default_rng(32)
    x = rng.uniform(-1, 1, size=(2, 128, 128, 3)).astype(np.float32)
    feats_tf = tf_model(tf.constant(x)).numpy()

    from confignet_tpu.metrics.inception import InceptionFeatureExtractor

    extractor = InceptionFeatureExtractor((128, 128, 3), dtype=None)
    extractor.load_keras_weights(h5_path)
    feats_jax = np.asarray(extractor._fn(extractor.variables["params"], jnp.asarray(x)))

    assert feats_jax.shape == feats_tf.shape == (2, 2048)
    # 94 conv/BN layers of f32 accumulation (and oneDNN reassociation on the
    # TF side) leave a few-1e-3 absolute wobble on near-zero features.
    np.testing.assert_allclose(feats_jax, feats_tf, atol=6e-3, rtol=2e-3)


@pytest.mark.slow
def test_mobilenet_v2_h5_parity(tmp_path):
    """Our MobileNetV2 (attribute-classifier trunk) vs tf.keras
    MobileNetV2(include_top=False) with creation-order h5 transfer
    (reference: metrics/celeba_attribute_prediction.py:56)."""
    keras = tf.keras
    tf_model = keras.applications.mobilenet_v2.MobileNetV2(
        weights=None, include_top=False, input_shape=(96, 96, 3))
    randomize_tf_weights(tf_model, seed=33)
    h5_path = str(tmp_path / "mobilenet.h5")
    tf_model.save_weights(h5_path)

    rng = np.random.default_rng(34)
    x = rng.uniform(-1, 1, size=(2, 96, 96, 3)).astype(np.float32)
    feats_tf = tf_model(tf.constant(x)).numpy()

    from confignet_tpu.models.backbones.loader import load_keras_h5_ordered
    from confignet_tpu.models.backbones.mobilenet import (
        MobileNetV2,
        mobilenet_conv_bn_order,
    )

    module = MobileNetV2()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    conv_paths, bn_paths = mobilenet_conv_bn_order()
    params = load_keras_h5_ordered(dict(params), h5_path, conv_paths, bn_paths)
    feats_jax = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    assert feats_jax.shape == feats_tf.shape
    np.testing.assert_allclose(feats_jax, feats_tf, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_resnet50_h5_parity(tmp_path):
    """Our ResNet50 (encoder trunk) vs tf.keras ResNet50(include_top=False,
    pooling='avg') with weights transferred via the semantic name map
    (reference: real_encoder.py:13)."""
    keras = tf.keras
    tf_model = keras.applications.resnet50.ResNet50(
        weights=None, include_top=False, pooling="avg", input_shape=(128, 128, 3))
    randomize_tf_weights(tf_model, seed=35)
    h5_path = str(tmp_path / "resnet50.h5")
    tf_model.save_weights(h5_path)

    rng = np.random.default_rng(36)
    x = rng.uniform(-120, 130, size=(2, 128, 128, 3)).astype(np.float32)
    feats_tf = tf_model(tf.constant(x)).numpy()

    from confignet_tpu.models.backbones.loader import load_keras_h5_mapped
    from confignet_tpu.models.backbones.resnet import (
        ResNet50,
        resnet50_keras_name_map,
    )

    module = ResNet50()
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    try:
        params = load_keras_h5_mapped(dict(params), h5_path, resnet50_keras_name_map())
    except ValueError:
        params = load_keras_h5_mapped(
            dict(params), h5_path, resnet50_keras_name_map(legacy=True))
    feats_jax = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    assert feats_jax.shape == feats_tf.shape == (2, 2048)
    np.testing.assert_allclose(feats_jax, feats_tf, atol=5e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# Training-step parity: one discriminator update (grads through the
# multi-head GAN loss incl. R1 grad-of-grad, then Adam) vs the reference
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_discriminator_training_step_parity():
    """Mirrors reference confignet_first_stage.py:466-477: same weights,
    same batch, one discriminator update on the reference TF side (eager
    GradientTape + Keras Adam(4e-4, betas (0, 0.9), eps 1e-7)) and on ours
    (jax.value_and_grad + optax via training.state).  Pins the full
    backward pass INCLUDING the R1 gradient-of-gradient: per-head losses,
    per-leaf gradient direction/magnitude, and the Adam update scale.

    Tolerances are noise-bound, not bit-exact: a 3-conv instance-normed
    trunk under f32 with different accumulation orders (oneDNN vs XLA)
    already shows ~1% wobble on the final logit, which propagates into the
    gradients.  What this test pins is structure: gradients pointing the
    same way with the same norms, and updates of the right scale.
    """
    ref_losses = load_ref_module("losses")
    ref_mod = load_ref_module("dnn_models.hologan_discriminator")

    rng = np.random.default_rng(41)
    real = rng.uniform(-1, 1, size=(4, 32, 32, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, size=(4, 32, 32, 3)).astype(np.float32)

    tf_disc = ref_mod.HologanDiscriminator(img_shape=(32, 32), **_DISCR_KW)
    tf_disc(tf.constant(real))
    randomize_tf_weights(tf_disc, seed=42)
    wl0 = tf_disc.get_weights()

    # --- reference step (confignet_first_stage.py:469-474) ---
    optimizer = tf.keras.optimizers.Adam(
        learning_rate=4e-4, beta_1=0.0, beta_2=0.9, epsilon=1e-7)
    with tf.GradientTape() as tape:
        losses_tf = ref_losses.compute_discriminator_loss(
            tf_disc, tf.constant(real), tf.constant(fake))
    tf_grads = tape.gradient(losses_tf["loss_sum"], tf_disc.trainable_weights)
    # trainable_weights order == get_weights order here (everything is
    # trainable), so the gradient list maps through the same path table.
    grad_list = [g.numpy() for g in tf_grads]
    optimizer.apply_gradients(zip(tf_grads, tf_disc.trainable_weights))
    wl1 = tf_disc.get_weights()

    # --- our step (training/first_stage.py d_loss + Player.apply_gradients) ---
    from confignet_tpu.losses import gan as our_losses
    from confignet_tpu.models.discriminator import HologanDiscriminator
    from confignet_tpu.training.state import Player, make_adam

    disc = HologanDiscriminator(
        img_shape=(32, 32), num_resample=3, disc_kernel_size=3,
        disc_expansion_factor=8, disc_max_feature_maps=64,
        initial_from_rgb_layer_in_discr=True)
    init_params = disc.init(jax.random.PRNGKey(0), jnp.asarray(real))["params"]
    paths = ri.discriminator_weight_paths(3, True, "grouped")
    params = ri.assign_weight_list(dict(init_params), wl0, paths, "discriminator")

    tx = make_adam({"lr": 4e-4, "beta_1": 0.0, "beta_2": 0.9})
    player = Player.create(params, tx)

    def d_loss(p):
        losses = our_losses.compute_discriminator_loss(
            lambda x: disc.apply({"params": p}, x),
            jnp.asarray(real), jnp.asarray(fake))
        return losses["loss_sum"], losses

    (_, losses_jax), d_grads = jax.value_and_grad(d_loss, has_aux=True)(player.params)
    new_player = player.apply_gradients(d_grads, tx)

    # (a) per-head loss values agree to noise level
    for key, val in losses_tf.items():
        np.testing.assert_allclose(
            float(losses_jax[key]), float(val.numpy()), rtol=2e-2, atol=5e-3,
            err_msg=f"loss {key}")

    # (b) gradients: same direction and magnitude per leaf
    ref_grad_tree = ri.assign_weight_list(
        dict(init_params), grad_list, paths, "discriminator")
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grad_tree))
    for path, ours in jax.tree_util.tree_leaves_with_path(d_grads):
        g_ref = np.asarray(flat_ref[path]).ravel()
        g_our = np.asarray(ours).ravel()
        norm = np.linalg.norm(g_ref)
        name = jax.tree_util.keystr(path)
        assert norm > 0, f"zero reference gradient at {name}"
        cos = float(np.dot(g_ref, g_our) / (norm * np.linalg.norm(g_our)))
        rel_l2 = float(np.linalg.norm(g_our - g_ref) / norm)
        assert cos > 0.999, f"gradient direction mismatch at {name}: cos={cos}"
        assert rel_l2 < 0.05, f"gradient magnitude mismatch at {name}: rel={rel_l2}"

    # (c) the applied update has Adam's first-step scale and the same signs
    # as the TF update wherever the step is significant
    updated_ref = ri.assign_weight_list(dict(init_params), wl1, paths, "discriminator")
    before = dict(jax.tree_util.tree_leaves_with_path(params))
    after_ref = dict(jax.tree_util.tree_leaves_with_path(updated_ref))
    lr = 4e-4
    for path, ours_after in jax.tree_util.tree_leaves_with_path(new_player.params):
        delta_ours = np.asarray(ours_after) - np.asarray(before[path])
        delta_ref = np.asarray(after_ref[path]) - np.asarray(before[path])
        name = jax.tree_util.keystr(path)
        assert np.max(np.abs(delta_ours)) <= 1.2 * lr + 1e-9, name
        significant = np.abs(delta_ref) > 0.5 * lr
        if significant.any():
            agree = np.mean(
                np.sign(delta_ours[significant]) == np.sign(delta_ref[significant]))
            assert agree > 0.97, f"update sign agreement {agree} at {name}"


@pytest.fixture(scope="module")
def matched_second_stage(tmp_path_factory):
    return _build_matched_first_stage(tmp_path_factory.mktemp("refckpt2"),
                                      stage2=True)


@pytest.mark.slow
def test_stage2_g_step_loss_parity(matched_second_stage, tmp_path):
    """The stage-2 generator-step loss assembly vs the reference
    (confignet_second_stage.py:149-213): autoencoding image losses on BOTH
    domains (encoder in the loop), eye loss, per-head GAN on both
    discriminators, the label-flipped domain-adversarial latent loss, and
    the variance-normalized latent regression — every sub-model including
    the ResNet50 real encoder weight-matched to the live TF instances."""
    m = matched_second_stage
    model = m["model"]
    keras = tf.keras
    ref_losses = load_ref_module("losses")
    size = m["size"]
    cfg = model.config

    vgg = keras.applications.vgg19.VGG19(weights=None, include_top=False,
                                         input_shape=(size, size, 3))
    randomize_tf_weights(vgg, seed=78)
    h5_path = str(tmp_path / "vgg19.h5")
    vgg.save_weights(h5_path)
    model.perceptual_loss.load_keras_weights(h5_path)
    tf_acts = keras.Model(vgg.input, [vgg.layers[i].output for i in (1, 2)])

    def tf_perceptual(a, b):  # mirror reference perceptual_loss.py:42-82
        pa = keras.applications.vgg19.preprocess_input((a + 1) * 127.5)
        pb = keras.applications.vgg19.preprocess_input((b + 1) * 127.5)
        terms = [tf.reduce_mean(tf.losses.mean_squared_error(
                     tf.reshape(x, [-1]), tf.reshape(y, [-1])))
                 for x, y in zip(tf_acts(pa), tf_acts(pb))]
        return tf.reduce_mean(tf.add_n(terms))

    rng = np.random.default_rng(56)
    n_synth, n_real = 2, 2
    facemodel = [rng.normal(size=(n_synth, d[0])).astype(np.float32)
                 for d in m["facemodel_inputs"].values()]
    synth_rot = rng.uniform(-0.3, 0.3, size=(n_synth, 3)).astype(np.float32)
    gt_u8 = rng.integers(0, 256, size=(n_synth, size, size, 3)).astype(np.uint8)
    gt = gt_u8.astype(np.float32) / 127.5 - 1.0
    eye_masks = (rng.uniform(size=(n_synth, size, size)) > 0.8).astype(np.float32)
    real_u8 = rng.integers(0, 256, size=(n_real, size, size, 3)).astype(np.uint8)
    real_f = real_u8.astype(np.float32) / 127.5 - 1.0

    # ---- TF mirror of confignet_second_stage.py:167-213 ----
    tf_fm = {k: tf.constant(v)
             for k, v in zip(m["facemodel_inputs"].keys(), facemodel)}
    synth_latents_tf = m["tf_synth_enc"](tf_fm)
    out_synth_tf = m["tf_gen"]((synth_latents_tf, tf.constant(synth_rot)))
    real_lat_tf, real_rot_tf = m["tf_encoder"](tf.constant(real_f))
    out_real_tf = m["tf_gen"]((real_lat_tf, real_rot_tf))

    losses_tf = {}
    losses_tf["image_loss_synth"] = cfg["image_loss_weight"] * tf_perceptual(
        tf.constant(gt), out_synth_tf)
    losses_tf["image_loss_real"] = cfg["image_loss_weight"] * tf_perceptual(
        tf.constant(real_f), out_real_tf)
    losses_tf["eye_loss"] = cfg["eye_loss_weight"] * ref_losses.eye_loss(
        tf.constant(gt), out_synth_tf, eye_masks)
    for i, head in enumerate(m["tf_synth_disc"](out_synth_tf).values()):
        losses_tf[f"GAN_loss_synth_{i}"] = ref_losses.GAN_G_loss(head)
    for i, head in enumerate(m["tf_disc"](out_real_tf).values()):
        losses_tf[f"GAN_loss_real_{i}"] = ref_losses.GAN_G_loss(head)
    ld_real = m["tf_latent_disc"](real_lat_tf)
    ld_synth = m["tf_latent_disc"](synth_latents_tf)
    ld_labels = np.vstack((np.zeros((n_real, 1), np.float32),
                           np.ones((n_synth, 1), np.float32)))
    losses_tf["latent_GAN_loss"] = cfg["domain_adverserial_loss_weight"] * \
        ref_losses.GAN_D_loss(ld_labels, tf.concat((ld_real, ld_synth), axis=0))
    # Variance-normalized regression (confignet_second_stage.py:93-107).
    stacked_lat = tf.concat((synth_latents_tf, real_lat_tf), axis=0)
    stacked_img = tf.concat((out_synth_tf, out_real_tf), axis=0)
    stacked_rot = tf.concat((tf.constant(synth_rot), real_rot_tf), axis=0)
    labels_tf = tf.concat(
        (stacked_lat, cfg["latent_regressor_rot_weight"] * stacked_rot), axis=-1)
    reg_out_tf = m["tf_reg"](stacked_img)
    denom = tf.sqrt(tf.math.reduce_variance(labels_tf, axis=0, keepdims=True) + 1e-3)
    denom = tf.concat((denom[:, :-3], tf.ones((1, 3), tf.float32)), axis=1)
    p = tf.reduce_mean(reg_out_tf, axis=0) + (reg_out_tf - tf.reduce_mean(reg_out_tf, axis=0)) / denom
    l = tf.reduce_mean(labels_tf, axis=0) + (labels_tf - tf.reduce_mean(labels_tf, axis=0)) / denom
    losses_tf["latent_regression_loss"] = cfg["latent_regression_weight"] * \
        tf.reduce_mean(tf.losses.mean_squared_error(l, p))
    losses_tf["loss_sum"] = tf.add_n(list(losses_tf.values()))

    # ---- our side: same assembly through the model's pure helpers ----
    from confignet_tpu.losses import gan as our_losses
    from confignet_tpu.losses import normalized_latent_regression_loss

    gen_player = model.state.generator.params
    vgg_params = model.perceptual_loss.variables["params"]
    fm = tuple(jnp.asarray(f) for f in facemodel)
    synth_latents = model._synth_enc_apply(gen_player["synthetic_encoder"], fm)
    out_synth = model._gen_apply(gen_player["generator"], synth_latents,
                                 jnp.asarray(synth_rot))
    real_latents, real_rotations = model._encoder_apply(
        gen_player["real_encoder"], jnp.asarray(real_f))
    out_real = model._gen_apply(gen_player["generator"], real_latents, real_rotations)

    losses_jax = {}
    gt_jax = jnp.asarray(gt)
    losses_jax["image_loss_synth"] = cfg["image_loss_weight"] * \
        model.perceptual_loss.loss_fn(vgg_params, gt_jax, out_synth)
    losses_jax["image_loss_real"] = cfg["image_loss_weight"] * \
        model.perceptual_loss.loss_fn(vgg_params, jnp.asarray(real_f), out_real)
    losses_jax["eye_loss"] = cfg["eye_loss_weight"] * our_losses.eye_loss(
        gt_jax, out_synth, jnp.asarray(eye_masks))
    for i, head in enumerate(model._synth_disc_apply(
            model.state.synth_discriminator.params, out_synth).values()):
        losses_jax[f"GAN_loss_synth_{i}"] = our_losses.gan_g_loss(head)
    for i, head in enumerate(model._disc_apply(
            model.state.discriminator.params, out_real).values()):
        losses_jax[f"GAN_loss_real_{i}"] = our_losses.gan_g_loss(head)
    ld_out = jnp.concatenate([
        model._latent_disc_apply(model.state.latent_discriminator.params, real_latents),
        model._latent_disc_apply(model.state.latent_discriminator.params, synth_latents),
    ], axis=0)
    labels = jnp.concatenate(
        [jnp.zeros((n_real, 1)), jnp.ones((n_synth, 1))], axis=0)
    losses_jax["latent_GAN_loss"] = cfg["domain_adverserial_loss_weight"] * \
        our_losses.gan_d_loss(labels, ld_out)
    stacked_lat_j = jnp.concatenate([synth_latents, real_latents], axis=0)
    stacked_img_j = jnp.concatenate([out_synth, out_real], axis=0)
    stacked_rot_j = jnp.concatenate([jnp.asarray(synth_rot), real_rotations], axis=0)
    labels_j = jnp.concatenate(
        [stacked_lat_j, cfg["latent_regressor_rot_weight"] * stacked_rot_j], axis=-1)
    reg_out = model._regressor_apply(gen_player["latent_regressor"], stacked_img_j)
    losses_jax["latent_regression_loss"] = normalized_latent_regression_loss(
        reg_out, labels_j, cfg["latent_regression_weight"])
    losses_jax["loss_sum"] = sum(losses_jax.values())

    assert set(losses_jax) == set(losses_tf)
    for key in losses_tf:
        np.testing.assert_allclose(
            float(losses_jax[key]), float(losses_tf[key].numpy()),
            rtol=2e-2, atol=1e-4, err_msg=f"stage-2 G-step loss {key}")
