"""Reference-checkpoint import: validate (a) the Keras object-graph weight
ordering RULES the shim relies on, against real (generic) Keras models, and
(b) the strict zip-assignment machinery end-to-end with synthetic weight
lists."""
import numpy as np
import pytest

from helpers import TINY_FIRST_STAGE_CONFIG
from confignet_tpu.core.reference_import import (
    assign_weight_list,
    discriminator_weight_paths,
    generator_weight_paths,
    mlp_weight_paths,
    synthetic_encoder_weight_paths,
)



@pytest.fixture(scope="module")
def tiny_model():
    from confignet_tpu.training.first_stage import ConfigNetFirstStage

    return ConfigNetFirstStage(dict(TINY_FIRST_STAGE_CONFIG))


def test_keras_weight_ordering_rules():
    """Pin the ordering rules: sub-layer weights are depth-first; the
    CURRENT Keras orders layers appended alternately to two python-list
    attributes in CREATION order (interleaved).  TF 2.1 (which wrote the
    reference checkpoints) grouped per attribute instead — the import shim
    therefore supports both and auto-detects via strict shape checks."""
    tf = pytest.importorskip("tensorflow")
    keras = tf.keras

    class Inner(keras.Model):
        def __init__(self):
            super().__init__()
            self.first = keras.layers.Dense(3)
            self.second = keras.layers.Dense(5)

        def call(self, x):
            return self.second(self.first(x))

    class Outer(keras.Model):
        def __init__(self):
            super().__init__()
            self.list_a = []
            self.list_b = []
            for _ in range(2):
                self.list_a.append(keras.layers.Dense(2))
                self.list_b.append(keras.layers.Dense(4))
            self.inner = Inner()

        def call(self, x):
            for a, b in zip(self.list_a, self.list_b):
                x = b(a(x))
            return self.inner(x)

    model = Outer()
    model(np.zeros((1, 7), np.float32))
    shapes = [tuple(w.shape) for w in model.get_weights()]
    interleaved = [
        (7, 2), (2,), (2, 4), (4,),          # a0, b0 (creation order)
        (4, 2), (2,), (2, 4), (4,),          # a1, b1
        (4, 3), (3,), (3, 5), (5,),          # inner.first then inner.second
    ]
    grouped = [
        (7, 2), (2,), (4, 2), (2,),          # list_a members: a0 (from input), a1 (from b0's 4)
        (2, 4), (4,), (2, 4), (4,),          # list_b members: both fed by a Dense(2)
        (4, 3), (3,), (3, 5), (5,),
    ]
    # tf_keras (legacy Keras 2, what the suite runs under) groups per
    # attribute — the TF 2.1 order of the reference checkpoints; Keras 3
    # interleaves in creation order.  The import shim auto-detects.
    assert shapes in (interleaved, grouped)


def _weight_list_for_paths(params, paths):
    """Build a synthetic Keras-style flat weight list from our params."""
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(params))
    out = []
    for path in paths:
        if path == ("__drop_zero_kernel__",):
            bias_len = np.asarray(flat[("learned_input",)]).shape[0]
            out.append(np.zeros((1, bias_len), np.float32))
        else:
            out.append(np.asarray(flat[path]) + 1.0)  # shift to prove assignment
    return out


def test_generator_import_roundtrip(tiny_model):
    model = tiny_model
    weights = model.get_weights()
    paths = generator_weight_paths(model.config["output_shape"][0])
    weight_list = _weight_list_for_paths(weights["generator"], paths)

    imported = assign_weight_list(weights["generator"], weight_list, paths, "generator")
    from flax import traverse_util

    flat_orig = traverse_util.flatten_dict(weights["generator"])
    flat_new = traverse_util.flatten_dict(imported)
    assert set(flat_orig.keys()) == set(flat_new.keys())
    for path in flat_orig:
        np.testing.assert_allclose(
            np.asarray(flat_new[path]), np.asarray(flat_orig[path]) + 1.0, atol=0
        )


def test_import_rejects_shape_mismatch(tiny_model):
    model = tiny_model
    weights = model.get_weights()
    paths = generator_weight_paths(model.config["output_shape"][0])
    weight_list = _weight_list_for_paths(weights["generator"], paths)
    weight_list[3] = np.zeros((1, 1), np.float32)  # corrupt one entry
    with pytest.raises(ValueError, match="shape"):
        assign_weight_list(weights["generator"], weight_list, paths, "generator")


def test_import_rejects_live_dead_kernel(tiny_model):
    model = tiny_model
    weights = model.get_weights()
    paths = generator_weight_paths(model.config["output_shape"][0])
    weight_list = _weight_list_for_paths(weights["generator"], paths)
    weight_list[0] = weight_list[0] + 1.0  # non-zero learned-input kernel
    with pytest.raises(ValueError, match="all-zero"):
        assign_weight_list(weights["generator"], weight_list, paths, "generator")


def test_path_tables_cover_tiny_models(tiny_model):
    """Every declared path exists in the corresponding params tree and the
    counts match exactly (no unmapped parameters except declared drops)."""
    from flax import traverse_util

    model = tiny_model
    weights = model.get_weights()

    cases = [
        ("generator", generator_weight_paths(model.config["output_shape"][0]), 1),
        ("discriminator", discriminator_weight_paths(model.config["n_discr_layers"]), 0),
        ("latent_discriminator", mlp_weight_paths(model.config["n_latent_discr_layers"]), 0),
        ("synthetic_encoder",
         synthetic_encoder_weight_paths(model.facemodel_inputs_tuple), 0),
    ]
    for name, paths, n_drops in cases:
        flat = traverse_util.flatten_dict(weights[name])
        real_paths = [p for p in paths if p != ("__drop_zero_kernel__",)]
        assert len(real_paths) == len(flat), name
        for p in real_paths:
            assert p in flat, (name, p)


def test_latent_gan_reference_roundtrip(tmp_path):
    """Write a LatentGAN checkpoint in the REFERENCE npz format (Keras
    weight-list object arrays, keys from latent_gan.py:67-81) and reload it
    via load_reference_latent_gan."""
    import json

    from confignet_tpu.core.reference_import import (
        load_reference_latent_gan,
        mlp_weight_paths,
    )
    from confignet_tpu.training.latent_gan import LatentGAN
    from flax import traverse_util

    gan = LatentGAN({"latent_dim": 12, "seed": 3})
    weights = gan.get_weights()
    paths = mlp_weight_paths(gan.config["num_mlp_layers"])

    def as_keras_list(params, shift):
        flat = {
            tuple(k for k in path): v
            for path, v in traverse_util.flatten_dict(params).items()
        }
        arr = np.empty(len(paths), dtype=object)
        arr[:] = [np.asarray(flat[p]) + shift for p in paths]
        return arr

    np.savez(
        tmp_path / "model.npz",
        generator_weights=as_keras_list(weights["generator"], 1.0),
        smoothed_generator_weights=as_keras_list(weights["generator_smoothed"], 2.0),
        discriminator_weights=as_keras_list(weights["discriminator"], 3.0),
    )
    with open(tmp_path / "model.json", "w") as fp:
        json.dump({"latent_dim": 12, "seed": 3}, fp)

    imported = load_reference_latent_gan(str(tmp_path / "model.json"))
    got = imported.get_weights()
    for name, shift in (("generator", 1.0), ("generator_smoothed", 2.0),
                        ("discriminator", 3.0)):
        flat_orig = traverse_util.flatten_dict(weights[name])
        flat_new = traverse_util.flatten_dict(got[name])
        assert set(flat_orig) == set(flat_new)
        for path in flat_orig:
            np.testing.assert_allclose(
                np.asarray(flat_new[path]), np.asarray(flat_orig[path]) + shift,
                atol=1e-6,
            )


def test_h5_loader_rejects_mixed_layer_naming(tmp_path):
    """An h5 mixing counter-style names (conv2d_1) with semantic names
    (block_1_conv) has ambiguous creation order: sorting by counter would
    misplace the semantic layers, file order would scramble counter-named
    parallel branches.  The loader must raise, not silently pick one."""
    import h5py

    from confignet_tpu.models.backbones.loader import load_keras_h5_ordered

    h5_path = tmp_path / "mixed.h5"
    with h5py.File(h5_path, "w") as f:
        f.attrs["layer_names"] = [b"conv2d_1", b"block_1_conv"]
        for name in ("conv2d_1", "block_1_conv"):
            group = f.create_group(name)
            weight_name = f"{name}/kernel:0"
            group.attrs["weight_names"] = [weight_name.encode()]
            group.create_dataset(
                weight_name, data=np.zeros((1, 1, 1, 1), np.float32))

    with pytest.raises(ValueError, match="mixes counter-style"):
        load_keras_h5_ordered({}, str(h5_path), ["a/kernel"], [])


def test_load_confignet_sniffs_reference_format(tiny_model, tmp_path):
    """The 'drop-in replacement' gap: a reference-release checkpoint
    (model.zip layout — Keras weight-list npz + json + distr pck) must load
    through the SAME entry points as our own format
    (/root/reference/evaluation/confignet_demo.py:18-26 +
    confignet_utils.py:14-21 semantics)."""
    from helpers import write_reference_checkpoint
    from confignet_tpu.core.model_io import load_confignet
    from flax import traverse_util

    json_path = write_reference_checkpoint(tiny_model, str(tmp_path), shift=1.0)
    loaded = load_confignet(json_path)
    assert loaded.MODEL_TYPE == tiny_model.MODEL_TYPE

    # weights went through the Keras-order importer (shift proves assignment)
    orig = traverse_util.flatten_dict(tiny_model.get_weights()["generator"])
    new = traverse_util.flatten_dict(loaded.get_weights()["generator"])
    for path in orig:
        np.testing.assert_allclose(
            np.asarray(new[path]), np.asarray(orig[path]) + 1.0, atol=0)

    # the reference-module distribution pickle was remapped to our classes
    from confignet_tpu.data.distributions import ExemplarDistribution

    distr = loaded.facemodel_param_distributions["head_hair_color"]
    assert isinstance(distr, ExemplarDistribution)
    values, _ = distr.sample(3)
    assert values.shape == (3, tiny_model.config["facemodel_inputs"]["head_hair_color"][0])

    # the training log came along (step counter resumes from it)
    assert loaded.get_training_step_number() == 1


def test_latent_gan_load_sniffs_reference_format(tmp_path):
    """LatentGAN.load and load_confignet route reference-format npz files
    (latent_gan.py:48-81 layout) through the importer automatically."""
    import json

    from confignet_tpu.core.model_io import load_confignet
    from confignet_tpu.training.latent_gan import LatentGAN
    from flax import traverse_util

    gan = LatentGAN({"latent_dim": 6, "num_mlp_layers": 2, "batch_size": 4})
    weights = gan.get_weights()
    paths = mlp_weight_paths(gan.config["num_mlp_layers"])

    def as_keras_list(params, shift):
        flat = dict(traverse_util.flatten_dict(params))
        lst = [np.asarray(flat[p], np.float32) + shift for p in paths]
        arr = np.empty(len(lst), dtype=object)
        arr[:] = lst
        return arr

    np.savez(
        tmp_path / "model.npz",
        generator_weights=as_keras_list(weights["generator"], 1.0),
        smoothed_generator_weights=as_keras_list(weights["generator_smoothed"], 2.0),
        discriminator_weights=as_keras_list(weights["discriminator"], 3.0),
    )
    with open(tmp_path / "model.json", "w") as fp:
        json.dump(gan.config, fp)

    for loader in (LatentGAN.load, load_confignet):
        loaded = loader(str(tmp_path / "model.json"))
        got = traverse_util.flatten_dict(loaded.get_weights()["generator_smoothed"])
        want = traverse_util.flatten_dict(weights["generator_smoothed"])
        for p in want:
            np.testing.assert_allclose(
                np.asarray(got[p]), np.asarray(want[p]) + 2.0, atol=0)
