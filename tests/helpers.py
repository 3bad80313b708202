"""Shared test fixtures: a tiny in-memory synthetic dataset and small model
configs so full training steps compile in seconds on the CPU test rig."""
import numpy as np


class FakeDistribution:
    def __init__(self, data):
        self.data = np.asarray(data, np.float32)

    def sample(self, n_samples=1):
        idx = np.random.randint(0, self.data.shape[0], n_samples)
        return self.data[idx], None


class FakeDataset:
    """Duck-typed stand-in for NeuralRendererDataset used by trainers."""

    def __init__(self, n_images=8, img_size=128, facemodel_dims=None, seed=0, with_attributes=False):
        rng = np.random.default_rng(seed)
        self.imgs = rng.integers(0, 256, size=(n_images, img_size, img_size, 3), dtype=np.uint8)
        self.eye_masks = (rng.random((n_images, img_size, img_size)) > 0.95).astype(np.uint8)
        facemodel_dims = facemodel_dims or {"blendshape_values": 8, "head_hair_color": 3}
        self.metadata_inputs = {
            name: rng.normal(size=(n_images, dim)).astype(np.float32)
            for name, dim in facemodel_dims.items()
        }
        self.metadata_inputs["rotations"] = rng.uniform(
            -0.2, 0.2, size=(n_images, 3)
        ).astype(np.float32)
        self.metadata_input_distributions = {
            name: FakeDistribution(arr) for name, arr in self.metadata_inputs.items()
        }
        self.inception_features = rng.normal(size=(n_images, 32)).astype(np.float32)
        self.attributes = None
        if with_attributes:
            names = ["Black_Hair", "Blond_Hair", "Smiling", "Mustache"]
            self.attributes = [
                {n: int(rng.random() > 0.5) for n in names} for _ in range(n_images)
            ]

    def get_attribute_values(self, sample_idxs, attribute_names):
        return np.array(
            [[self.attributes[i][n] for n in attribute_names] for i in sample_idxs]
        )


TINY_FIRST_STAGE_CONFIG = {
    "output_shape": (128, 128, 3),
    "const_input_shape": (4, 4, 4, 8),
    "n_generator_features": 16,
    "n_adain_mlp_units": 8,
    "n_adain_mlp_layers": 2,
    "n_discr_features_at_layer_0": 4,
    "max_discr_filters": 16,
    "n_discr_layers": 3,  # 3 instead of 5: ~2x faster CPU compiles of the fused steps
    "batch_size": 4,
    "n_latent_discr_layers": 2,
    "perceptual_taps": [1, 2],
    "metrics_checkpoint_period": 10**9,
    "image_checkpoint_period": 10**9,
    "facemodel_inputs": {
        "blendshape_values": (8, 6),
        "head_hair_color": (3, 4),
    },
}


def batch_signature(batch):
    """Byte-level signature of a host batch (order-sensitive), for
    reproducibility tests."""
    import jax

    return [np.asarray(leaf).tobytes() for leaf in jax.tree_util.tree_leaves(batch)]


def sample_batch_signatures(model_cls, config, dataset, n_batches, interleave):
    """Seed the global numpy RNG, build a fresh trainer, and record the
    signatures of its first ``n_batches`` host batches.  With
    ``interleave=True``, draw from the global ``np.random`` between samples
    the way checkpoint-time main-thread code does — the batch stream must
    not shift (trainers own a dedicated RandomState for batch sampling)."""
    np.random.seed(1234)
    model = model_cls(dict(config))
    sigs = []
    for _ in range(n_batches):
        if interleave:
            np.random.rand(97)
        sigs.append(batch_signature(model._sample_host_batch(dataset, dataset)))
    return sigs


def write_reference_checkpoint(model, out_dir, name="model", shift=0.0):
    """Serialize a ConfigNet(FirstStage) into the REFERENCE release format
    (confignet_first_stage.py:131-138,173-206): an npz of Keras-style
    object-array weight lists + config json + facemodel-distribution pck
    whose classes claim the reference's module paths.  ``shift`` is added to
    every weight so a test can prove assignment happened."""
    import json
    import os
    import pickle
    import sys
    import types

    from flax import traverse_util

    from confignet_tpu.core.reference_import import (
        discriminator_weight_paths,
        generator_weight_paths,
        latent_regressor_weight_paths,
        mlp_weight_paths,
        real_encoder_weight_paths,
        synthetic_encoder_weight_paths,
    )

    def weight_list(params, paths):
        flat = dict(traverse_util.flatten_dict(params))
        out = []
        for path in paths:
            if path == ("__drop_zero_kernel__",):
                bias_len = np.asarray(flat[("learned_input",)]).shape[0]
                out.append(np.zeros((1, bias_len), np.float32))
            else:
                out.append(np.asarray(flat[path], np.float32) + shift)
        return out

    def obj_array(lst):
        arr = np.empty(len(lst), dtype=object)
        arr[:] = lst
        return arr

    weights = model.get_weights()
    size = model.config["output_shape"][0]
    n_res = model.config["n_discr_layers"]
    from_rgb = model.config["initial_from_rgb_layer_in_discr"]
    disc_paths = discriminator_weight_paths(n_res, from_rgb, "grouped")
    gen_paths = generator_weight_paths(size)

    data = {
        "generator_weights": obj_array(weight_list(weights["generator"], gen_paths)),
        "generator_smoothed_weights": obj_array(
            weight_list(weights["generator_smoothed"], gen_paths)),
        "discriminator_weights": obj_array(
            weight_list(weights["discriminator"], disc_paths)),
        "synth_discriminator_weights": obj_array(
            weight_list(weights["synth_discriminator"], disc_paths)),
        "latent_regressor_weights": obj_array(weight_list(
            weights["latent_regressor"],
            latent_regressor_weight_paths(n_res, from_rgb))),
        "latent_discriminator_weights": obj_array(weight_list(
            weights["latent_discriminator"],
            mlp_weight_paths(model.config["n_latent_discr_layers"]))),
        "synthetic_encoder_weights": obj_array(weight_list(
            weights["synthetic_encoder"],
            synthetic_encoder_weight_paths(
                model.facemodel_inputs_tuple,
                model.config["num_synth_encoder_layers"]))),
    }
    if "real_encoder" in weights and weights["real_encoder"] is not None:
        data["real_encoder_weights"] = obj_array(
            weight_list(weights["real_encoder"], real_encoder_weight_paths()))

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, name + ".npz"), **data)
    with open(os.path.join(out_dir, name + ".json"), "w") as fp:
        json.dump(model._json_safe_config(), fp, indent=4)
    with open(os.path.join(out_dir, name + "_log.json"), "w") as fp:
        json.dump({"g_losses": {"loss_sum": [1.0, 2.0]},
                   "d_losses": {"loss_sum": [3.0]},
                   "metrics": {}}, fp)

    # Distribution pickle whose classes live at the REFERENCE module paths
    # (what a real model.zip contains) — exercises the import unpickler.
    # One correctly-shaped exemplar distribution per facemodel input, so
    # downstream consumers (demo sampling) actually work after import.
    ref_mod_name = "confignet.neural_renderer_dataset"
    created = []
    if "confignet" not in sys.modules:
        sys.modules["confignet"] = types.ModuleType("confignet")
        created.append("confignet")
    if ref_mod_name not in sys.modules:
        mod = types.ModuleType(ref_mod_name)

        class ExemplarDistribution:
            pass

        ExemplarDistribution.__module__ = ref_mod_name
        ExemplarDistribution.__qualname__ = "ExemplarDistribution"
        mod.ExemplarDistribution = ExemplarDistribution
        sys.modules[ref_mod_name] = mod
        created.append(ref_mod_name)
    try:
        rng = np.random.default_rng(0)
        distrs = {}
        for pname, (input_dim, _latent_dim) in model.config["facemodel_inputs"].items():
            d = sys.modules[ref_mod_name].ExemplarDistribution()
            d.exemplars = rng.normal(size=(5, input_dim)).astype(np.float32)
            d.n_exemplars = 5
            distrs[pname] = d
        with open(os.path.join(out_dir, name + "_facemodel_distr.pck"), "wb") as fp:
            pickle.dump(distrs, fp)
    finally:
        for m in created:
            del sys.modules[m]
    return os.path.join(out_dir, name + ".json")
