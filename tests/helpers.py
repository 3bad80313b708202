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
