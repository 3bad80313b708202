"""CelebA attribute classifier: the controllability judge.

Reference: confignet/metrics/celeba_attribute_prediction.py.  MobileNetV2
trunk + global average pooling + BatchNorm + Dropout(0.5) + sigmoid head
over the predicted attributes; binary-crossentropy training with per-epoch
checkpoints and best-model tracking on validation binary accuracy.

TPU-native notes: training runs as a jitted optax step (bce + accuracy under
one jit) with dropout driven by explicit PRNG keys; the head BatchNorm uses
batch statistics in training and stored moving stats at inference, matching
Keras semantics.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from confignet_tpu.core import model_io
from confignet_tpu.core.config import merge_configs
from confignet_tpu.core.randomness import KeyChain
from confignet_tpu.models.backbones.mobilenet import MobileNetV2, mobilenet_preprocess
from confignet_tpu.models.blocks import BIAS_INIT, KERNEL_INIT

DEFAULT_CONFIG: Dict[str, Any] = {
    "model_type": "CelebaAttributeClassifier",
    "input_shape": None,
    "predicted_attributes": None,
    "optimizer": {"lr": 0.001},
    "batch_size": 32,
    # Head-BN momentum; see _ClassifierHead.bn_momentum (0.99 = Keras
    # parity with a pretrained trunk, ~0.9 for from-scratch training).
    "head_bn_momentum": 0.99,
    # Live trunk BatchNorm for from-scratch training (no pretrained .h5):
    # the default frozen-stat trunk is built for imported Keras weights and
    # barely trains from random init.  Incompatible with
    # load_backbone_keras_weights.
    "trainable_bn": False,
    "seed": 0,
}


class _ClassifierHead(nn.Module):
    n_attributes: int
    dropout_rate: float = 0.5
    # Keras default momentum.  For FROM-SCRATCH training (no pretrained
    # trunk on this rig) use ~0.9: the trunk's FrozenBatchNorm layers are
    # mode-independent affines, so this head BN is the only train/eval
    # difference — at 0.99 its running stats lag ~100 steps behind the
    # drifting features and eval-mode accuracy collapses to the priors
    # (docs/evidence_judge_diagnosis.json, round 5).
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = jnp.mean(features, axis=(1, 2))  # GAP
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-3, name="bn"
        )(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.n_attributes, kernel_init=KERNEL_INIT, bias_init=BIAS_INIT,
                     name="head")(x)
        return jax.nn.sigmoid(x)


class _ClassifierNet(nn.Module):
    n_attributes: int
    head_bn_momentum: float = 0.99
    trainable_bn: bool = False

    @nn.compact
    def __call__(self, images_0_255, train: bool = False):
        x = mobilenet_preprocess(images_0_255.astype(jnp.float32))
        feats = MobileNetV2(trainable_bn=self.trainable_bn,
                            name="mobilenet")(x, train=train)
        return _ClassifierHead(self.n_attributes, bn_momentum=self.head_bn_momentum,
                               name="head")(feats, train=train)


class CelebaAttributeClassifier:
    MODEL_TYPE = "CelebaAttributeClassifier"

    def __init__(self, config: Dict[str, Any]):
        self.config = merge_configs(DEFAULT_CONFIG, config)
        if self.config["input_shape"] is None or self.config["predicted_attributes"] is None:
            raise ValueError("config requires input_shape and predicted_attributes")
        self.logs: Dict[str, List[float]] = {}
        self.keychain = KeyChain(self.config.get("seed", 0))
        self._predict_fn = None
        self.initialize_dnn()

    def initialize_dnn(self) -> None:
        self.module = _ClassifierNet(
            n_attributes=len(self.config["predicted_attributes"]),
            head_bn_momentum=float(self.config.get("head_bn_momentum", 0.99)),
            trainable_bn=bool(self.config.get("trainable_bn", False)),
        )
        dummy = jnp.zeros((1, *self.config["input_shape"]), jnp.float32)
        from confignet_tpu.core.init_cache import cached_init

        self.variables = cached_init(
            self.module, self.keychain.next(), dummy, train=False
        )
        self.tx = optax.adam(self.config["optimizer"].get("lr", 1e-3), eps=1e-7)
        self.opt_state = self.tx.init(self.variables["params"])
        from confignet_tpu.core.pretrained import maybe_load

        maybe_load(self.load_backbone_keras_weights,
                   self.config.get("backbones_dir"), "mobilenet_v2")

    def load_backbone_keras_weights(self, h5_path: str) -> None:
        """Import the standard Keras MobileNetV2 ``.h5`` (ImageNet, notop)
        into the backbone by creation order (the reference starts from the
        ImageNet-pretrained trunk, celeba_attribute_prediction.py:56)."""
        if self.config.get("trainable_bn"):
            raise ValueError(
                "trainable_bn=True uses live nn.BatchNorm trees; the Keras "
                "frozen-stat import targets FrozenBatchNorm params. Train "
                "from scratch or set trainable_bn=False."
            )
        from confignet_tpu.models.backbones.loader import load_keras_h5_ordered
        from confignet_tpu.models.backbones.mobilenet import mobilenet_conv_bn_order

        conv_paths, bn_paths = mobilenet_conv_bn_order()
        params = dict(self.variables["params"])
        params["mobilenet"] = load_keras_h5_ordered(
            dict(params["mobilenet"]), h5_path,
            conv_paths=conv_paths, bn_paths=bn_paths,
        )
        self.variables = {**self.variables, "params": params}
        self.opt_state = self.tx.init(self.variables["params"])
        self._predict_fn = None

    # ------------------------------------------------------------------

    def _build_train_step(self):
        def loss_fn(params, batch_stats, key, imgs, labels):
            outputs, mutated = self.module.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            )
            eps = 1e-7
            outputs = jnp.clip(outputs, eps, 1 - eps)
            bce = -jnp.mean(labels * jnp.log(outputs) + (1 - labels) * jnp.log(1 - outputs))
            accuracy = jnp.mean((outputs > 0.5) == (labels > 0.5))
            return bce, (mutated["batch_stats"], accuracy)

        def step(params, batch_stats, opt_state, key, imgs, labels):
            (loss, (new_stats, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, key, imgs, labels
            )
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, loss, acc

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_eval_fn(self):
        def evaluate(params, batch_stats, imgs, labels):
            outputs = self.module.apply(
                {"params": params, "batch_stats": batch_stats}, imgs, train=False
            )
            eps = 1e-7
            clipped = jnp.clip(outputs, eps, 1 - eps)
            bce = -jnp.mean(labels * jnp.log(clipped) + (1 - labels) * jnp.log(1 - clipped))
            accuracy = jnp.mean((outputs > 0.5) == (labels > 0.5))
            return bce, accuracy

        return jax.jit(evaluate)

    def sample_batch_from_dataset(self, dataset, batch_size: Optional[int] = None,
                                  add_noise: bool = False):
        """uint8 images + attribute labels; images stay in [0,255] (the
        preprocess happens on device inside the network)."""
        if batch_size is None:
            batch_size = self.config["batch_size"]
        idx = np.random.randint(0, dataset.imgs.shape[0], batch_size)
        if add_noise:
            imgs = np.copy(dataset.imgs[idx]).astype(np.float32)
            half = batch_size // 2
            imgs[:half] += np.random.normal(0, 0.05 * 127.5, imgs[:half].shape)
        else:
            # Feed uint8 and cast on device: the 32x256x256x3 batch is 6 MB
            # instead of 25 MB over the tunnel (the train step was
            # host-transfer-bound at ~1 step/s before this).
            imgs = np.copy(dataset.imgs[idx])
        attributes = dataset.get_attribute_values(idx, self.config["predicted_attributes"])
        return imgs, attributes.astype(np.float32)

    def _build_recalibrate_fn(self):
        """Forward pass in train mode that ONLY refreshes batch_stats — the
        standard BN re-estimation pass.  With a from-scratch trunk the GAP
        feature scale drifts fast during training, so the head BN's running
        stats are persistently stale at any momentum; re-estimating them
        against the CURRENT parameters before eval removes the train/eval
        gap exactly (the round-5 judge collapse — saturated constant
        eval-mode outputs — was this)."""
        def refresh(params, batch_stats, imgs):
            _, mutated = self.module.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            return mutated["batch_stats"]

        return jax.jit(refresh)

    def recalibrate_batch_stats(self, dataset, n_batches: int = 30) -> None:
        refresh = self._build_recalibrate_fn()
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        for _ in range(n_batches):
            imgs, _ = self.sample_batch_from_dataset(dataset)
            batch_stats = refresh(params, batch_stats, jnp.asarray(imgs))
        self.variables = {"params": params, "batch_stats": batch_stats}
        self._predict_fn = None

    def train(self, training_set, validation_set, output_dir, n_epochs: int,
              steps_per_epoch: int) -> None:
        step_fn = self._build_train_step()
        eval_fn = self._build_eval_fn()
        refresh_fn = self._build_recalibrate_fn()

        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        opt_state = self.opt_state

        val_imgs, val_labels = self.sample_batch_from_dataset(validation_set, 200)
        val_imgs, val_labels = jnp.asarray(val_imgs), jnp.asarray(val_labels)

        for epoch in range(n_epochs):
            epoch_losses, epoch_accs = [], []
            for _ in range(steps_per_epoch):
                imgs, labels = self.sample_batch_from_dataset(training_set)
                params, batch_stats, opt_state, loss, acc = step_fn(
                    params, batch_stats, opt_state, self.keychain.next(),
                    jnp.asarray(imgs), jnp.asarray(labels),
                )
                epoch_losses.append(float(loss))
                epoch_accs.append(float(acc))

            # BN re-estimation against the current params before eval.
            for _ in range(10):
                imgs, _ = self.sample_batch_from_dataset(training_set)
                batch_stats = refresh_fn(params, batch_stats, jnp.asarray(imgs))

            self.variables = {"params": params, "batch_stats": batch_stats}
            self.opt_state = opt_state

            val_loss, val_acc = eval_fn(params, batch_stats, val_imgs, val_labels)
            logs = {
                "loss": float(np.mean(epoch_losses)),
                "binary_accuracy": float(np.mean(epoch_accs)),
                "val_loss": float(val_loss),
                "val_binary_accuracy": float(val_acc),
            }
            print(f"epoch {epoch}: {logs}")
            self._epoch_callback(epoch, logs, output_dir)

    def _epoch_callback(self, epoch: int, logs: Dict[str, float], output_dir: str) -> None:
        checkpoint_dir = os.path.join(output_dir, "checkpoints")
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.save(checkpoint_dir, str(epoch).zfill(4))

        for key, value in logs.items():
            self.logs.setdefault(key, []).append(float(value))

        val_history = self.logs["val_binary_accuracy"]
        if len(val_history) == 1 or val_history[-1] > np.max(val_history[:-1]):
            best_dir = os.path.join(output_dir, "best_model")
            os.makedirs(best_dir, exist_ok=True)
            self.save(best_dir, str(epoch).zfill(4))

        from confignet_tpu.core.logging_utils import agg_pyplot

        plt = agg_pyplot()

        plt.plot(self.logs["loss"])
        plt.plot(self.logs["val_loss"])
        plt.savefig(os.path.join(output_dir, "losses.png"))
        plt.clf()
        plt.plot(self.logs["binary_accuracy"])
        plt.plot(self.logs["val_binary_accuracy"])
        plt.savefig(os.path.join(output_dir, "metrics.png"))
        plt.clf()

        table = np.stack(list(self.logs.values()), axis=1)
        np.savetxt(
            os.path.join(output_dir, "logs.txt"), table,
            header="\t".join(self.logs.keys()),
        )

    # ------------------------------------------------------------------

    def predict_attributes(self, input_images: np.ndarray, batch_chunk: int = 64) -> np.ndarray:
        """Images (uint8 [0,255] or float [-1,1]) -> per-attribute
        probabilities (reference: celeba_attribute_prediction.py:129-141)."""
        input_images = np.asarray(input_images)
        if input_images.dtype in (np.float32, np.float64):
            input_images = ((input_images + 1.0) * 127.5).astype(np.float32)
        # uint8 inputs stay uint8 — the module casts on device (4x smaller
        # host->device transfer per prediction chunk)

        target_shape = tuple(self.config["input_shape"])
        if input_images.shape[1:] != target_shape:
            import cv2

            resized = np.zeros((input_images.shape[0], *target_shape), np.float32)
            size_xy = tuple(target_shape[:2][::-1])
            for i, img in enumerate(input_images):
                resized[i] = cv2.resize(img, size_xy)
            input_images = resized

        if self._predict_fn is None:
            self._predict_fn = jax.jit(
                lambda v, x: self.module.apply(v, x, train=False)
            )

        n = input_images.shape[0]
        chunk = min(batch_chunk, max(n, 1))
        outputs = []
        for start in range(0, n, chunk):
            batch = input_images[start : start + chunk]
            pad = chunk - batch.shape[0]
            if pad:
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
            probs = np.asarray(self._predict_fn(self.variables, jnp.asarray(batch)))
            outputs.append(probs[: chunk - pad] if pad else probs)
        return np.concatenate(outputs)

    # ------------------------------------------------------------------

    def save(self, output_dir: str, output_filename: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        trees = {"params": self.variables["params"]}
        if "batch_stats" in self.variables:
            trees["batch_stats"] = self.variables["batch_stats"]
        model_io.save_model_weights(
            jax.device_get(trees), output_dir, output_filename
        )
        metadata = {"logs": self.logs, "config": self.config}
        with open(os.path.join(output_dir, output_filename + ".json"), "w") as fp:
            json.dump(metadata, fp, indent=4)

    @classmethod
    def load(cls, file_path: str) -> "CelebaAttributeClassifier":
        with open(file_path, "r") as fp:
            metadata = json.load(fp)
        classifier = cls(metadata["config"])
        classifier.logs = metadata["logs"]
        trees = model_io.load_model_weights(os.path.splitext(file_path)[0] + ".npz")
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, trees["params"])}
        if "batch_stats" in trees:
            variables["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, trees["batch_stats"]
            )
        classifier.variables = variables
        return classifier
