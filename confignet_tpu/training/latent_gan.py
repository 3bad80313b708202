"""LatentGAN: a small MLP GAN over ConfigNet's latent space so novel faces
can be sampled without input photos.

Reference: confignet/latent_gan.py.  TPU-native differences:

- discriminator update, generator update and the EMA run as ONE jitted step
  (:meth:`_build_train_step`) with on-device noise sampling;
- gt-embedding minibatch selection happens on host (cheap integer indexing)
  but the embeddings live on device for the whole run;
- checkpoints use the pytree-npz format (core/model_io.py).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from confignet_tpu.core import model_io
from confignet_tpu.core.config import merge_configs
from confignet_tpu.core.images import build_image_matrix
from confignet_tpu.core.logging_utils import TensorBoardWriter
from confignet_tpu.core.randomness import KeyChain
from confignet_tpu.losses import (
    compute_latent_discriminator_loss,
    gan_g_loss,
)
from confignet_tpu.models.blocks import MLP
from confignet_tpu.training.state import Player, ema_update, make_adam

DEFAULT_CONFIG: Dict[str, Any] = {
    "model_type": "LatentGAN",
    "latent_dim": None,
    "optimizer": {"lr": 0.00005, "beta_1": 0.0, "beta_2": 0.9, "amsgrad": False},
    "batch_size": 32,
    "num_mlp_layers": 3,
    "latent_distribution_type": "normal",
    "hidden_layer_size_multiplier": 1.5,
    "n_samples_for_metrics": 1000,
    "verbose_log_period": 500,
    "loss_print_period": 50,  # steps between device->host loss flushes
    "logging_img_square_size": 6,
    "seed": 0,
}


class LatentGANState(struct.PyTreeNode):
    generator: Player
    discriminator: Player
    generator_smoothed: Any


class LatentGAN:
    MODEL_TYPE = "LatentGAN"

    def __init__(self, config: Dict[str, Any]):
        self.config = merge_configs(DEFAULT_CONFIG, config)
        self.config["model_type"] = self.MODEL_TYPE
        if self.config["latent_dim"] is None:
            raise ValueError("LatentGAN config requires latent_dim")

        self.keychain = KeyChain(self.config.get("seed", 0))
        self.log_writer: Optional[TensorBoardWriter] = None
        self.inputs_for_logs = None
        self.inputs_for_metrics = None
        self.metrics: Dict[str, list] = {}
        self._inception_metric_object = None
        self._train_step_fn = None
        self._sample_fn = None

        self.initialize_network()

    # ------------------------------------------------------------------

    def _mlp(self, num_out: int) -> MLP:
        latent_dim = self.config["latent_dim"]
        hidden = int(latent_dim * self.config["hidden_layer_size_multiplier"])
        return MLP(
            num_layers=self.config["num_mlp_layers"],
            num_hidden=hidden,
            num_out=num_out,
        )

    def initialize_network(self) -> None:
        latent_dim = self.config["latent_dim"]
        self.generator_module = self._mlp(latent_dim)
        self.discriminator_module = self._mlp(1)
        self.tx = make_adam(self.config["optimizer"])

        z1 = jnp.zeros((1, latent_dim), jnp.float32)
        key = self.keychain.next()
        kg, kd = jax.random.split(key)
        from confignet_tpu.core.init_cache import cached_init

        g_params = cached_init(self.generator_module, kg, z1)["params"]
        d_params = cached_init(self.discriminator_module, kd, z1)["params"]
        self.state = LatentGANState(
            generator=Player.create(g_params, self.tx),
            discriminator=Player.create(d_params, self.tx),
            generator_smoothed=jax.tree_util.tree_map(jnp.copy, g_params),
        )

    def _gen_apply(self, params, z):
        return self.generator_module.apply({"params": params}, z)

    def _disc_apply(self, params, z):
        return self.discriminator_module.apply({"params": params}, z)

    def _sample_noise_on_device(self, key, n: int):
        latent_dim = self.config["latent_dim"]
        if self.config["latent_distribution_type"] == "uniform":
            return jax.random.uniform(key, (n, latent_dim), minval=-1.0, maxval=1.0)
        return jax.random.normal(key, (n, latent_dim))

    # ------------------------------------------------------------------

    def _build_train_step(self):
        batch_size = self.config["batch_size"]

        def step(state: LatentGANState, key, real_embeddings):
            k1, k2 = jax.random.split(key)

            # -- discriminator update --
            noise = self._sample_noise_on_device(k1, batch_size)
            fake_embeddings = self._gen_apply(state.generator.params, noise)

            def d_loss(params):
                losses = compute_latent_discriminator_loss(
                    lambda z: self._disc_apply(params, z), real_embeddings, fake_embeddings
                )
                return losses["loss_sum"], losses

            (_, d_losses), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
                state.discriminator.params
            )
            new_discriminator = state.discriminator.apply_gradients(d_grads, self.tx)

            # -- generator update --
            noise_g = self._sample_noise_on_device(k2, batch_size)

            def g_loss(params):
                generated = self._gen_apply(params, noise_g)
                scores = self._disc_apply(new_discriminator.params, generated)
                losses = {"gan_loss": gan_g_loss(scores)}
                losses["loss_sum"] = losses["gan_loss"]
                return losses["loss_sum"], losses

            (_, g_losses), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
                state.generator.params
            )
            new_generator = state.generator.apply_gradients(g_grads, self.tx)
            new_smoothed = ema_update(state.generator_smoothed, new_generator.params)

            return (
                LatentGANState(
                    generator=new_generator,
                    discriminator=new_discriminator,
                    generator_smoothed=new_smoothed,
                ),
                {"d": d_losses, "g": g_losses},
            )

        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def extract_embeddings(self, confignet_model, training_set, max_chunk_size: int = 1000) -> np.ndarray:
        """Embed the whole dataset through the ConfigNet real encoder in
        chunks (reference: latent_gan.py:218-232)."""
        n_imgs = training_set.imgs.shape[0]
        embeddings = np.zeros((n_imgs, self.config["latent_dim"]), np.float32)
        for start in range(0, n_imgs, max_chunk_size):
            end = min(start + max_chunk_size, n_imgs)
            print(f"Extracting embeddings {start}:{end} of {n_imgs}")
            embeddings[start:end], _ = confignet_model.encode_images(
                training_set.imgs[start:end]
            )
        return embeddings

    def setup_logs(self, log_dir, training_set, confignet_model) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self.log_writer = TensorBoardWriter(log_dir)

        n_logged = self.config["logging_img_square_size"] ** 2
        self.inputs_for_logs = {
            "latents": self.sample_input_latent_vector(n_logged),
            "rotations": np.zeros((n_logged, 3), np.float32),
        }
        n_metrics = self.config["n_samples_for_metrics"]
        self.inputs_for_metrics = {
            "latents": self.sample_input_latent_vector(n_metrics),
            "rotations": confignet_model.sample_rotations(n_metrics),
        }
        try:
            from confignet_tpu.metrics.inception import InceptionMetrics

            self._inception_metric_object = InceptionMetrics(
                confignet_model.config, training_set, n_samples_for_metrics=n_metrics
            )
        except Exception as exc:  # pragma: no cover
            print(f"WARNING: inception metrics disabled ({exc})")
            self._inception_metric_object = None

    def train(self, training_set, confignet_model, output_dir, log_dir, n_iters: int) -> None:
        self.setup_logs(log_dir, training_set, confignet_model)
        gt_embeddings = self.extract_embeddings(confignet_model, training_set)
        gt_embeddings_dev = jnp.asarray(gt_embeddings)

        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()

        from confignet_tpu.core.logging_utils import LossFlusher

        batch_size = self.config["batch_size"]
        verbose_p = self.config["verbose_log_period"]
        # Buffer device losses; no per-step device->host sync (see
        # first_stage.train).
        flusher = LossFlusher(self.config.get("loss_print_period", 50))
        steps_pending = []
        for step_number in range(n_iters):
            idx = np.random.randint(0, gt_embeddings.shape[0], batch_size)
            real = gt_embeddings_dev[jnp.asarray(idx)]
            self.state, losses = self._train_step_fn(self.state, self.keychain.next(), real)
            steps_pending.append(step_number)

            flush_due = flusher.append(losses)
            at_verbose = step_number % verbose_p == 0
            if not (flush_due or at_verbose or step_number == n_iters - 1):
                continue

            fetched = flusher.flush()
            for s, l in zip(steps_pending, fetched):
                self._write_scalar_logs(s, l["d"], l["g"])
            print(
                "[step: %d] [D loss: %f] [G loss: %f]"
                % (step_number, fetched[-1]["d"]["loss_sum"], fetched[-1]["g"]["loss_sum"])
            )
            steps_pending = []
            if at_verbose:
                self._write_verbose_logs(output_dir, step_number, confignet_model)

    def _write_scalar_logs(self, step_number, d_loss, g_loss) -> None:
        if self.log_writer is not None:
            for key, value in d_loss.items():
                self.log_writer.scalar("discr_" + key, float(value), step_number)
            for key, value in g_loss.items():
                self.log_writer.scalar("gen_" + key, float(value), step_number)

    def write_logs(self, output_dir, step_number, d_loss, g_loss, confignet_model) -> None:
        self._write_scalar_logs(step_number, d_loss, g_loss)
        if step_number % self.config["verbose_log_period"] != 0:
            return
        self._write_verbose_logs(output_dir, step_number, confignet_model)

    def _write_verbose_logs(self, output_dir, step_number, confignet_model) -> None:
        predicted = self.generate_latents_smoothed(self.inputs_for_logs["latents"])
        generated_images = confignet_model.generate_images(
            predicted, self.inputs_for_logs["rotations"]
        )
        square = self.config["logging_img_square_size"]
        combined = build_image_matrix(generated_images, square, square)
        if self.log_writer is not None:
            self.log_writer.image("generated_images", combined, step_number)

        checkpoint_dir = os.path.join(output_dir, "checkpoints")
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.save(checkpoint_dir, str(step_number).zfill(6))

        if self._inception_metric_object is not None:
            predicted = self.generate_latents_smoothed(self.inputs_for_metrics["latents"])
            generated_images = confignet_model.generate_images(
                predicted, self.inputs_for_metrics["rotations"]
            )
            kid, fid = self._inception_metric_object.get_metrics(generated_images)
            self.metrics.setdefault("training_step_number", []).append(step_number)
            self.metrics.setdefault("kid", []).append(float(kid))
            self.metrics.setdefault("fid", []).append(float(fid))
            if self.log_writer is not None:
                self.log_writer.scalar("metrics/kid", kid, step_number)
                self.log_writer.scalar("metrics/fid", fid, step_number)

    # ------------------------------------------------------------------

    def sample_input_latent_vector(self, n_samples: int) -> np.ndarray:
        if self.config["latent_distribution_type"] == "uniform":
            return np.random.uniform(-1, 1, (n_samples, self.config["latent_dim"]))
        return np.random.normal(0, 1, (n_samples, self.config["latent_dim"]))

    def generate_latents_smoothed(self, input_latents: np.ndarray) -> np.ndarray:
        if self._sample_fn is None:
            self._sample_fn = jax.jit(self._gen_apply)
        return np.asarray(
            self._sample_fn(self.state.generator_smoothed, jnp.asarray(input_latents, jnp.float32))
        )

    def generate_latents(self, n_samples: int, truncation: float = 1.0) -> np.ndarray:
        """Sample latents; truncation scales the INPUT noise
        (reference: latent_gan.py:249-252)."""
        noise = self.sample_input_latent_vector(n_samples) * truncation
        return self.generate_latents_smoothed(noise.astype(np.float32))

    # ------------------------------------------------------------------

    def get_weights(self) -> Dict[str, Any]:
        state = jax.device_get(self.state)
        return {
            "generator": state.generator.params,
            "generator_smoothed": state.generator_smoothed,
            "discriminator": state.discriminator.params,
        }

    def set_weights(self, weights: Dict[str, Any]) -> None:
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.state = LatentGANState(
            generator=Player.create(as_jnp(weights["generator"]), self.tx),
            discriminator=Player.create(as_jnp(weights["discriminator"]), self.tx),
            generator_smoothed=as_jnp(weights["generator_smoothed"]),
        )

    def save(self, output_dir: str, output_filename: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        model_io.save_model_weights(self.get_weights(), output_dir, output_filename)
        with open(os.path.join(output_dir, output_filename + ".json"), "w") as fp:
            json.dump(self.config, fp, indent=4)

    @classmethod
    def load(cls, file_path: str) -> "LatentGAN":
        """Load ours or a reference-release LatentGAN checkpoint (sniffed by
        npz key layout, like ConfigNetFirstStage.load)."""
        npz_path = os.path.splitext(file_path)[0] + ".npz"
        if model_io.npz_is_reference_format(npz_path):
            from confignet_tpu.core.reference_import import load_reference_latent_gan

            return load_reference_latent_gan(file_path)
        with open(file_path, "r") as fp:
            config = json.load(fp)
        gan = cls(config)
        gan.set_weights(model_io.load_model_weights(npz_path))
        return gan
