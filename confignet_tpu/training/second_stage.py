"""ConfigNet second stage: the full model with the real-image encoder.

Reference: confignet/confignet_second_stage.py.  On top of the first stage:

- adds the ResNet50 ``RealEncoder`` (trained jointly in the G step, matching
  confignet_second_stage.py:213-214) and a VGGFace perceptual loss;
- the G step autoencodes real images (encoder -> generator) with image loss
  on both domains; the latent discriminator now sees encoder latents vs
  synthetic-encoder latents;
- the latent regression loss is variance-normalized;
- adds one-shot fine-tuning (``fine_tune_on_img``) where a fresh generator
  copy plus split embedding segments (pre-expression / expression /
  post-expression) and rotations are optimized against perceptual + GAN
  losses — here as a jitted optax step per iteration.

Everything (D, synth-D, latent-D, G + encoder, EMA) remains ONE fused jitted
train step, data-parallel over the mesh.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from confignet_tpu.core.images import batched_hflip, build_image_matrix, unit_range_to_uint8
from confignet_tpu.losses import (
    compute_discriminator_loss,
    compute_latent_discriminator_loss,
    eye_loss,
    gan_d_loss,
    gan_g_loss,
    normalized_latent_regression_loss,
)
from confignet_tpu.losses.perceptual import PerceptualLoss
from confignet_tpu.models.real_encoder import RealEncoder
from confignet_tpu.training.first_stage import (
    ConfigNetFirstStage,
    FirstStageState,
    _use_async_checkpointing,
)
from confignet_tpu.training.state import Player, ema_update


class ConfigNet(ConfigNetFirstStage):
    MODEL_TYPE = "ConfigNet"

    def __init__(self, config: Dict[str, Any], initialize: bool = True):
        self._fine_tuned_generator_params = None
        self._fine_tune_step_cache = {}
        super().__init__(config, initialize=initialize)
        self.config["model_type"] = self.MODEL_TYPE
        self.controllability_metrics = None
        self.perceptual_loss_face_reco = PerceptualLoss(
            tuple(self.config["output_shape"]),
            model_type="VGGFace",
            taps=self.config.get("perceptual_taps"),
        )
        from confignet_tpu.core.pretrained import maybe_load

        maybe_load(self.perceptual_loss_face_reco.load_keras_weights,
                   self.config.get("backbones_dir"), "vggface")
        self._encode_fn = None
        self._fine_tune_fns: Dict[bool, Any] = {}

    # ------------------------------------------------------------------

    def initialize_network(self) -> None:
        super().initialize_network()
        self.encoder_module = RealEncoder(
            latent_dim=self.config["latent_dim"],
            rotation_ranges=tuple(tuple(r) for r in self.config["rotation_ranges"]),
            dtype=self.compute_dtype,
            trunk_norm=self.config.get("encoder_norm", "frozen"),
        )
        img1 = jnp.zeros((1, *self.config["output_shape"]), jnp.float32)
        from confignet_tpu.core.init_cache import cached_init

        enc_params = cached_init(self.encoder_module, self.keychain.next(), img1)["params"]

        # ImageNet ResNet50 trunk when available (the reference encoder
        # starts from pretrained ResNet50, real_encoder.py:13).
        from confignet_tpu.core.pretrained import backbone_path

        resnet_h5 = backbone_path(self.config.get("backbones_dir"), "resnet50")
        if resnet_h5 is not None and self.config.get("encoder_norm", "frozen") != "frozen":
            raise ValueError(
                "encoder_norm != 'frozen' uses GroupNorm trees; the Keras "
                "ResNet50 import targets FrozenBatchNorm params. Use the "
                "default encoder_norm with pretrained backbones."
            )
        if resnet_h5 is not None:
            from confignet_tpu.models.backbones.loader import load_keras_h5_mapped
            from confignet_tpu.models.backbones.resnet import resnet50_keras_name_map

            enc_params = dict(enc_params)
            try:
                enc_params["resnet"] = load_keras_h5_mapped(
                    dict(enc_params["resnet"]), resnet_h5, resnet50_keras_name_map())
            except ValueError:
                enc_params["resnet"] = load_keras_h5_mapped(
                    dict(enc_params["resnet"]), resnet_h5,
                    resnet50_keras_name_map(legacy=True))
            print(f"Loaded pretrained resnet50 encoder trunk from {resnet_h5}")

        # The encoder joins the generator player so the G step optimizes it
        # jointly (reference: confignet_second_stage.py:213-214).
        gen_player_params = dict(self.state.generator.params)
        gen_player_params["real_encoder"] = enc_params
        self.state = FirstStageState(
            generator=Player.create(gen_player_params, self.generator_tx),
            discriminator=self.state.discriminator,
            synth_discriminator=self.state.synth_discriminator,
            latent_discriminator=self.state.latent_discriminator,
            generator_smoothed=self.state.generator_smoothed,
        )

    def _encoder_apply(self, params, imgs):
        return self.encoder_module.apply({"params": params}, imgs)

    # ------------------------------------------------------------------
    # Weights IO (adds the encoder tree; accepts stage-1 weight dicts)
    # ------------------------------------------------------------------

    def _get_device_weights(self) -> Dict[str, Any]:
        weights = super()._get_device_weights()
        weights["real_encoder"] = self.state.generator.params["real_encoder"]
        return weights

    def set_weights(self, weights: Dict[str, Any]) -> None:
        """Accepts either full ConfigNet weights or first-stage weights (no
        ``real_encoder`` key), in which case the current encoder params are
        kept — this is the stage-1 -> stage-2 transfer path
        (reference: train_confignet.py:69)."""
        current_encoder = jax.device_get(self.state.generator.params["real_encoder"])
        super().set_weights(weights)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        encoder = weights.get("real_encoder", current_encoder)
        gen_player_params = dict(self.state.generator.params)
        gen_player_params["real_encoder"] = as_jnp(encoder)
        self.state = self.state.replace(
            generator=Player.create(gen_player_params, self.generator_tx)
        )

    # ------------------------------------------------------------------
    # Fused train step (stage-2 semantics)
    # ------------------------------------------------------------------

    def _build_train_step(self):
        cfg = self.config
        w_img = cfg["image_loss_weight"]
        w_pix = cfg.get("pixel_loss_weight", 0.0)
        w_inv = cfg.get("encoder_inversion_weight", 0.0)
        w_eye = cfg["eye_loss_weight"]
        w_dom = cfg["domain_adverserial_loss_weight"]
        w_reg = cfg["latent_regression_weight"]
        w_rot = cfg["latent_regressor_rot_weight"]

        def g_step_losses(gen_player_params, disc_params, synth_disc_params,
                          latent_disc_params, vgg_params, vggface_params, batch, flip_mask):
            losses = {}
            synth_latents = self._synth_enc_apply(
                gen_player_params["synthetic_encoder"], batch["g_facemodel"]
            )
            out_synth = self._gen_apply(
                gen_player_params["generator"], synth_latents, batch["g_rotations"]
            )

            real_imgs = self._to_unit_range(batch["g_real_imgs"])
            real_imgs = batched_hflip(real_imgs, flip_mask)
            real_latents, real_rotations = self._encoder_apply(
                gen_player_params["real_encoder"], real_imgs
            )
            out_real = self._gen_apply(gen_player_params["generator"], real_latents, real_rotations)

            gt_synth = self._to_unit_range(batch["g_gt_imgs"])
            losses["image_loss_synth"] = w_img * self.perceptual_loss.loss_fn(
                vgg_params, gt_synth, out_synth
            )
            losses["image_loss_real"] = w_img * self.perceptual_loss.loss_fn(
                vgg_params, real_imgs, out_real
            )
            if w_pix > 0.0:
                # Same pixel-space L1 anchor as stage 1 (see
                # first_stage DEFAULT_CONFIG["pixel_loss_weight"]) — SYNTH
                # PAIR ONLY.  Applying it to the real-reconstruction pair
                # while the encoder is still uninformative teaches G to
                # emit the dataset-mean image (the L1-minimizer of
                # arbitrary targets given constant latents), which actively
                # collapses latent use — observed as identical
                # reconstructions for every input in the round-5 r5e run.
                losses["pixel_loss_synth"] = w_pix * jnp.mean(jnp.abs(gt_synth - out_synth))
            if w_inv > 0.0:
                # GAN-inversion objective for the ENCODER alone: reconstruct
                # the real image through a stop-gradient generator so the
                # gradient flows only into encoder params — the encoder must
                # produce input-dependent latents to reduce it, while G
                # cannot satisfy it by regressing to the dataset mean (the
                # r5e failure mode of a naive real-pair L1).
                out_real_frozen = self._gen_apply(
                    jax.tree_util.tree_map(
                        jax.lax.stop_gradient, gen_player_params["generator"]),
                    real_latents, real_rotations)
                losses["encoder_inversion_loss"] = w_inv * jnp.mean(
                    jnp.abs(real_imgs - out_real_frozen))
            losses["eye_loss"] = w_eye * eye_loss(gt_synth, out_synth, batch["g_eye_masks"])

            for i, head in enumerate(self._synth_disc_apply(synth_disc_params, out_synth).values()):
                losses[f"GAN_loss_synth_{i}"] = gan_g_loss(head)
            for i, head in enumerate(self._disc_apply(disc_params, out_real).values()):
                losses[f"GAN_loss_real_{i}"] = gan_g_loss(head)

            # Domain-adversarial loss: encoder latents should look "synthetic"
            # and vice versa (labels real->0, synth->1;
            # reference: confignet_second_stage.py:160-199).
            ld_out_synth = self._latent_disc_apply(latent_disc_params, synth_latents)
            ld_out_real = self._latent_disc_apply(latent_disc_params, real_latents)
            ld_out = jnp.concatenate([ld_out_real, ld_out_synth], axis=0)
            labels = jnp.concatenate(
                [jnp.zeros_like(ld_out_real), jnp.ones_like(ld_out_synth)], axis=0
            )
            losses["latent_GAN_loss"] = w_dom * gan_d_loss(labels, ld_out)

            if w_reg > 0.0:
                stacked_latents = jnp.concatenate([synth_latents, real_latents], axis=0)
                stacked_outputs = jnp.concatenate([out_synth, out_real], axis=0)
                stacked_rotations = jnp.concatenate(
                    [batch["g_rotations"], real_rotations], axis=0
                )
                labels = jnp.concatenate(
                    [stacked_latents, w_rot * stacked_rotations], axis=-1
                )
                reg_out = self._regressor_apply(
                    gen_player_params["latent_regressor"], stacked_outputs
                )
                losses["latent_regression_loss"] = normalized_latent_regression_loss(
                    reg_out, labels, w_reg
                )

            losses["loss_sum"] = sum(losses.values())
            return losses["loss_sum"], losses

        # Same multi-sub-update contract as stage 1 (shared helper).
        n_d_updates, n_g_updates, multi, sub_batch = self._sub_update_plan()

        def train_step(state: FirstStageState, key, batch, vgg_params, vggface_params):
            d_keys = jax.random.split(jax.random.fold_in(key, 0), n_d_updates)
            g_keys = jax.random.split(jax.random.fold_in(key, 1), n_g_updates)
            batch_size = batch["d_real_imgs"].shape[1 if multi else 0]

            discriminator = state.discriminator
            synth_discriminator = state.synth_discriminator
            latent_discriminator = state.latent_discriminator
            gen_params = state.generator.params

            for u in range(n_d_updates):
                keys = jax.random.split(d_keys[u], 3)
                b = sub_batch(batch, u, g_fields=False)

                # ---- image-discriminator: real vs G(encode(real)) ----
                real_imgs = self._to_unit_range(b["d_real_imgs"])
                real_imgs = batched_hflip(real_imgs, jax.random.bernoulli(keys[0], 0.5, (batch_size,)))
                input_imgs = self._to_unit_range(b["d_input_imgs"])
                enc_latents, enc_rotations = self._encoder_apply(
                    gen_params["real_encoder"], input_imgs
                )
                fake_imgs = self._gen_apply(
                    gen_params["generator"], enc_latents, enc_rotations
                )

                def d_loss(params, real_imgs=real_imgs, fake_imgs=fake_imgs):
                    losses = compute_discriminator_loss(
                        lambda x: self._disc_apply(params, x), real_imgs, fake_imgs,
                        r1_heads=cfg.get("r1_heads", "all"),
                    )
                    return losses["loss_sum"], losses

                (_, d_losses), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
                    discriminator.params
                )
                discriminator = discriminator.apply_gradients(d_grads, self.discriminator_tx)

                # ---- synth-discriminator (same as stage 1) ----
                synth_real = self._to_unit_range(b["synth_d_real_imgs"])
                synth_real = batched_hflip(synth_real, jax.random.bernoulli(keys[1], 0.5, (batch_size,)))
                synth_latents_d = self._synth_enc_apply(
                    gen_params["synthetic_encoder"], b["synth_d_facemodel"]
                )
                synth_fake = self._gen_apply(
                    gen_params["generator"], synth_latents_d, b["synth_d_rotations"]
                )

                def synth_d_loss(params, synth_real=synth_real, synth_fake=synth_fake):
                    losses = compute_discriminator_loss(
                        lambda x: self._synth_disc_apply(params, x), synth_real, synth_fake,
                        r1_heads=cfg.get("r1_heads", "all"),
                    )
                    return losses["loss_sum"], losses

                (_, synth_d_losses), sd_grads = jax.value_and_grad(synth_d_loss, has_aux=True)(
                    synth_discriminator.params
                )
                synth_discriminator = synth_discriminator.apply_gradients(
                    sd_grads, self.discriminator_tx
                )

                # ---- latent-discriminator: encoder latents vs synth latents ----
                ld_real_imgs = self._to_unit_range(b["latent_d_real_imgs"])
                ld_real_imgs = batched_hflip(
                    ld_real_imgs, jax.random.bernoulli(keys[2], 0.5, (batch_size,))
                )
                encoder_latents, _ = self._encoder_apply(
                    gen_params["real_encoder"], ld_real_imgs
                )
                fake_latents = self._synth_enc_apply(
                    gen_params["synthetic_encoder"], b["latent_d_facemodel"]
                )

                def latent_d_loss(params, encoder_latents=encoder_latents, fake_latents=fake_latents):
                    losses = compute_latent_discriminator_loss(
                        lambda z: self._latent_disc_apply(params, z), encoder_latents, fake_latents
                    )
                    return losses["loss_sum"], losses

                (_, latent_d_losses), ld_grads = jax.value_and_grad(latent_d_loss, has_aux=True)(
                    latent_discriminator.params
                )
                latent_discriminator = latent_discriminator.apply_gradients(
                    ld_grads, self.discriminator_tx
                )

            # ---- generator + encoder + regressor + synth-encoder update(s) ----
            generator = state.generator
            for u in range(n_g_updates):
                gb = sub_batch(batch, u, g_fields=True)
                flip_mask = jax.random.bernoulli(
                    g_keys[u], 0.5, (gb["g_real_imgs"].shape[0],)
                )
                (_, g_losses), g_grads = jax.value_and_grad(g_step_losses, has_aux=True)(
                    generator.params,
                    discriminator.params,
                    synth_discriminator.params,
                    latent_discriminator.params,
                    vgg_params,
                    vggface_params,
                    gb,
                    flip_mask,
                )
                generator = generator.apply_gradients(g_grads, self.generator_tx)

            new_smoothed = ema_update(state.generator_smoothed, generator.params["generator"])

            new_state = FirstStageState(
                generator=generator,
                discriminator=discriminator,
                synth_discriminator=synth_discriminator,
                latent_discriminator=latent_discriminator,
                generator_smoothed=new_smoothed,
            )
            return new_state, {
                "g": g_losses,
                "d": d_losses,
                "synth_d": synth_d_losses,
                "latent_d": latent_d_losses,
            }

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # Host batch assembly (stage 2 needs real-image batches for more steps)
    # ------------------------------------------------------------------

    def _sample_host_batch_single(self, real_training_set, synth_training_set,
                                  d_fields: bool = True,
                                  g_fields: bool = True) -> Dict[str, Any]:
        from confignet_tpu.runtime import gather_images, gather_rows

        # Same contract as stage 1 (first_stage.py:524-528): the dedicated
        # RandomState keeps the prefetch-thread batch stream isolated from
        # main-thread np.random use (checkpoint-time draws), preserving
        # run-to-run batch reproducibility and avoiding two-thread mutation
        # of the non-thread-safe global RNG.  d_fields/g_fields limit the
        # draw to one player's field group (multi-sub-update surplus draws
        # skip the other player's image gathers — see
        # first_stage._sample_host_batch).
        rng = self._batch_rng
        batch_size = self.config["batch_size"]
        n_synth = batch_size // 2
        n_real = batch_size - n_synth

        # Multi-host: identical global draws, per-process row gathers (see
        # first_stage._sample_host_batch_single / parallel.process_slice).
        from confignet_tpu.parallel import process_slice

        batch: Dict[str, Any] = {}
        if d_fields:
            sl = process_slice(batch_size)
            d_real_idx = rng.randint(0, real_training_set.imgs.shape[0], batch_size)[sl]
            d_input_idx = rng.randint(0, real_training_set.imgs.shape[0], batch_size)[sl]
            sd_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            sd_fm_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            ld_real_idx = rng.randint(0, real_training_set.imgs.shape[0], batch_size)[sl]
            ld_fm_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            batch.update({
                "d_real_imgs": gather_images(real_training_set.imgs, d_real_idx),
                "d_input_imgs": gather_images(real_training_set.imgs, d_input_idx),
                "synth_d_real_imgs": gather_images(synth_training_set.imgs, sd_idx),
                "synth_d_facemodel": self._facemodel_batch(synth_training_set, sd_fm_idx),
                "synth_d_rotations": np.ascontiguousarray(
                    synth_training_set.metadata_inputs["rotations"][sd_fm_idx], dtype=np.float32
                ),
                "latent_d_real_imgs": gather_images(real_training_set.imgs, ld_real_idx),
                "latent_d_facemodel": self._facemodel_batch(synth_training_set, ld_fm_idx),
            })
        if g_fields:
            sl_g = process_slice(n_synth)
            sl_r = process_slice(n_real)
            g_idx = rng.randint(0, synth_training_set.imgs.shape[0], n_synth)[sl_g]
            g_real_idx = rng.randint(0, real_training_set.imgs.shape[0], n_real)[sl_r]
            batch.update({
                "g_facemodel": self._facemodel_batch(synth_training_set, g_idx),
                "g_rotations": np.ascontiguousarray(
                    synth_training_set.metadata_inputs["rotations"][g_idx], dtype=np.float32
                ),
                "g_gt_imgs": gather_images(synth_training_set.imgs, g_idx),
                "g_eye_masks": gather_rows(np.asarray(synth_training_set.eye_masks), g_idx),
                "g_real_imgs": gather_images(real_training_set.imgs, g_real_idx),
            })
        return batch

    # ------------------------------------------------------------------
    # Training loop (adds validation-set machinery + controllability)
    # ------------------------------------------------------------------

    def setup_training(self, log_dir, synth_training_set, n_samples_for_metrics,
                       attribute_classifier=None, real_training_set=None,
                       validation_set=None, mesh=None) -> None:
        super().setup_training(
            log_dir, synth_training_set, n_samples_for_metrics,
            real_training_set=real_training_set, mesh=mesh,
        )
        if validation_set is not None:
            rng = np.random
            viz_idx = rng.randint(0, validation_set.imgs.shape[0], self.n_checkpoint_samples)
            self._checkpoint_visualization_input["input_images"] = (
                validation_set.imgs[viz_idx].astype(np.float32) / 127.5 - 1.0
            )
            metric_idx = rng.randint(0, validation_set.imgs.shape[0], n_samples_for_metrics)
            self._generator_input_for_metrics["input_images"] = (
                validation_set.imgs[metric_idx].astype(np.float32) / 127.5 - 1.0
            )
        if attribute_classifier is not None:
            from confignet_tpu.metrics.controllability import ControllabilityMetrics

            self.controllability_metrics = ControllabilityMetrics(self, attribute_classifier)

    def train(self, real_training_set, synth_training_set, validation_set=None,
              attribute_classifier=None, output_dir=None, log_dir=None,
              n_steps=100000, n_samples_for_metrics=1000, aml_run=None,
              mesh=None) -> Dict[str, float]:
        """Run the training loop; returns {'loop_seconds', 'steps_run'} — the
        loop-only wall time (bench_train.py consumes it)."""
        self.setup_training(
            log_dir, synth_training_set, n_samples_for_metrics,
            attribute_classifier=attribute_classifier,
            real_training_set=real_training_set, validation_set=validation_set, mesh=mesh,
        )
        if aml_run is not None:
            self.aml_sink = lambda name, value: aml_run.log(name, value)
        start_step = self.get_resume_step()

        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        vgg_params = self.perceptual_loss.variables["params"]
        vggface_params = self.perceptual_loss_face_reco.variables["params"]

        import time

        from confignet_tpu.core.logging_utils import LossFlusher, update_loss_dict

        # No per-step device->host sync on the hot path, and batch sampling
        # + host->device staging overlap the device step via a background
        # prefetch thread (see first_stage / data/prefetch.py).
        from confignet_tpu.data.prefetch import BatchPrefetcher

        flusher = LossFlusher(self.config.get("loss_print_period", 50))
        image_p = self.config["image_checkpoint_period"]
        metrics_p = self.config["metrics_checkpoint_period"]
        window_start = time.perf_counter()
        window_len = 0

        prefetcher = BatchPrefetcher(
            lambda: self._sample_host_batch(real_training_set, synth_training_set),
            depth=self.config.get("prefetch_depth", 2),
            device_put=self.mesh is None,
        )
        if _use_async_checkpointing(self.config):
            from confignet_tpu.core.async_checkpoint import CheckpointWorker

            self._checkpoint_worker = CheckpointWorker()
        loop_start = time.perf_counter()
        try:
            self._stage2_train_loop(
                prefetcher, flusher, start_step, n_steps, vgg_params,
                vggface_params, image_p, metrics_p, window_start, window_len,
                output_dir)
        finally:
            prefetcher.close()
            if self._checkpoint_worker is not None:
                worker, self._checkpoint_worker = self._checkpoint_worker, None
                worker.close()  # runs pending jobs, re-raises failures
        # max(0, ...): a resume whose history already exceeds n_steps runs
        # zero steps; never report a negative count (see first_stage.train).
        return {"loop_seconds": time.perf_counter() - loop_start,
                "steps_run": max(0, n_steps - start_step)}

    def _stage2_train_loop(self, prefetcher, flusher, start_step, n_steps,
                           vgg_params, vggface_params, image_p, metrics_p,
                           window_start, window_len, output_dir) -> None:
        import time

        from confignet_tpu.core.logging_utils import update_loss_dict

        for step in range(start_step, n_steps):
            batch = prefetcher.next()
            key = self.keychain.next()
            self.state, losses = self._train_step_fn(
                self.state, key, batch, vgg_params, vggface_params
            )
            window_len += 1

            flush_due = flusher.append(losses)
            at_checkpoint = step % image_p == 0 or step % metrics_p == 0
            if not (flush_due or at_checkpoint or step == n_steps - 1):
                continue

            for fetched in flusher.flush():
                update_loss_dict(self.g_losses, fetched["g"])
                update_loss_dict(self.d_losses, fetched["d"])
                update_loss_dict(self.synth_d_losses, fetched["synth_d"])
                update_loss_dict(self.latent_d_losses, fetched["latent_d"])
            iter_time = (time.perf_counter() - window_start) / max(window_len, 1)
            window_start = time.perf_counter()
            window_len = 0
            print(
                "[step %d] [D loss: %f] [synth_D loss: %f] [latent_D_loss: %f] [G loss: %f]"
                % (
                    step,
                    self.d_losses["loss_sum"][-1],
                    self.synth_d_losses["loss_sum"][-1],
                    self.latent_d_losses["loss_sum"][-1],
                    self.g_losses["loss_sum"][-1],
                )
            )
            if at_checkpoint:
                self.run_checkpoints(output_dir, iter_time)

    # ------------------------------------------------------------------
    # Checkpoint visualization: autoencoding panel
    # ------------------------------------------------------------------

    def image_checkpoint(self, output_dir: str, step_number: int = None) -> None:
        if step_number is None:
            step_number = self.get_training_step_number()
        self.synth_data_image_checkpoint(output_dir, step_number=step_number)
        viz = self._checkpoint_visualization_input
        if "input_images" not in viz:
            return
        gt_imgs = viz["input_images"]
        latent, pred_rotation = self.encode_images(gt_imgs)
        imgs_pred_rot = self.generate_images(latent, pred_rotation)
        stacked_latents = np.vstack([latent] * self.n_checkpoint_rotations)
        imgs_sweep = self.generate_images(stacked_latents, viz["rotation"])
        gt_uint8 = unit_range_to_uint8(gt_imgs)
        combined = np.vstack((gt_uint8, imgs_pred_rot, imgs_sweep))
        matrix = build_image_matrix(
            combined, self.n_checkpoint_rotations + 2, self.n_checkpoint_samples
        )
        img_dir = os.path.join(output_dir, "output_imgs")
        os.makedirs(img_dir, exist_ok=True)
        self._imwrite(os.path.join(img_dir, str(step_number).zfill(6) + ".png"), matrix)
        if self.log_writer is not None:
            self.log_writer.image("generated_images", matrix, step_number)

    def generate_output_for_metrics(self) -> np.ndarray:
        imgs = self._generator_input_for_metrics.get("input_images")
        if imgs is None:
            return super().generate_output_for_metrics()
        latent, rotation = self.encode_images(imgs)
        return self.generate_images(latent, rotation)

    def _metric_latents_and_rotations(self):
        """FID/KID scores the autoencoded metric batch in stage 2
        (reference: confignet_second_stage.py:220-266): encode the fixed
        real images, then the fused generator->Inception path takes over."""
        imgs = self._generator_input_for_metrics.get("input_images")
        if imgs is None:
            return super()._metric_latents_and_rotations()
        return self.encode_images(imgs)

    def calculate_metrics(self, output_dir: str, step_number: int = None) -> None:
        if step_number is None:
            step_number = self.get_training_step_number()
        super().calculate_metrics(output_dir, step_number=step_number)
        input_images = (
            self._generator_input_for_metrics.get("input_images")
            if self._generator_input_for_metrics
            else None
        )
        if input_images is None:
            return
        if self.controllability_metrics is not None:
            self.controllability_metrics.update_and_log_metrics(
                input_images, self.metrics, output_dir, self.aml_sink, self.log_writer
            )

        # perceptual autoencoding metric (confignet_second_stage.py:226-253)
        latents, rotations = self.encode_images(input_images)
        generated = self.generate_images(latents, rotations)
        generated_f = generated.astype(np.float32) / 127.5 - 1.0
        chunk = 16
        losses = []
        for start in range(0, len(input_images), chunk):
            gt = jnp.asarray(input_images[start : start + chunk])
            gen = jnp.asarray(generated_f[start : start + chunk])
            losses.append(float(self.perceptual_loss.loss(gt, gen)))
        perceptual = float(np.mean(losses))
        self.metrics.setdefault("perceptual_loss", []).append(perceptual)
        if self.log_writer is not None:
            self.log_writer.scalar("metrics/perceptual_loss", perceptual, step_number)
        np.savetxt(
            os.path.join(output_dir, "image_metrics.txt"), self.metrics["perceptual_loss"]
        )

    # ------------------------------------------------------------------
    # Inference API
    # ------------------------------------------------------------------

    def encode_images(self, input_images, batch_chunk: int = 32) -> Tuple[np.ndarray, np.ndarray]:
        """Images (uint8 BGR or [-1,1] float) -> (latents, rotations)."""
        input_images = np.asarray(input_images)
        if input_images.dtype == np.uint8:
            input_images = input_images.astype(np.float32) / 127.5 - 1.0
        input_images = input_images.astype(np.float32)
        if input_images.ndim == 3:
            input_images = input_images[np.newaxis]

        if self._encode_fn is None:
            self._encode_fn = jax.jit(self._encoder_apply)
        if self._inference_params_override is not None:
            params = self._inference_params_override["real_encoder"]
        else:
            params = self.state.generator.params["real_encoder"]

        n = input_images.shape[0]
        chunk = min(batch_chunk, max(n, 1))
        lat_out, rot_out = [], []
        for start in range(0, n, chunk):
            imgs = input_images[start : start + chunk]
            pad = chunk - imgs.shape[0]
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
            lat, rot = self._encode_fn(params, jnp.asarray(imgs))
            lat, rot = np.asarray(lat), np.asarray(rot)
            if pad:
                lat, rot = lat[:-pad], rot[:-pad]
            lat_out.append(lat)
            rot_out.append(rot)
        return np.concatenate(lat_out), np.concatenate(rot_out)

    def _generator_params_for_inference(self):
        if self._inference_params_override is not None:
            return self._inference_params_override["generator_smoothed"]
        if self._fine_tuned_generator_params is not None:
            return self._fine_tuned_generator_params
        return self.state.generator_smoothed

    # ------------------------------------------------------------------
    # One-shot fine-tuning (reference: confignet_second_stage.py:321-403)
    # ------------------------------------------------------------------

    def fine_tune_on_img(self, input_images, n_iters: int = 50, img_output_dir=None,
                         force_neutral_expression: bool = False, mesh=None):
        input_images = np.asarray(input_images)
        if input_images.dtype == np.uint8:
            input_images = input_images / 127.5 - 1.0
        input_images = input_images.astype(np.float32)
        if input_images.ndim == 3:
            input_images = input_images[np.newaxis]

        predicted_embeddings, predicted_rotations = self.encode_images(input_images)
        if force_neutral_expression:
            n_blend = self.config["facemodel_inputs"]["blendshape_values"][0]
            predicted_embeddings = self.set_facemodel_param_in_latents(
                predicted_embeddings, "blendshape_values", np.zeros((1, n_blend), np.float32)
            )

        expr_idxs = self.get_facemodel_param_idxs_in_latent("blendshape_values")
        expr_start, expr_stop = expr_idxs[0], expr_idxs[-1] + 1
        mean_embedding = np.mean(predicted_embeddings, axis=0, keepdims=True)
        n_imgs = input_images.shape[0]

        opt_vars = {
            "generator": jax.device_get(self.state.generator_smoothed),
            "pre_expr": mean_embedding[:, :expr_start],
            "expr": predicted_embeddings[:, expr_start:expr_stop],
            "post_expr": mean_embedding[:, expr_stop:],
            "rotations": predicted_rotations,
        }
        opt_vars = jax.tree_util.tree_map(jnp.asarray, opt_vars)
        tx = optax.adam(1e-4, b1=0.9, b2=0.999, eps=1e-7)
        if force_neutral_expression:
            # freeze the expression segment (reference: :392-394)
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()},
                {k: ("freeze" if k == "expr" else "train") for k in opt_vars},
            )
        opt_state = tx.init(opt_vars)

        step_fn = self._get_fine_tune_step(force_neutral_expression, n_imgs, tx)
        images_dev = jnp.asarray(input_images)
        disc_params = self.state.discriminator.params
        latent_disc_params = self.state.latent_discriminator.params
        regressor_params = self.state.generator.params["latent_regressor"]
        vgg_params = self.perceptual_loss.variables["params"]
        vggface_params = self.perceptual_loss_face_reco.variables["params"]

        if mesh is not None:
            # Data-parallel fine-tuning over a device mesh: the image batch
            # (and its per-image expr/rotation variables) shard on the data
            # axis, everything else replicates; GSPMD inserts the psums.
            if n_imgs % mesh.size != 0:
                raise ValueError(
                    f"fine-tune batch {n_imgs} must divide over {mesh.size} devices"
                )
            from confignet_tpu.parallel import replicate, shard_batch

            images_dev = shard_batch(mesh, input_images)
            sharded = {"expr", "rotations"} if n_imgs > 1 else set()
            opt_vars = {
                k: (shard_batch(mesh, v) if k in sharded else replicate(mesh, v))
                for k, v in opt_vars.items()
            }
            opt_state = tx.init(opt_vars)  # re-init on the replicated vars
            disc_params, latent_disc_params, regressor_params, vgg_params, \
                vggface_params = (
                    replicate(mesh, p)
                    for p in (disc_params, latent_disc_params, regressor_params,
                              vgg_params, vggface_params)
                )

        if img_output_dir is not None:
            os.makedirs(img_output_dir, exist_ok=True)
            self._imwrite(
                os.path.join(img_output_dir, "gt_img.png"),
                unit_range_to_uint8(input_images)[0],
            )

        # Per-iteration jit dispatches, issued ASYNC (no host sync inside the
        # loop unless debug output is requested) — the dispatches pipeline on
        # the device.  Measured on this rig this beats fusing all n_iters
        # into one lax.fori_loop program by ~25% (18.1 vs 13.9 iters/s at
        # 256px): the loop-carried params/optimizer state defeat XLA's
        # inter-iteration scheduling, while async dispatch hides per-call
        # latency entirely.
        for step_number in range(n_iters):
            opt_vars, opt_state, loss_sum, out_imgs = step_fn(
                opt_vars, opt_state, images_dev, disc_params, latent_disc_params,
                regressor_params, vgg_params, vggface_params,
            )
            if img_output_dir is not None:
                print(float(loss_sum))
                self._imwrite(
                    os.path.join(img_output_dir, "output_%02d.png" % step_number),
                    unit_range_to_uint8(np.asarray(out_imgs))[0],
                )
        if n_iters > 0:
            print("fine-tune final loss: %f" % float(loss_sum))

        opt_vars = jax.device_get(opt_vars)
        self._fine_tuned_generator_params = jax.tree_util.tree_map(
            jnp.asarray, opt_vars["generator"]
        )
        embeddings = np.concatenate(
            [
                np.tile(opt_vars["pre_expr"], (n_imgs, 1)),
                opt_vars["expr"],
                np.tile(opt_vars["post_expr"], (n_imgs, 1)),
            ],
            axis=1,
        )
        return embeddings, np.asarray(opt_vars["rotations"])

    def _get_fine_tune_step(self, force_neutral: bool, n_imgs: int, tx):
        # Cache the compiled step: repeat fine-tunes with the same shape
        # (the demo's 'b' key, benchmarks) must not recompile.
        cache_key = (force_neutral, n_imgs)
        cached = self._fine_tune_step_cache.get(cache_key)
        if cached is not None:
            return cached
        cfg = self.config
        w_img = cfg["image_loss_weight"]
        w_dom = cfg["domain_adverserial_loss_weight"]
        w_rot = cfg["latent_regressor_rot_weight"]
        w_reg = cfg["latent_regression_weight"]

        def loss_fn(opt_vars, images, disc_params, latent_disc_params,
                    regressor_params, vgg_params, vggface_params):
            embeddings = jnp.concatenate(
                [
                    jnp.tile(opt_vars["pre_expr"], (n_imgs, 1)),
                    opt_vars["expr"],
                    jnp.tile(opt_vars["post_expr"], (n_imgs, 1)),
                ],
                axis=1,
            )
            out = self._gen_apply_ft(opt_vars["generator"], embeddings, opt_vars["rotations"])
            losses = {}
            losses["image_loss_real"] = 0.5 * w_img * self.perceptual_loss.loss_fn(
                vgg_params, images, out
            )
            losses["face_reco_loss"] = 0.5 * w_img * self.perceptual_loss_face_reco.loss_fn(
                vggface_params, out, images
            )
            for i, head in enumerate(self._disc_apply(disc_params, out).values()):
                losses[f"GAN_loss_real_{i}"] = gan_g_loss(head)
            ld_out = self._latent_disc_apply(latent_disc_params, embeddings)
            losses["latent_GAN_loss"] = w_dom * gan_d_loss(1.0, ld_out)
            labels = jnp.concatenate([embeddings, w_rot * opt_vars["rotations"]], axis=-1)
            reg_out = self._regressor_apply(regressor_params, out)
            losses["latent_regression_loss"] = normalized_latent_regression_loss(
                reg_out, labels, w_reg
            )
            losses["loss_sum"] = sum(losses.values())
            return losses["loss_sum"], out

        @jax.jit
        def step(opt_vars, opt_state, images, disc_params, latent_disc_params,
                 regressor_params, vgg_params, vggface_params):
            (loss_sum, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                opt_vars, images, disc_params, latent_disc_params,
                regressor_params, vgg_params, vggface_params,
            )
            updates, new_opt_state = tx.update(grads, opt_state, opt_vars)
            new_vars = optax.apply_updates(opt_vars, updates)
            return new_vars, new_opt_state, loss_sum, out

        self._fine_tune_step_cache[cache_key] = step
        return step

