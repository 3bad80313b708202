"""ConfigNet first-stage trainer (synthetic-data stage).

Reference behavior being reproduced: confignet/confignet_first_stage.py.
TPU-native redesign:

- The reference runs four separate eager sub-steps per iteration with
  host-side numpy sampling and a host-side EMA weight round-trip
  (confignet_first_stage.py:597-626,393-400).  Here the whole iteration —
  image-D update, synth-D update, latent-D update, G update and the EMA —
  is ONE jitted function (:meth:`_train_step`) with donated state.  Latent
  noise, random rotations and flip augmentation are sampled on device from
  an explicit PRNG key; uint8 image batches are converted to [-1, 1] floats
  on device (4x less host->device traffic).
- Data parallelism: batch inputs are sharded over a ``Mesh``'s ``data``
  axis, parameters replicated; XLA inserts the gradient psums (see
  confignet_tpu/parallel/mesh.py).  ``mesh=None`` runs single-device.
- Checkpoints are pytree-path npz + JSON config (core/model_io.py), so they
  are introspectable without class pickles.
"""
from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from confignet_tpu.core import model_io
from confignet_tpu.core.config import merge_configs
from confignet_tpu.core.images import batched_hflip, build_image_matrix
from confignet_tpu.core.logging_utils import (
    LossFlusher,
    TensorBoardWriter,
    log_loss_vals,
    update_loss_dict,
)
from confignet_tpu.core.randomness import KeyChain
from confignet_tpu.losses import (
    compute_discriminator_loss,
    compute_latent_discriminator_loss,
    eye_loss,
    gan_g_loss,
    latent_regression_loss,
)
from confignet_tpu.losses.perceptual import PerceptualLoss
from confignet_tpu.models.blocks import MLP
from confignet_tpu.models.discriminator import HologanDiscriminator, HologanLatentRegressor
from confignet_tpu.models.generator import HologanGenerator
from confignet_tpu.models.synthetic_encoder import SyntheticDataEncoder
from confignet_tpu.training.state import Player, ema_update, make_adam
from flax import struct

# The de-facto config schema of the system: same keys/semantics as the
# reference's DEFAULT_CONFIG (confignet_first_stage.py:24-84) so that saved
# reference configs load unchanged.  ``facemodel_inputs`` maps each
# face-model parameter to (input_dim, latent_slice_dim); input dims are
# filled in from data by NeuralRendererDataset.process_metadata.
DEFAULT_CONFIG: Dict[str, Any] = {
    "model_type": None,
    "latent_dim": 128,
    "output_shape": (128, 128, 3),
    "const_input_shape": (4, 4, 4, 512),
    "n_adain_mlp_layers": 2,
    "n_adain_mlp_units": 128,
    "gen_output_activation": "tanh",
    "n_discr_features_at_layer_0": 48,
    "max_discr_filters": 512,
    "n_discr_layers": 5,
    "discr_conv_kernel_size": 3,
    "latent_regression_weight": 10.0,
    "use_style_discriminator": True,
    "rotation_ranges": ((-30, 30), (-10, 10), (0, 0)),
    "relu_before_in": True,
    "initial_from_rgb_layer_in_discr": True,
    "adain_on_learned_input": False,
    "latent_regressor_rot_weight": 5.0,
    "optimizer": {"lr": 0.0004, "beta_1": 0.0, "beta_2": 0.9, "amsgrad": False},
    "batch_size": 24,
    "n_discriminator_updates": 1,
    "n_generator_updates": 1,
    "latent_distribution": "normal",
    "metrics_checkpoint_period": 1000,
    "image_checkpoint_period": 500,
    "facemodel_inputs": {
        "texture_embedding": (None, 30),
        "geometry_identity_params": (None, 30),
        "blendshape_values": (None, 30),
        "beard_style_embedding": (None, 7),
        "eyebrow_style_embedding": (None, 7),
        "lower_eyelash_style": (None, 2),
        "upper_eyelash_style": (None, 2),
        "head_hair_style_embedding": (None, 9),
        "eye_color": (None, 3),
        "head_hair_color": (None, 3),
        "hdri_embedding": (None, 20),
        "bone_rotations:left_eye": (None, 2),
    },
    "num_synth_encoder_layers": 2,
    "n_latent_discr_layers": 4,
    "image_loss_weight": 0.00005,
    "eye_loss_weight": 5,
    "domain_adverserial_loss_weight": 5.0,
    # Optional pixel-space L1 alongside the perceptual image loss (0.0 =
    # reference-exact semantics).  Random-init VGG features under-anchor
    # COLOR, so in the from-scratch evidence regime the facemodel color
    # params (hair/eye) stay nearly invisible in the render; a small L1
    # anchors param->pixel directly (docs/TEST_RUNS.md round 5).
    "pixel_loss_weight": 0.0,
    # TPU-native extensions (absent keys in reference configs just take
    # these defaults on load):
    "n_generator_features": 256,
    "compute_dtype": "float32",  # "bfloat16" for max throughput
    "perceptual_taps": None,     # override VGG taps (tests use shallow taps)
    "rotation_resample": "auto",  # inference resample impl (pallas on TPU)
    "conv3d_impl": "auto",  # generator 3x3x3 conv lowering (ops/conv3d.py)
    "upconv_impl": "auto",  # upsample+conv lowering (ops/upconv.py)
    "backbones_dir": None,  # dir of Keras notop .h5 files (see core/pretrained.py)
    "r1_heads": "all",  # "final" = single-head R1, ~5x fewer D backward passes
    "loss_print_period": 50,  # steps between device->host loss flushes
    # Run metric/image/save checkpoints on a background worker from
    # device-side snapshots (keeps the step loop dispatching); set False for
    # the reference's inline-blocking behavior.
    "async_checkpointing": True,
    # Weight-file backend: "npz" (the reference's interchange format,
    # confignet_first_stage.py:173-206) or "orbax" — sharded, per-host
    # writes of live device arrays, the option for mesh/multi-host runs
    # where gathering every replica through device_get->np.savez doesn't
    # scale.  Config/distr/log sidecar files are identical in both modes.
    "checkpoint_format": "npz",
    "seed": 0,
}


def _use_async_checkpointing(config: Dict[str, Any]) -> bool:
    """Async checkpointing is single-process only: multi-process JAX requires
    every process to enqueue the same computations in the same order, and a
    worker thread issuing the checkpoint's device work (metric generation)
    would race the main loop's step dispatches and deadlock the gang-scheduled
    runtime.  Multi-host runs checkpoint inline (every process executes the
    identical block at the same step)."""
    return bool(config.get("async_checkpointing", True)) and jax.process_count() == 1


class FirstStageState(struct.PyTreeNode):
    """All trainable state of the first stage as one pytree."""

    generator: Player            # params: {generator, latent_regressor, synthetic_encoder}
    discriminator: Player
    synth_discriminator: Player
    latent_discriminator: Player
    generator_smoothed: Any      # EMA copy of generator params


class ConfigNetFirstStage:
    MODEL_TYPE = "ConfigNetFirstStage"

    def __init__(self, config: Dict[str, Any], initialize: bool = True):
        self.config = merge_configs(DEFAULT_CONFIG, config)
        self.config["model_type"] = self.MODEL_TYPE

        # Drop inputs without a known input dim, sort alphabetically, and
        # derive latent_dim as the sum of per-param latent slices
        # (reference: confignet_first_stage.py:114-120).
        inputs = {
            k: tuple(v)
            for k, v in self.config["facemodel_inputs"].items()
            if v[0] is not None
        }
        self.config["facemodel_inputs"] = dict(sorted(inputs.items()))
        self.config["latent_dim"] = int(
            sum(v[1] for v in self.config["facemodel_inputs"].values())
        )

        self.g_losses: Dict[str, List[float]] = {}
        self.d_losses: Dict[str, List[float]] = {}
        self.synth_d_losses: Dict[str, List[float]] = {}
        self.latent_d_losses: Dict[str, List[float]] = {}
        self.metrics: Dict[str, List] = {}

        self.n_checkpoint_rotations = 6
        self.n_checkpoint_samples = 10

        self.keychain = KeyChain(self.config.get("seed", 0))
        # Owned by the prefetch thread (_sample_host_batch); seeded from the
        # global stream so initialize_random_seed still governs it, but
        # isolated so main-thread np.random use can't shift batch order.
        self._batch_rng = np.random.RandomState(np.random.randint(0, 2**31))
        self.facemodel_param_distributions = None
        self.mesh = None
        # Async checkpointing: the worker thread renders/saves from these
        # donation-safe device snapshots instead of live (donated) state.
        self._checkpoint_worker = None
        self._inference_params_override = None
        self._snapshot_fn = None
        # Count of checkpoint blocks actually dispatched (inline or async).
        # bench_train.bench_checkpointing asserts on this so it can never
        # again report stall numbers for checkpoints that never ran.
        self.checkpoint_events_run = 0
        self.log_writer: Optional[TensorBoardWriter] = None
        self.aml_sink = None  # optional callable(name, value)

        self._checkpoint_visualization_input = None
        self._generator_input_for_metrics = None
        self._inception_metric_object = None
        self._train_step_fn = None
        self._generate_fn_cache: Dict[Tuple, Any] = {}
        self._metric_features_fn_cache: Dict[Tuple, Any] = {}

        self.perceptual_loss = PerceptualLoss(
            tuple(self.config["output_shape"]),
            model_type="imagenet",
            taps=self.config.get("perceptual_taps"),
        )
        from confignet_tpu.core.pretrained import maybe_load

        maybe_load(self.perceptual_loss.load_keras_weights,
                   self.config.get("backbones_dir"), "vgg19")

        self.state: Optional[FirstStageState] = None
        if initialize:
            self.initialize_network()

    # ------------------------------------------------------------------
    # Module / parameter construction
    # ------------------------------------------------------------------

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.config.get("compute_dtype") == "bfloat16" else None

    @property
    def facemodel_inputs_tuple(self) -> Tuple:
        return tuple(
            (name, tuple(dims)) for name, dims in self.config["facemodel_inputs"].items()
        )

    @property
    def facemodel_input_dim(self) -> int:
        """Total face-model input dims (reference: confignet_first_stage.py:209-215)."""
        return int(sum(v[0] for v in self.config["facemodel_inputs"].values()))

    def _generator_kwargs(self, rotation_resample: str = "gather") -> Dict[str, Any]:
        return dict(
            latent_dim=self.config["latent_dim"],
            output_shape=tuple(self.config["output_shape"][:2]),
            n_adain_mlp_units=self.config["n_adain_mlp_units"],
            n_adain_mlp_layers=self.config["n_adain_mlp_layers"],
            gen_output_activation=self.config["gen_output_activation"],
            const_shape=tuple(self.config["const_input_shape"]),
            n_features_first=self.config.get("n_generator_features", 256),
            dtype=self.compute_dtype,
            rotation_resample=rotation_resample,
            conv3d_impl=self.config.get("conv3d_impl", "auto"),
            upconv_impl=self.config.get("upconv_impl", "auto"),
        )

    def _discriminator_kwargs(self) -> Dict[str, Any]:
        return dict(
            img_shape=tuple(self.config["output_shape"][:2]),
            num_resample=self.config["n_discr_layers"],
            disc_kernel_size=self.config["discr_conv_kernel_size"],
            disc_expansion_factor=self.config["n_discr_features_at_layer_0"],
            disc_max_feature_maps=self.config["max_discr_filters"],
            initial_from_rgb_layer_in_discr=self.config["initial_from_rgb_layer_in_discr"],
            dtype=self.compute_dtype,
        )

    def _build_modules(self) -> None:
        # Three generator views over ONE parameter tree, differing only in
        # the rotation-resample implementation:
        # - train: pallas fwd + custom-VJP bwd on TPU ("auto_train"; train
        #   steps never differentiate rotations), gather on CPU;
        # - fast:  pallas fwd-only, for inference/EMA generation;
        # - ft:    gather (fully differentiable incl. rotations) for the
        #   one-shot fine-tune, which optimizes rotations.
        self.generator_module = HologanGenerator(
            **self._generator_kwargs(
                self.config.get("rotation_resample_train", "auto_train")
            )
        )
        self.generator_module_fast = HologanGenerator(
            **self._generator_kwargs(self.config.get("rotation_resample", "auto"))
        )
        self.generator_module_ft = HologanGenerator(**self._generator_kwargs("gather"))
        self.discriminator_module = HologanDiscriminator(**self._discriminator_kwargs())
        self.synth_discriminator_module = HologanDiscriminator(**self._discriminator_kwargs())
        self.latent_regressor_module = HologanLatentRegressor(
            latent_dim=self.config["latent_dim"], **self._discriminator_kwargs()
        )
        self.latent_discriminator_module = MLP(
            num_layers=self.config["n_latent_discr_layers"],
            num_hidden=self.config["latent_dim"],
            num_out=1,
            dtype=self.compute_dtype,
        )
        self.synthetic_encoder_module = SyntheticDataEncoder(
            facemodel_inputs=self.facemodel_inputs_tuple,
            num_layers=self.config["num_synth_encoder_layers"],
            dtype=self.compute_dtype,
        )
        self.generator_tx = make_adam(self.config["optimizer"])
        self.discriminator_tx = make_adam(self.config["optimizer"])

    def initialize_network(self) -> None:
        self._build_modules()

        latent_dim = self.config["latent_dim"]
        img_shape = (1, *self.config["output_shape"])
        z1 = jnp.zeros((1, latent_dim), jnp.float32)
        rot1 = jnp.zeros((1, 3), jnp.float32)
        img1 = jnp.zeros(img_shape, jnp.float32)
        facemodel1 = [
            jnp.zeros((1, dims[0]), jnp.float32)
            for _, dims in self.facemodel_inputs_tuple
        ]

        from confignet_tpu.core.init_cache import cached_init

        key = self.keychain.next()
        keys = jax.random.split(key, 6)
        gen_params = cached_init(self.generator_module, keys[0], z1, rot1)["params"]
        disc_params = cached_init(self.discriminator_module, keys[1], img1)["params"]
        synth_disc_params = cached_init(self.synth_discriminator_module, keys[2], img1)["params"]
        latent_disc_params = cached_init(self.latent_discriminator_module, keys[3], z1)["params"]
        regressor_params = cached_init(self.latent_regressor_module, keys[4], img1)["params"]
        synth_enc_params = cached_init(self.synthetic_encoder_module, keys[5], facemodel1)["params"]

        generator_player_params = {
            "generator": gen_params,
            "latent_regressor": regressor_params,
            "synthetic_encoder": synth_enc_params,
        }
        self.state = FirstStageState(
            generator=Player.create(generator_player_params, self.generator_tx),
            discriminator=Player.create(disc_params, self.discriminator_tx),
            synth_discriminator=Player.create(synth_disc_params, self.discriminator_tx),
            latent_discriminator=Player.create(latent_disc_params, self.discriminator_tx),
            generator_smoothed=jax.tree_util.tree_map(jnp.copy, gen_params),
        )

    # ------------------------------------------------------------------
    # Pure apply helpers (used inside jit)
    # ------------------------------------------------------------------

    def _gen_apply(self, params, latent, rotations):
        return self.generator_module.apply({"params": params}, latent, rotations)

    def _gen_apply_ft(self, params, latent, rotations):
        """Fully differentiable generator apply (rotations included) — used
        by paths that optimize rotations (one-shot fine-tune)."""
        return self.generator_module_ft.apply({"params": params}, latent, rotations)

    def _disc_apply(self, params, imgs):
        return self.discriminator_module.apply({"params": params}, imgs)

    def _synth_disc_apply(self, params, imgs):
        return self.synth_discriminator_module.apply({"params": params}, imgs)

    def _latent_disc_apply(self, params, latents):
        return self.latent_discriminator_module.apply({"params": params}, latents)

    def _regressor_apply(self, params, imgs):
        return self.latent_regressor_module.apply({"params": params}, imgs)

    def _synth_enc_apply(self, params, facemodel_params):
        return self.synthetic_encoder_module.apply({"params": params}, facemodel_params)

    def _sample_latent_on_device(self, key, n: int):
        if self.config["latent_distribution"] == "uniform":
            return jax.random.uniform(key, (n, self.config["latent_dim"]), minval=-1.0, maxval=1.0)
        return jax.random.normal(key, (n, self.config["latent_dim"]))

    def _sample_rotations_on_device(self, key, n: int):
        ranges = np.asarray(self.config["rotation_ranges"], np.float32) * np.pi / 180.0
        lo = jnp.asarray(ranges[:, 0])
        hi = jnp.asarray(ranges[:, 1])
        u = jax.random.uniform(key, (n, 3))
        return lo + u * (hi - lo)

    @staticmethod
    def _to_unit_range(u8):
        return u8.astype(jnp.float32) / 127.5 - 1.0

    # ------------------------------------------------------------------
    # The fused train step
    # ------------------------------------------------------------------

    def _build_train_step(self):
        cfg = self.config
        w_img = cfg["image_loss_weight"]
        w_pix = cfg.get("pixel_loss_weight", 0.0)
        w_eye = cfg["eye_loss_weight"]
        w_dom = cfg["domain_adverserial_loss_weight"]
        w_reg = cfg["latent_regression_weight"]
        w_rot = cfg["latent_regressor_rot_weight"]

        def g_step_losses(gen_player_params, disc_params, synth_disc_params,
                          latent_disc_params, vgg_params, batch, z_real, rot_real):
            losses = {}
            synth_latents = self._synth_enc_apply(
                gen_player_params["synthetic_encoder"], batch["g_facemodel"]
            )
            out_synth = self._gen_apply(
                gen_player_params["generator"], synth_latents, batch["g_rotations"]
            )
            out_real = self._gen_apply(gen_player_params["generator"], z_real, rot_real)

            gt = self._to_unit_range(batch["g_gt_imgs"])
            losses["image_loss"] = w_img * self.perceptual_loss.loss_fn(vgg_params, gt, out_synth)
            if w_pix > 0.0:
                losses["pixel_loss"] = w_pix * jnp.mean(jnp.abs(gt - out_synth))
            losses["eye_loss"] = w_eye * eye_loss(gt, out_synth, batch["g_eye_masks"])

            for i, head in enumerate(self._synth_disc_apply(synth_disc_params, out_synth).values()):
                losses[f"GAN_loss_synth_{i}"] = gan_g_loss(head)
            for i, head in enumerate(self._disc_apply(disc_params, out_real).values()):
                losses[f"GAN_loss_real_{i}"] = gan_g_loss(head)

            losses["latent_GAN_loss"] = w_dom * gan_g_loss(
                self._latent_disc_apply(latent_disc_params, synth_latents)
            )

            stacked_latents = jnp.concatenate([synth_latents, z_real], axis=0)
            stacked_outputs = jnp.concatenate([out_synth, out_real], axis=0)
            stacked_rotations = jnp.concatenate([batch["g_rotations"], rot_real], axis=0)
            labels = jnp.concatenate([stacked_latents, w_rot * stacked_rotations], axis=-1)
            reg_out = self._regressor_apply(gen_player_params["latent_regressor"], stacked_outputs)
            losses["latent_regression_loss"] = w_reg * latent_regression_loss(reg_out, labels)

            losses["loss_sum"] = sum(losses.values())
            return losses["loss_sum"], losses

        n_d_updates, n_g_updates, multi, sub_batch = self._sub_update_plan()

        def train_step(state: FirstStageState, key, batch, vgg_params):
            d_keys = jax.random.split(jax.random.fold_in(key, 0), n_d_updates)
            g_keys = jax.random.split(jax.random.fold_in(key, 1), n_g_updates)
            batch_size = batch["d_real_imgs"].shape[1 if multi else 0]

            discriminator = state.discriminator
            synth_discriminator = state.synth_discriminator
            latent_discriminator = state.latent_discriminator
            gen_params = state.generator.params

            for u in range(n_d_updates):
                keys = jax.random.split(d_keys[u], 5)
                b = sub_batch(batch, u, g_fields=False)

                # ---- image-discriminator update (real set vs G(z)) ----
                real_imgs = self._to_unit_range(b["d_real_imgs"])
                real_imgs = batched_hflip(
                    real_imgs, jax.random.bernoulli(keys[0], 0.5, (batch_size,))
                )
                z = self._sample_latent_on_device(keys[1], batch_size)
                rot = self._sample_rotations_on_device(keys[2], batch_size)
                fake_imgs = self._gen_apply(gen_params["generator"], z, rot)

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

                # ---- synth-discriminator update (synth set vs G(E_s(params))) ----
                synth_real = self._to_unit_range(b["synth_d_real_imgs"])
                synth_real = batched_hflip(
                    synth_real, jax.random.bernoulli(keys[3], 0.5, (batch_size,))
                )
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

                # ---- latent-discriminator update (z ~ prior vs E_s(params)) ----
                real_latents = self._sample_latent_on_device(keys[4], batch_size)
                fake_latents = self._synth_enc_apply(
                    gen_params["synthetic_encoder"], b["latent_d_facemodel"]
                )

                def latent_d_loss(params, real_latents=real_latents, fake_latents=fake_latents):
                    losses = compute_latent_discriminator_loss(
                        lambda zz: self._latent_disc_apply(params, zz), real_latents, fake_latents
                    )
                    return losses["loss_sum"], losses

                (_, latent_d_losses), ld_grads = jax.value_and_grad(latent_d_loss, has_aux=True)(
                    latent_discriminator.params
                )
                latent_discriminator = latent_discriminator.apply_gradients(
                    ld_grads, self.discriminator_tx
                )

            # ---- generator / regressor / synth-encoder joint update(s) ----
            generator = state.generator
            for u in range(n_g_updates):
                keys = jax.random.split(g_keys[u], 2)
                gb = sub_batch(batch, u, g_fields=True)
                n_synth = gb["g_gt_imgs"].shape[0]
                n_real = batch_size - n_synth
                z_real = self._sample_latent_on_device(keys[0], n_real)
                rot_real = self._sample_rotations_on_device(keys[1], n_real)

                (_, g_losses), g_grads = jax.value_and_grad(g_step_losses, has_aux=True)(
                    generator.params,
                    discriminator.params,
                    synth_discriminator.params,
                    latent_discriminator.params,
                    vgg_params,
                    gb,
                    z_real,
                    rot_real,
                )
                generator = generator.apply_gradients(g_grads, self.generator_tx)

            new_smoothed = ema_update(
                state.generator_smoothed, generator.params["generator"]
            )

            new_state = FirstStageState(
                generator=generator,
                discriminator=discriminator,
                synth_discriminator=synth_discriminator,
                latent_discriminator=latent_discriminator,
                generator_smoothed=new_smoothed,
            )
            all_losses = {
                "g": g_losses,
                "d": d_losses,
                "synth_d": synth_d_losses,
                "latent_d": latent_d_losses,
            }
            return new_state, all_losses

        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # Host-side batch assembly
    # ------------------------------------------------------------------

    def _facemodel_batch(self, dataset, idxs) -> Tuple[np.ndarray, ...]:
        return tuple(
            np.ascontiguousarray(dataset.metadata_inputs[name][idxs], dtype=np.float32)
            for name in self.config["facemodel_inputs"].keys()
        )

    def _n_player_updates(self) -> Tuple[int, int]:
        return (int(self.config.get("n_discriminator_updates", 1)),
                int(self.config.get("n_generator_updates", 1)))

    def _sub_update_plan(self):
        """``(n_d, n_g, multi, sub_batch)`` for a fused multi-sub-update
        step, shared by the stage-1 and stage-2 builders.

        With n_*_updates > 1 the host stacks a fresh batch per sub-update
        along a leading axis (reference semantics: each sub-step of
        confignet_first_stage.py:604-612 / confignet_second_stage.py:280-287
        resamples its own batch); sub-steps are statically unrolled so XLA
        sees fixed shapes.  ``sub_batch(batch, u, g_fields)`` picks one
        player's field group for sub-update ``u``."""
        n_d, n_g = self._n_player_updates()
        multi = n_d > 1 or n_g > 1

        def sub_batch(batch, u, g_fields):
            picked = {k: v for k, v in batch.items() if k.startswith("g_") == g_fields}
            if not multi:
                return picked
            return jax.tree_util.tree_map(lambda x: x[u], picked)

        return n_d, n_g, multi, sub_batch

    def _sample_host_batch(self, real_training_set, synth_training_set) -> Dict[str, Any]:
        """Assemble the (possibly multi-sub-update) host batch and shard it.

        When ``n_discriminator_updates``/``n_generator_updates`` > 1 each
        sub-update gets its own freshly sampled batch, stacked along a new
        leading axis (discriminator-player fields carry n_d entries,
        generator fields n_g) — matching the reference's per-sub-step
        resampling (confignet_first_stage.py:604-612)."""
        n_d, n_g = self._n_player_updates()
        if n_d == 1 and n_g == 1:
            batch = self._sample_host_batch_single(real_training_set, synth_training_set)
            batch_axis = 0
        else:
            # Each surplus draw gathers ONLY the field group its player
            # uses — with n_d != n_g the extra draws skip the other
            # player's expensive image gathers entirely.
            draws = [
                self._sample_host_batch_single(
                    real_training_set, synth_training_set,
                    d_fields=u < n_d, g_fields=u < n_g)
                for u in range(max(n_d, n_g))
            ]
            batch = {
                k: jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs),
                    *[d[k] for d in draws[: (n_g if k.startswith("g_") else n_d)]],
                )
                for k in draws[0]
            }
            batch_axis = 1
        if self.mesh is not None:
            from confignet_tpu.parallel import shard_batch

            batch = shard_batch(self.mesh, batch, batch_axis=batch_axis,
                                local_rows=True)
        return batch

    def _sample_host_batch_single(self, real_training_set, synth_training_set,
                                  d_fields: bool = True,
                                  g_fields: bool = True) -> Dict[str, Any]:
        from confignet_tpu.runtime import gather_images, gather_rows

        # Runs on the prefetch thread: use a dedicated RandomState (seeded
        # from the global stream at trainer construction) so concurrent
        # checkpoint-time np.random use on the main thread cannot perturb
        # the batch order — run-to-run batch sequences stay reproducible.
        rng = self._batch_rng
        batch_size = self.config["batch_size"]
        n_synth = batch_size // 2

        # Multi-host: every process draws identical GLOBAL index arrays
        # (lockstep RNG), then gathers only its own row range; shard_batch
        # assembles the global array from the per-process shards.
        from confignet_tpu.parallel import process_slice

        batch: Dict[str, Any] = {}
        if d_fields:
            sl = process_slice(batch_size)
            d_idx = rng.randint(0, real_training_set.imgs.shape[0], batch_size)[sl]
            sd_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            sd_fm_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            ld_fm_idx = rng.randint(0, synth_training_set.imgs.shape[0], batch_size)[sl]
            batch.update({
                "d_real_imgs": gather_images(real_training_set.imgs, d_idx),
                "synth_d_real_imgs": gather_images(synth_training_set.imgs, sd_idx),
                "synth_d_facemodel": self._facemodel_batch(synth_training_set, sd_fm_idx),
                "synth_d_rotations": np.ascontiguousarray(
                    synth_training_set.metadata_inputs["rotations"][sd_fm_idx], dtype=np.float32
                ),
                "latent_d_facemodel": self._facemodel_batch(synth_training_set, ld_fm_idx),
            })
        if g_fields:
            sl_g = process_slice(n_synth)
            g_idx = rng.randint(0, synth_training_set.imgs.shape[0], n_synth)[sl_g]
            batch.update({
                "g_facemodel": self._facemodel_batch(synth_training_set, g_idx),
                "g_rotations": np.ascontiguousarray(
                    synth_training_set.metadata_inputs["rotations"][g_idx], dtype=np.float32
                ),
                "g_gt_imgs": gather_images(synth_training_set.imgs, g_idx),
                "g_eye_masks": gather_rows(np.asarray(synth_training_set.eye_masks), g_idx),
            })
        return batch

    # ------------------------------------------------------------------
    # Training loop
    # ------------------------------------------------------------------

    def get_training_step_number(self) -> int:
        return 0 if "loss_sum" not in self.g_losses else len(self.g_losses["loss_sum"]) - 1

    def get_resume_step(self) -> int:
        """First step a resumed ``train()`` runs: the COUNT of completed
        steps in the loss history.  The reference resumes from
        get_training_step_number() (= last completed INDEX,
        confignet_first_stage.py:599-604), re-running the final step and
        appending a duplicate loss row; with our split checkpoint gates
        that one-row offset would also desynchronize the loop's
        ``step % period`` from run_checkpoints' history-derived
        step_number, silently disabling every later checkpoint.  Counting
        rows keeps both counters equal on fresh AND resumed runs."""
        return 0 if "loss_sum" not in self.g_losses else len(self.g_losses["loss_sum"])

    def get_batch_size(self) -> int:
        return self.config["batch_size"]

    def get_log_dict(self) -> Dict[str, Any]:
        return {"g_losses": self.g_losses, "d_losses": self.d_losses, "metrics": self.metrics}

    def set_logs(self, log_dict: Dict[str, Any]) -> None:
        self.g_losses = log_dict["g_losses"]
        self.d_losses = log_dict["d_losses"]
        self.metrics = log_dict["metrics"]

    def setup_training(self, log_dir, synth_training_set, n_samples_for_metrics,
                       real_training_set=None, mesh=None) -> None:
        if real_training_set is None:
            real_training_set = synth_training_set
        os.makedirs(log_dir, exist_ok=True)
        self.log_writer = TensorBoardWriter(log_dir)
        self.mesh = mesh
        if mesh is not None and self.config["batch_size"] % (2 * mesh.size) != 0:
            raise ValueError(
                "batch_size must be divisible by 2 * mesh size so the G-step "
                f"half-batch shards evenly; got batch_size={self.config['batch_size']} "
                f"over {mesh.size} devices"
            )

        try:
            from confignet_tpu.metrics.inception import InceptionMetrics

            self._inception_metric_object = InceptionMetrics(
                self.config, real_training_set, n_samples_for_metrics=n_samples_for_metrics
            )
        except Exception as exc:  # pragma: no cover - metrics are optional at train time
            print(f"WARNING: inception metrics disabled ({exc})")
            self._inception_metric_object = None

        rng = np.random
        self._generator_input_for_metrics = {
            "latent": self.sample_latent_vector(n_samples_for_metrics),
            "rotation": self.sample_rotations(n_samples_for_metrics),
        }

        checkpoint_latent = self.sample_latent_vector(self.n_checkpoint_samples)
        checkpoint_latent = np.vstack([checkpoint_latent] * self.n_checkpoint_rotations)
        ranges = np.asarray(self.config["rotation_ranges"], np.float32)
        yaw = np.pi * np.linspace(ranges[0][0], ranges[0][1], self.n_checkpoint_rotations) / 180
        checkpoint_rotation = np.zeros((self.n_checkpoint_rotations, 3), np.float32)
        checkpoint_rotation[:, 0] = yaw
        checkpoint_rotation = np.repeat(checkpoint_rotation, self.n_checkpoint_samples, axis=0)

        self._checkpoint_visualization_input = {
            "latent": checkpoint_latent,
            "rotation": checkpoint_rotation,
        }

        self.facemodel_param_distributions = synth_training_set.metadata_input_distributions

        viz_idx = rng.randint(0, synth_training_set.imgs.shape[0], self.n_checkpoint_samples)
        facemodel_params = [
            np.tile(p, (self.n_checkpoint_rotations, 1))
            for p in self._facemodel_batch(synth_training_set, viz_idx)
        ]
        self._checkpoint_visualization_input["facemodel_params"] = facemodel_params
        self._checkpoint_visualization_input["gt_imgs"] = np.copy(
            synth_training_set.imgs[viz_idx]
        ).astype(np.float32)

    def train(self, real_training_set, synth_training_set, output_dir, log_dir,
              n_steps=100000, n_samples_for_metrics=1000, aml_run=None,
              mesh=None) -> Dict[str, float]:
        """Run the training loop; returns {'loop_seconds', 'steps_run'} — the
        loop-only wall time (bench_train.py consumes it)."""
        self.setup_training(log_dir, synth_training_set, n_samples_for_metrics,
                            real_training_set=real_training_set, mesh=mesh)
        if aml_run is not None:
            self.aml_sink = lambda name, value: aml_run.log(name, value)
        start_step = self.get_resume_step()

        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        vgg_params = self.perceptual_loss.variables["params"]

        # The hot path issues NO blocking device->host fetch: losses are
        # buffered on device and flushed on a cadence / at checkpoint
        # boundaries (VERDICT r1: per-step device_get serialized the loop).
        # Batch sampling + host->device staging runs on a background thread
        # (data/prefetch.py) so the host indexing and the uint8 upload
        # overlap the device step instead of serializing with it.
        from confignet_tpu.data.prefetch import BatchPrefetcher

        flusher = LossFlusher(self.config.get("loss_print_period", 50))
        image_p = self.config["image_checkpoint_period"]
        metrics_p = self.config["metrics_checkpoint_period"]
        window_start = time.perf_counter()
        window_len = 0

        prefetcher = BatchPrefetcher(
            lambda: self._sample_host_batch(real_training_set, synth_training_set),
            depth=self.config.get("prefetch_depth", 2),
            device_put=self.mesh is None,  # shard_batch already placed mesh batches
        )
        if _use_async_checkpointing(self.config):
            from confignet_tpu.core.async_checkpoint import CheckpointWorker

            self._checkpoint_worker = CheckpointWorker()
        loop_start = time.perf_counter()
        try:
            self._train_loop(prefetcher, flusher, start_step, n_steps, vgg_params,
                             image_p, metrics_p, window_start, window_len,
                             output_dir, log_dir)
        finally:
            prefetcher.close()
            if self._checkpoint_worker is not None:
                worker, self._checkpoint_worker = self._checkpoint_worker, None
                worker.close()  # runs pending jobs, re-raises failures
        # Loop-only wall time (incl. the final checkpoint drain), for
        # benchmarking the step path without setup/compile.  A resumed model
        # whose history already exceeds n_steps runs zero steps (the range
        # is empty) — report 0, not a negative count that would corrupt
        # downstream steps/s math.
        return {"loop_seconds": time.perf_counter() - loop_start,
                "steps_run": max(0, n_steps - start_step)}

    def _train_loop(self, prefetcher, flusher, start_step, n_steps, vgg_params,
                    image_p, metrics_p, window_start, window_len,
                    output_dir, log_dir) -> None:
        for step in range(start_step, n_steps):
            batch = prefetcher.next()
            key = self.keychain.next()
            self.state, losses = self._train_step_fn(self.state, key, batch, vgg_params)
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
            # The flush synced the device, so this is a true per-step time
            # averaged over the async window.
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
    # Checkpoints / metrics
    # ------------------------------------------------------------------

    def run_checkpoints(self, output_dir: str, iteration_time: float) -> None:
        """Dispatch the checkpoint block — inline (reference semantics,
        confignet_first_stage.py:616-626) or, with ``async_checkpointing``
        on, to the background worker from donation-safe device snapshots so
        the step loop keeps dispatching."""
        step_number = self.get_training_step_number()
        image_due = step_number % self.config["image_checkpoint_period"] == 0
        metrics_due = step_number % self.config["metrics_checkpoint_period"] == 0
        if not (image_due or metrics_due):
            return
        self.checkpoint_events_run += 1

        if self._checkpoint_worker is None:
            losses = {"g": self.g_losses, "d": self.d_losses,
                      "synth_d": self.synth_d_losses, "latent_d": self.latent_d_losses}
            self._run_checkpoints_body(
                output_dir, iteration_time, step_number, image_due, metrics_due,
                losses, self._get_device_weights() if metrics_due else None)
            return

        # HBM copies (one jitted dispatch per tree structure): the worker
        # must never read live state — the next train step donates it.
        # Image-only checkpoints copy just the three inference trees; the
        # full-model snapshot (all 7 trees, one extra model in HBM per
        # queued job) is only taken when the save itself is due.
        if self._snapshot_fn is None:
            self._snapshot_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t))
        live_weights = self._get_device_weights()
        if not metrics_due:
            infer_keys = ("generator_smoothed", "synthetic_encoder", "real_encoder")
            live_weights = {k: live_weights[k] for k in infer_keys
                            if k in live_weights}
        device_weights = self._snapshot_fn(live_weights)
        infer_snap = {
            "generator_smoothed": device_weights["generator_smoothed"],
            "synthetic_encoder": device_weights["synthetic_encoder"],
        }
        if "real_encoder" in device_weights:
            infer_snap["real_encoder"] = device_weights["real_encoder"]
        # Loss histories are lists the main thread keeps appending to.
        losses = {
            "g": {k: list(v) for k, v in self.g_losses.items()},
            "d": {k: list(v) for k, v in self.d_losses.items()},
            "synth_d": {k: list(v) for k, v in self.synth_d_losses.items()},
            "latent_d": {k: list(v) for k, v in self.latent_d_losses.items()},
        }

        def job():
            self._inference_params_override = infer_snap
            try:
                self._run_checkpoints_body(
                    output_dir, iteration_time, step_number, image_due,
                    metrics_due, losses, device_weights if metrics_due else None)
            finally:
                self._inference_params_override = None

        self._checkpoint_worker.submit(job)

    def _run_checkpoints_body(self, output_dir: str, iteration_time: float,
                              step_number: int, image_due: bool, metrics_due: bool,
                              losses: Dict[str, Dict], device_weights) -> None:
        checkpoint_start = time.perf_counter()

        if image_due:
            log_loss_vals(losses["synth_d"], output_dir, step_number,
                          "synth_discriminator_", self.log_writer, self.aml_sink)
            log_loss_vals(losses["latent_d"], output_dir, step_number,
                          "latent_discriminator_", self.log_writer, self.aml_sink)

        if metrics_due:
            self.calculate_metrics(output_dir, step_number=step_number)
            checkpoint_dir = os.path.join(output_dir, "checkpoints")
            os.makedirs(checkpoint_dir, exist_ok=True)
            log_dict = {"g_losses": losses["g"], "d_losses": losses["d"],
                        "metrics": self.metrics}
            # orbax takes the device trees directly (per-host shard writes);
            # npz gathers to host first.
            if self.config.get("checkpoint_format", "npz") != "orbax":
                device_weights = jax.device_get(device_weights)
            self._write_checkpoint_files(
                device_weights, log_dict,
                checkpoint_dir, str(step_number).zfill(6))

        if image_due:
            self.image_checkpoint(output_dir, step_number=step_number)
            log_loss_vals(losses["g"], output_dir, step_number, "generator_",
                          self.log_writer, self.aml_sink)
            log_loss_vals(losses["d"], output_dir, step_number, "discriminator_",
                          self.log_writer, self.aml_sink)

            checkpoint_time = time.perf_counter() - checkpoint_start
            print("Training iteration time: %f" % iteration_time)
            print("Checkpoint time: %f" % checkpoint_time)
            if self.log_writer is not None:
                self.log_writer.scalar("perf/training_iter_time", iteration_time, step_number)
                self.log_writer.scalar("perf/checkpoint_time", checkpoint_time, step_number)
            if self.aml_sink is not None:
                self.aml_sink("Training iter time", iteration_time)
                self.aml_sink("Checkpoint time", checkpoint_time)

    def image_checkpoint(self, output_dir: str, step_number: int = None) -> None:
        if step_number is None:
            step_number = self.get_training_step_number()
        viz = self._checkpoint_visualization_input
        generated = self.generate_images(viz["latent"], viz["rotation"])
        combined = build_image_matrix(generated, self.n_checkpoint_rotations, self.n_checkpoint_samples)

        img_dir = os.path.join(output_dir, "output_imgs")
        os.makedirs(img_dir, exist_ok=True)
        self._imwrite(os.path.join(img_dir, str(step_number).zfill(6) + ".png"), combined)
        if self.log_writer is not None:
            self.log_writer.image("generated_images", combined, step_number)
        self.synth_data_image_checkpoint(output_dir, step_number=step_number)

    def synth_data_image_checkpoint(self, output_dir: str, step_number: int = None) -> None:
        if step_number is None:
            step_number = self.get_training_step_number()
        viz = self._checkpoint_visualization_input
        generated = self.generate_images_from_facemodel(viz["facemodel_params"], viz["rotation"])
        generated = np.vstack((viz["gt_imgs"].astype(np.uint8), generated))
        combined = build_image_matrix(
            generated, self.n_checkpoint_rotations + 1, self.n_checkpoint_samples
        )
        img_dir = os.path.join(output_dir, "output_imgs")
        os.makedirs(img_dir, exist_ok=True)
        self._imwrite(os.path.join(img_dir, str(step_number).zfill(6) + "_synth.jpg"), combined)
        if self.log_writer is not None:
            self.log_writer.image("generated_synth_images", combined, step_number)

    @staticmethod
    def _imwrite(path: str, img_bgr: np.ndarray) -> None:
        try:
            import cv2

            # Checkpoint panels are multi-megapixel; zlib level 1 encodes
            # ~3x faster than cv2's default (3) for ~15% larger files —
            # the right trade on the checkpoint path.
            params = ([cv2.IMWRITE_PNG_COMPRESSION, 1]
                      if path.endswith(".png") else [])
            cv2.imwrite(path, img_bgr, params)
        except ImportError:  # pragma: no cover
            from PIL import Image

            Image.fromarray(img_bgr[..., ::-1]).save(path)

    def generate_output_for_metrics(self) -> np.ndarray:
        m = self._generator_input_for_metrics
        return self.generate_images(m["latent"], m["rotation"])

    def _metric_latents_and_rotations(self):
        """The (latent, rotation) pair FID/KID scores — stage 2 overrides to
        encode the fixed real-image metric batch instead."""
        m = self._generator_input_for_metrics
        return m["latent"], m["rotation"]

    def calculate_metrics(self, output_dir: str, step_number: int = None) -> None:
        if self._inception_metric_object is None:
            return
        if step_number is None:
            step_number = self.get_training_step_number()
        latent, rotation = self._metric_latents_and_rotations()
        features = self._metric_features_for_latents(latent, rotation)
        self.metrics.setdefault("training_step_number", []).append(step_number)
        self._inception_metric_object.update_and_log_metrics(
            None, self.metrics, output_dir, self.aml_sink, self.log_writer,
            features=features,
        )

    # ------------------------------------------------------------------
    # Host-side sampling helpers (metrics / viz / controllability)
    # ------------------------------------------------------------------

    def sample_latent_vector(self, n_samples: int) -> np.ndarray:
        if self.config["latent_distribution"] == "uniform":
            return np.random.uniform(-1, 1, (n_samples, self.config["latent_dim"]))
        return np.random.normal(0, 1, (n_samples, self.config["latent_dim"]))

    def sample_rotations(self, n_samples: int, axes=(0, 1, 2)) -> np.ndarray:
        rotation = np.zeros((n_samples, 3), np.float32)
        for axis in axes:
            lo, hi = self.config["rotation_ranges"][axis]
            rotation[:, axis] = np.pi * np.random.uniform(lo, hi, n_samples) / 180.0
        return rotation

    def sample_facemodel_params(self, n_samples: int) -> List[np.ndarray]:
        return [
            self.facemodel_param_distributions[name].sample(n_samples)[0]
            for name in self.config["facemodel_inputs"].keys()
        ]

    # ------------------------------------------------------------------
    # Latent manipulation API
    # ------------------------------------------------------------------

    def get_facemodel_param_idxs_in_latent(self, param_name: str) -> range:
        names = list(self.config["facemodel_inputs"].keys())
        dims = list(self.config["facemodel_inputs"].values())
        idx = names.index(param_name)
        start = int(sum(d[1] for d in dims[:idx]))
        return range(start, start + dims[idx][1])

    def set_facemodel_param_in_latents(self, latents, param_name: str, param_value) -> np.ndarray:
        param_value = np.asarray(param_value, dtype=np.float32)
        if param_value.ndim == 1:
            param_value = param_value[np.newaxis]
        encoded = self.synthetic_encoder_module.apply(
            {"params": self._synth_encoder_params()},
            param_name,
            jnp.asarray(param_value),
            method=self.synthetic_encoder_module.encode_single_param,
        )
        idxs = self.get_facemodel_param_idxs_in_latent(param_name)
        new_latents = np.copy(latents)
        new_latents[:, list(idxs)] = np.asarray(encoded, dtype=new_latents.dtype)
        return new_latents

    def fit_facemodel_expression_params_to_latent(
        self, latent, unused_expr_idxs=None, param_name="blendshape_values",
        n_iters=2000, learning_rate=0.05, verbose=False,
    ) -> np.ndarray:
        """Invert the per-parameter MLP by SGD to recover face-model params
        from a latent slice (reference: confignet_first_stage.py:646-680).
        The whole optimization runs as one jitted lax.fori_loop."""
        idxs = self.get_facemodel_param_idxs_in_latent(param_name)
        target = jnp.asarray(np.asarray(latent)[:, list(idxs)], jnp.float32)
        input_dim = dict(self.config["facemodel_inputs"])[param_name][0]

        mask = np.ones((1, input_dim), np.float32)
        if unused_expr_idxs is not None:
            mask[:, list(unused_expr_idxs)] = 0.0
        mask = jnp.asarray(mask)

        enc_params = self._synth_encoder_params()
        module = self.synthetic_encoder_module

        def predict(values):
            return module.apply(
                {"params": enc_params}, param_name, values, method=module.encode_single_param
            )

        def body(_, values):
            grads = jax.grad(lambda v: jnp.mean(jnp.square(target - predict(v))))(values)
            values = values - learning_rate * grads
            values = jnp.clip(values, 0.0, 1.0) * mask
            return values

        init = jnp.zeros((1, input_dim), jnp.float32)
        result = jax.jit(
            lambda v: jax.lax.fori_loop(0, n_iters, body, v)
        )(init)
        if verbose:
            final_loss = float(jnp.mean(jnp.square(target - predict(result))))
            print(f"fit_facemodel_expression_params_to_latent: final loss {final_loss:f}")
        return np.asarray(result)

    def _synth_encoder_params(self):
        if self._inference_params_override is not None:
            return self._inference_params_override["synthetic_encoder"]
        return self.state.generator.params["synthetic_encoder"]

    # ------------------------------------------------------------------
    # Inference
    # ------------------------------------------------------------------

    def _get_generate_fn(self, chunk: int):
        # Fine-tuned vs EMA weights are selected by
        # _generator_params_for_inference (overridden in second_stage); the
        # compiled fn is weight-agnostic.  The [-1,1]->uint8 conversion runs
        # ON DEVICE (same clip/scale/truncate arithmetic as
        # core.images.unit_range_to_uint8, in f32) so the host transfer is
        # 1 byte/px instead of 4 — on a tunnel-attached chip the transfer
        # dominates the checkpoint-panel and metric-generation cost.
        if chunk not in self._generate_fn_cache:
            module = self.generator_module_fast

            def generate_uint8(params, latent, rot):
                img = module.apply({"params": params}, latent, rot)
                img = (img.astype(jnp.float32) + 1.0) * 127.5
                return jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)

            self._generate_fn_cache[chunk] = jax.jit(generate_uint8)
        return self._generate_fn_cache[chunk]

    def _get_metric_features_fn(self, chunk: int):
        """Fused generator->InceptionV3 features for FID/KID: the generated
        images never cross to the host (64x2048 floats do instead of
        n*HW*3 image bytes).  The in-graph uint8 quantization keeps the
        metric semantics identical to scoring saved uint8 images."""
        if chunk not in self._metric_features_fn_cache:
            from confignet_tpu.models.backbones.inception import inception_preprocess

            gen = self.generator_module_fast
            incep = self._inception_metric_object.inception_feature_extractor.module

            def fused(gen_params, incep_params, latent, rot):
                img = gen.apply({"params": gen_params}, latent, rot)
                img = (img.astype(jnp.float32) + 1.0) * 127.5
                img = jnp.clip(img, 0.0, 255.0).astype(jnp.uint8).astype(jnp.float32)
                return incep.apply(
                    {"params": incep_params}, inception_preprocess(img)
                ).astype(jnp.float32)

            self._metric_features_fn_cache[chunk] = jax.jit(fused)
        return self._metric_features_fn_cache[chunk]

    def _metric_features_for_latents(self, latent_vectors, rotations,
                                     batch_chunk: int = 64) -> np.ndarray:
        """Chunked fused-path features (padding the tail, like
        generate_images) for the metric latents."""
        latent_vectors = np.asarray(latent_vectors, np.float32)
        rotations = np.asarray(rotations, np.float32)
        n = latent_vectors.shape[0]
        chunk = min(batch_chunk, max(n, 1))
        fn = self._get_metric_features_fn(chunk)
        gen_params = self._generator_params_for_inference()
        incep_params = (
            self._inception_metric_object.inception_feature_extractor.variables["params"]
        )
        out = np.zeros((n, 2048), np.float32)
        for start in range(0, n, chunk):
            lat = latent_vectors[start : start + chunk]
            rot = rotations[start : start + chunk]
            pad = chunk - lat.shape[0]
            if pad:
                lat = np.concatenate([lat, np.repeat(lat[-1:], pad, axis=0)])
                rot = np.concatenate([rot, np.repeat(rot[-1:], pad, axis=0)])
            feats = np.asarray(fn(gen_params, incep_params,
                                  jnp.asarray(lat), jnp.asarray(rot)))
            out[start : start + chunk] = feats[: chunk - pad] if pad else feats
        return out

    def _generator_params_for_inference(self):
        if self._inference_params_override is not None:
            return self._inference_params_override["generator_smoothed"]
        return self.state.generator_smoothed

    def generate_images(self, latent_vectors, rotations, batch_chunk: int = 32) -> np.ndarray:
        """EMA-generator forward -> uint8 BGR images, chunked at a fixed
        batch size (padding the tail) so jit compiles once."""
        latent_vectors = np.asarray(latent_vectors, np.float32)
        rotations = np.asarray(rotations, np.float32)
        n = latent_vectors.shape[0]
        chunk = min(batch_chunk, max(n, 1))
        fn = self._get_generate_fn(chunk)
        params = self._generator_params_for_inference()

        outputs = []
        for start in range(0, n, chunk):
            lat = latent_vectors[start : start + chunk]
            rot = rotations[start : start + chunk]
            pad = chunk - lat.shape[0]
            if pad:
                lat = np.concatenate([lat, np.repeat(lat[-1:], pad, axis=0)])
                rot = np.concatenate([rot, np.repeat(rot[-1:], pad, axis=0)])
            imgs = np.asarray(fn(params, jnp.asarray(lat), jnp.asarray(rot)))
            if pad:
                imgs = imgs[:-pad]
            outputs.append(imgs)
        if not outputs:
            return np.zeros((0,), np.uint8)
        return np.concatenate(outputs, axis=0)  # already uint8, on device

    def generate_images_from_facemodel(self, facemodel_params, rotations) -> np.ndarray:
        latents = np.asarray(
            self._synth_enc_apply(
                self._synth_encoder_params(),
                [jnp.asarray(np.asarray(p, np.float32)) for p in facemodel_params],
            )
        )
        return self.generate_images(latents, rotations)

    # ------------------------------------------------------------------
    # Weights / checkpoint IO
    # ------------------------------------------------------------------

    def _get_device_weights(self) -> Dict[str, Any]:
        """The get_weights dict, but as live device trees (no host fetch)."""
        state = self.state
        return {
            "generator": state.generator.params["generator"],
            "generator_smoothed": state.generator_smoothed,
            "latent_regressor": state.generator.params["latent_regressor"],
            "synthetic_encoder": state.generator.params["synthetic_encoder"],
            "discriminator": state.discriminator.params,
            "synth_discriminator": state.synth_discriminator.params,
            "latent_discriminator": state.latent_discriminator.params,
        }

    def get_weights(self) -> Dict[str, Any]:
        return jax.device_get(self._get_device_weights())

    def set_weights(self, weights: Dict[str, Any]) -> None:
        """Replace model parameters (optimizer state is reset)."""
        as_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        gen_player_params = {
            "generator": as_jnp(weights["generator"]),
            "latent_regressor": as_jnp(weights["latent_regressor"]),
            "synthetic_encoder": as_jnp(weights["synthetic_encoder"]),
        }
        self.state = FirstStageState(
            generator=Player.create(gen_player_params, self.generator_tx),
            discriminator=Player.create(as_jnp(weights["discriminator"]), self.discriminator_tx),
            synth_discriminator=Player.create(
                as_jnp(weights["synth_discriminator"]), self.discriminator_tx
            ),
            latent_discriminator=Player.create(
                as_jnp(weights["latent_discriminator"]), self.discriminator_tx
            ),
            generator_smoothed=as_jnp(weights["generator_smoothed"]),
        )

    def save(self, output_dir: str, output_filename: str) -> None:
        # The orbax backend takes live device trees so each host writes only
        # its addressable shards; npz needs the host copy.
        weights = (self._get_device_weights()
                   if self.config.get("checkpoint_format", "npz") == "orbax"
                   else self.get_weights())
        self._write_checkpoint_files(
            weights, self.get_log_dict(), output_dir, output_filename)

    def _write_checkpoint_files(self, weights: Dict[str, Any], log_dict: Dict[str, Any],
                                output_dir: str, output_filename: str) -> None:
        """The IO half of ``save``, callable from the checkpoint worker with
        pre-snapshotted weights/logs."""
        os.makedirs(output_dir, exist_ok=True)
        if self.config.get("checkpoint_format", "npz") == "orbax":
            model_io.save_weights_orbax(
                weights, os.path.join(output_dir, output_filename + ".orbax"))
        else:
            model_io.save_model_weights(weights, output_dir, output_filename)
        with open(os.path.join(output_dir, output_filename + ".json"), "w") as fp:
            json.dump(self._json_safe_config(), fp, indent=4)
        with open(
            os.path.join(output_dir, output_filename + "_facemodel_distr.pck"), "wb"
        ) as fp:
            pickle.dump(self.facemodel_param_distributions, fp)
        log_path = os.path.join(output_dir, output_filename + "_log.json")
        with open(log_path, "w") as fp:
            json.dump(log_dict, fp)

    def _json_safe_config(self) -> Dict[str, Any]:
        def sanitize(obj):
            if isinstance(obj, dict):
                return {k: sanitize(v) for k, v in obj.items()}
            if isinstance(obj, (tuple, list)):
                return [sanitize(v) for v in obj]
            if isinstance(obj, (np.integer,)):
                return int(obj)
            if isinstance(obj, (np.floating,)):
                return float(obj)
            return obj

        return sanitize(self.config)

    @classmethod
    def load(cls, file_path: str) -> "ConfigNetFirstStage":
        """Load a checkpoint — ours (pytree-path npz) or an official
        reference release (Keras weight-list npz, e.g. the published
        ``model.zip`` contents): the npz key layout is sniffed and
        reference-format files are routed through the strict Keras-order
        importer, so every entry point (demo, eval CLIs, load_confignet)
        works unmodified against either format."""
        npz_path = os.path.splitext(file_path)[0] + ".npz"
        orbax_path = os.path.splitext(file_path)[0] + ".orbax"
        if not os.path.exists(npz_path) and os.path.isdir(orbax_path):
            # checkpoint_format="orbax" runs save a sharded directory
            # instead of an npz; everything else is identical.
            with open(file_path, "r") as fp:
                config = json.load(fp)
            model = cls(config)
            model.set_weights(model_io.load_weights_orbax(orbax_path))
        elif model_io.npz_is_reference_format(npz_path):
            from confignet_tpu.core.reference_import import load_reference_confignet

            model = load_reference_confignet(file_path)
        else:
            with open(file_path, "r") as fp:
                config = json.load(fp)
            model = cls(config)
            model.set_weights(model_io.load_model_weights(npz_path))

        log_file = os.path.splitext(file_path)[0] + "_log.json"
        if os.path.exists(log_file):
            with open(log_file, "r") as fp:
                model.set_logs(json.load(fp))

        distr_file = os.path.splitext(file_path)[0] + "_facemodel_distr.pck"
        if os.path.exists(distr_file):
            # Handles pickles from this repo AND from the original TF repo
            # (whose distribution classes live at confignet.* module paths).
            from confignet_tpu.core.reference_import import load_reference_pickle

            model.facemodel_param_distributions = load_reference_pickle(distr_file)
        else:
            print("WARNING: facemodel param distributions not loaded")
        return model
