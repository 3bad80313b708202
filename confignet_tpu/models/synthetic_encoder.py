"""Synthetic-metadata encoder: one small MLP per face-model parameter.

Reference: confignet/dnn_models/synthetic_encoder.py.

Each face-model parameter (texture embedding, blendshapes, hair color, ...)
gets its own 2-layer MLP mapping its input dim to its slice of the latent
space; outputs are concatenated in the (alphabetically sorted) key order of
``facemodel_inputs``.  Individual per-parameter MLPs are addressable so a
single attribute can be re-encoded and spliced into an existing latent
(reference: confignet_first_stage.py:228-239); use
``module.apply(vars, name, value, method=module.encode_single_param)``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from confignet_tpu.models.blocks import MLP

FacemodelInputs = Union[Sequence[jax.Array], Dict[str, jax.Array], jax.Array]


class SyntheticDataEncoder(nn.Module):
    """``facemodel_inputs``: ordered sequence of (name, (input_dim, latent_dim)).

    Must already be sorted (the orchestrator sorts it alphabetically,
    mirroring confignet_first_stage.py:116).
    """

    facemodel_inputs: Tuple  # tuple of (name, (input_dim, latent_dim))
    num_layers: int = 2
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        mlps = {}
        for name, (input_dim, latent_dim) in self.facemodel_inputs:
            mlps[name] = MLP(
                num_layers=self.num_layers,
                num_hidden=input_dim,
                num_out=latent_dim,
                dtype=self.dtype,
                name=f"mlp_{name}",
            )
        self.mlps = mlps

    @property
    def param_names(self) -> List[str]:
        return [name for name, _ in self.facemodel_inputs]

    def split_stacked_input(self, stacked: jax.Array) -> Dict[str, jax.Array]:
        """Split a single stacked (B, sum(input_dims)) vector back into the
        per-parameter dict (reference: synthetic_encoder.py:35-48)."""
        out = {}
        offset = 0
        for name, (input_dim, _) in self.facemodel_inputs:
            out[name] = stacked[:, offset : offset + input_dim]
            offset += input_dim
        return out

    def _normalize_inputs(self, inputs: FacemodelInputs) -> Dict[str, jax.Array]:
        if isinstance(inputs, dict):
            return inputs
        if isinstance(inputs, (list, tuple)):
            return dict(zip(self.param_names, inputs))
        return self.split_stacked_input(inputs)

    def __call__(self, inputs: FacemodelInputs) -> jax.Array:
        input_dict = self._normalize_inputs(inputs)
        outputs = [self.mlps[name](input_dict[name]) for name in self.param_names]
        return jnp.concatenate(outputs, axis=1)

    def encode_single_param(self, name: str, value: jax.Array) -> jax.Array:
        """Run just one per-parameter MLP (for latent splicing)."""
        return self.mlps[name](value)
