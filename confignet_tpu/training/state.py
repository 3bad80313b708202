"""Train-state containers and optimizer construction.

Each adversarial player (generator-side, image discriminator, synthetic
discriminator, latent discriminator) carries its own params + Adam state in a
single pytree, so the whole multi-player GAN update is one jitted function
with the state donated in and out.  The generator player bundles the
generator, latent regressor and synthetic encoder params — the reference
updates those three with one optimizer in the G step
(confignet_first_stage.py:556-558).

The generator EMA ("smoothed" generator) lives in the state and is updated
inside the compiled step — replacing the reference's per-step host-side
get/set_weights round trip (confignet_first_stage.py:393-400).

Keras Adam parity note: Keras' default epsilon is 1e-7 (optax's is 1e-8);
we pass 1e-7.  The reference shares one Adam *instance* across the three
discriminator updates, which only affects the shared step counter used for
bias correction; each player here keeps its own counter (documented
divergence, converges identically after warm-up).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct


def make_adam(optimizer_config: Dict[str, Any]) -> optax.GradientTransformation:
    """Adam from the reference's optimizer config dict
    ({lr, beta_1, beta_2, amsgrad}, confignet_first_stage.py:46-51)."""
    lr = optimizer_config.get("lr", 4e-4)
    b1 = optimizer_config.get("beta_1", 0.0)
    b2 = optimizer_config.get("beta_2", 0.9)
    if optimizer_config.get("amsgrad", False):
        return optax.amsgrad(lr, b1=b1, b2=b2, eps=1e-7)
    return optax.adam(lr, b1=b1, b2=b2, eps=1e-7)


class Player(struct.PyTreeNode):
    """One adversarial player: parameter pytree + optimizer state."""

    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "Player":
        # jit the optimizer-state init: eagerly it dispatches one tiny
        # zeros_like per param leaf (hundreds of host round trips); as one
        # compiled program it is a single dispatch and the compilation
        # persists in the JAX compilation cache.
        return cls(params=params, opt_state=jax.jit(tx.init)(params))

    def apply_gradients(self, grads: Any, tx: optax.GradientTransformation) -> "Player":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        return Player(params=optax.apply_updates(self.params, updates), opt_state=new_opt_state)


def ema_update(ema_params: Any, new_params: Any, alpha: float = 0.999) -> Any:
    """smoothed <- alpha * smoothed + (1 - alpha) * current
    (reference: confignet_first_stage.py:393-400)."""
    return jax.tree_util.tree_map(
        lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, new_params
    )
