"""Explicit PRNG handling.

The reference seeds three global RNGs once (reference: training_utils.py:8-11)
and then samples implicitly from numpy everywhere.  In JAX randomness is
explicit; this module provides a small stateful key-chain for host-side
orchestration code plus helpers for deterministic seeding, while all jitted
code receives explicit ``jax.random`` keys.
"""
from __future__ import annotations

import random
from typing import Optional

import jax
import numpy as np


class KeyChain:
    """A host-side splitter around a root ``jax.random`` key.

    Orchestrators hold one of these; every call to :meth:`next` returns a
    fresh subkey.  The number of keys drawn is tracked so checkpoint/resume
    can restore the stream position exactly.
    """

    def __init__(self, seed: int = 0, position: int = 0):
        self._seed = int(seed)
        self._position = 0
        self._key = jax.random.PRNGKey(self._seed)
        for _ in range(position):
            self.next()

    @property
    def seed(self) -> int:
        return self._seed

    @property
    def position(self) -> int:
        return self._position

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        self._position += 1
        return sub

    def numpy_rng(self) -> np.random.Generator:
        """A numpy Generator derived from the next subkey (for host-side
        sampling such as dataset index selection)."""
        sub = self.next()
        return np.random.default_rng(np.asarray(jax.random.key_data(sub)).tolist())


def initialize_random_seed(seed: int) -> None:
    """Seed numpy's and Python's global RNGs for host-side code paths that
    still use them (dataset shuffling in legacy-compatible CLIs).

    Reference counterpart: training_utils.py:8-11.
    """
    np.random.seed(seed)
    random.seed(seed)


def key_or_seed(key_or_int: Optional[object], default_seed: int = 0) -> jax.Array:
    if key_or_int is None:
        return jax.random.PRNGKey(default_seed)
    if isinstance(key_or_int, int):
        return jax.random.PRNGKey(key_or_int)
    return key_or_int
