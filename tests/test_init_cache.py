"""Disk cache for deterministic Module.init results (core/init_cache.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from confignet_tpu.core.init_cache import cached_init


class _Tiny(nn.Module):
    width: int = 8

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.width)(x)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cache_roundtrip_identical(tmp_path, monkeypatch):
    monkeypatch.setenv("CONFIGNET_TPU_INIT_CACHE", str(tmp_path))
    m = _Tiny()
    x = jnp.ones((1, 4))
    v1 = cached_init(m, jax.random.PRNGKey(0), x)  # miss: runs init, writes
    files = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert len(files) == 1
    v2 = cached_init(m, jax.random.PRNGKey(0), x)  # hit: loads from disk
    _tree_equal(v1, v2)
    # and the cached result matches a plain uncached init
    v3 = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    _tree_equal(v1, v3)


def test_distinct_keys_distinct_entries(tmp_path, monkeypatch):
    monkeypatch.setenv("CONFIGNET_TPU_INIT_CACHE", str(tmp_path))
    m = _Tiny()
    x = jnp.ones((1, 4))
    cached_init(m, jax.random.PRNGKey(0), x)
    cached_init(m, jax.random.PRNGKey(1), x)
    cached_init(_Tiny(width=16), jax.random.PRNGKey(0), x)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    assert len(files) == 3


def test_disabled_without_env(tmp_path, monkeypatch):
    monkeypatch.delenv("CONFIGNET_TPU_INIT_CACHE", raising=False)
    m = _Tiny()
    x = jnp.ones((1, 4))
    v = cached_init(m, jax.random.PRNGKey(0), x)
    assert not os.listdir(tmp_path)
    _tree_equal(v, jax.jit(m.init)(jax.random.PRNGKey(0), x))


def test_kwargs_are_part_of_the_key(tmp_path, monkeypatch):
    monkeypatch.setenv("CONFIGNET_TPU_INIT_CACHE", str(tmp_path))

    class WithFlag(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            # param shape depends on the flag so a key collision would be
            # visible as a wrong-shaped tree
            return nn.Dense(4 if train else 2)(x)

    m = WithFlag()
    x = jnp.ones((1, 3))
    v_eval = cached_init(m, jax.random.PRNGKey(0), x, train=False)
    v_train = cached_init(m, jax.random.PRNGKey(0), x, train=True)
    assert v_eval["params"]["Dense_0"]["kernel"].shape == (3, 2)
    assert v_train["params"]["Dense_0"]["kernel"].shape == (3, 4)
