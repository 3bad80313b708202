"""Opt-in disk cache for deterministic flax ``Module.init`` results.

``Module.init`` is pure: the same module configuration, RNG key, and
inputs always produce the same variables.  On single-core hosts the init
forward of the big backbone architectures (VGG19, VGGFace, ResNet50,
InceptionV3, MobileNetV2) dominates model-construction time, which in
turn dominates the test suite's wall clock.  Setting
``CONFIGNET_TPU_INIT_CACHE=<dir>`` memoizes init results on disk, keyed
by the module repr, the RNG key, the input values, and a hash of the
entire package source — any code change invalidates every entry, so a
stale architecture can never be served.

Off by default: without the env var, :func:`cached_init` behaves exactly
like ``jax.jit(module.init)`` (keyword arguments closed over statically).
"""
from __future__ import annotations

import functools
import hashlib
import os
import pickle
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

_PACKAGE_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@functools.lru_cache(maxsize=1)
def _package_salt() -> bytes:
    """Hash of every .py file in the package; invalidates on any edit."""
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(_PACKAGE_ROOT)):
        dirnames.sort()
        if "__pycache__" in dirpath:
            continue
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            h.update(path.encode())
            with open(path, "rb") as f:
                h.update(f.read())
    h.update(jax.__version__.encode())
    return h.digest()


def _entry_key(module, key, args, kwargs) -> str:
    h = hashlib.sha256()
    h.update(_package_salt())
    h.update(type(module).__qualname__.encode())
    h.update(repr(module).encode())
    try:
        key_data = jax.random.key_data(key)
    except TypeError:  # legacy raw uint32 PRNG keys
        key_data = key
    h.update(np.asarray(jax.device_get(key_data)).tobytes())
    for leaf in jax.tree_util.tree_leaves((args, kwargs)):
        if isinstance(leaf, np.ndarray):
            h.update(f"{leaf.shape}{leaf.dtype}".encode())
            h.update(leaf.tobytes())
        elif hasattr(leaf, "shape"):
            # jax.Array: hash the aval only.  Materializing device values
            # here blocks on every queued computation (measured ~9 s per
            # leaf on this host), and all call sites pass deterministic
            # zeros dummies whose identity IS their shape/dtype.  Callers
            # whose init depends on input *values* must pass numpy arrays.
            h.update(f"jax{leaf.shape}{leaf.dtype}".encode())
        else:
            h.update(repr(leaf).encode())
    return h.hexdigest()


def _jit_init(module, key, args, kwargs):
    init = jax.jit(functools.partial(module.init, **kwargs))
    return init(key, *args)


def cached_init(module, key, *args, **kwargs):
    """``module.init(key, *args, **kwargs)`` with optional disk memoization.

    Keyword arguments are treated as static (closed over before jit), so
    Python-level flags like ``train=False`` work unchanged.
    """
    cache_dir = os.environ.get("CONFIGNET_TPU_INIT_CACHE")
    if not cache_dir:
        return _jit_init(module, key, args, kwargs)

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _entry_key(module, key, args, kwargs) + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            host_tree = pickle.load(f)
        return jax.tree_util.tree_map(jnp.asarray, host_tree)

    variables = _jit_init(module, key, args, kwargs)
    host_tree = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    fd, tmp_path = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host_tree, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp_path, path)
    except BaseException:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    return variables
