"""Optional profiler hooks.

The CLIs accept ``--profile_dir``; when set, training runs inside a
``jax.profiler.trace`` so the XLA/TPU timeline (op durations, HBM traffic,
host gaps) can be inspected with TensorBoard's profile plugin or Perfetto.
No-op (zero overhead) when unset.
"""
from __future__ import annotations

import contextlib


def maybe_trace(profile_dir=None):
    """Context manager: ``jax.profiler.trace(profile_dir)`` when a directory
    is given, else a no-op."""
    if not profile_dir:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(profile_dir, create_perfetto_trace=True)


def enable_persistent_compilation_cache() -> None:
    """Point XLA's persistent compilation cache at a local directory so CLI
    reruns skip the (20-40 s per program on TPU) compile step.

    Called by the ``confignet_tpu.apps`` entry points.  Override the
    location with ``CONFIGNET_TPU_CACHE_DIR``; disable with
    ``CONFIGNET_TPU_CACHE_DIR=0``.  Safe to call multiple times.
    """
    import os

    configured = os.environ.get("CONFIGNET_TPU_CACHE_DIR")
    if configured == "0":
        return
    cache_dir = configured or os.path.join(
        os.path.expanduser("~"), ".cache", "confignet_tpu", "jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError) as exc:  # pragma: no cover
        print(f"WARNING: persistent compilation cache disabled ({exc})")
