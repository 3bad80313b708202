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
