"""Test configuration: force an 8-device virtual CPU mesh so sharding paths
are exercised without TPU hardware.  Must run before jax is imported."""
import os

# Parity tests run the reference's TF-2.1-era Keras code; select legacy
# Keras 2 (tf_keras) BEFORE tensorflow is first imported anywhere.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
# Memoize deterministic Module.init results on disk (keyed by a hash of
# the package source, so any code edit invalidates the cache).  The big
# backbone inits otherwise dominate the fast suite on this 1-core host.
os.environ.setdefault("CONFIGNET_TPU_INIT_CACHE", "/tmp/confignet_init_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not honored when a TPU plugin (axon) is installed;
# force the CPU backend through the config API before any backend init.
# Set CONFIGNET_TPU_TEST_PLATFORM=tpu to run the suite (incl. the Pallas
# kernel tests) on real hardware instead.
import jax

if os.environ.get("CONFIGNET_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def temporary_output_dir(tmp_path):
    return str(tmp_path)
