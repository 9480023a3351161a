"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU-world fake backend,
SURVEY.md §4): XLA_FLAGS/JAX_PLATFORMS must be set before jax imports.
"""
import os

# Force CPU regardless of an inherited JAX_PLATFORMS (the axon TPU
# plugin overrides the env var, so set it through jax.config too) —
# unit tests are deterministic-f32 and multi-device via the virtual
# host-platform mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: jit compiles dominate suite runtime
jax.config.update("jax_compilation_cache_dir", "/tmp/ubtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# rbg PRNG: threefry inlines a hash network per random.normal — a
# jitted model.init with ~60 initialisers took 140 s to compile on
# XLA:CPU (11 s with rbg). Same default as the CLIs (utils/platform).
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
