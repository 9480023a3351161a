"""Platform selection honored in code.

The axon TPU plugin overrides the JAX_PLATFORMS env var, so CLIs honor
UBTPU_PLATFORM (e.g. ``UBTPU_PLATFORM=cpu``) through jax.config —
needed for CPU smoke runs, CI, and the virtual-mesh tests.
"""
from __future__ import annotations

import os


def apply_platform_env():
    plat = os.environ.get("UBTPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
