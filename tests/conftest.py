"""Test harness config: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI).  The environment pre-selects the remote `axon` TPU
platform via sitecustomize, and JAX_PLATFORMS from the env is overridden
there — so the platform must be forced back to cpu through jax.config
*before any backend is initialized*.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
