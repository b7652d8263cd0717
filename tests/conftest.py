"""Test harness config: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); the env vars must be set before jax is first imported.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
