"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware.

Note: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) from
outside, so the env var route is not enough — jax.config.update wins.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
