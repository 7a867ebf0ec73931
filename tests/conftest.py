"""Test configuration: run on a virtual 8-device CPU mesh in float64.

Multi-chip sharding is validated on host CPU devices (the driver separately
dry-runs the multi-chip path); numerics parity requires x64.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment pre-sets jax_platforms="axon,cpu" (TPU tunnel); tests run on
# the virtual CPU mesh, so override at the config level (env var is ignored)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
