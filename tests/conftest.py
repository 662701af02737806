"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
``xla_force_host_platform_device_count=8`` CPU devices, per the framework's
multi-chip test strategy.
"""

import os

# force CPU: the machine env may pin JAX_PLATFORMS to the tunneled TPU
# (axon), which would run every test over the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# some environments import jax before this conftest (pytest plugins),
# capturing JAX_PLATFORMS at import time — override via config, which is
# honored until the backend is actually initialized
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
