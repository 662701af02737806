"""Platform selection honoring the user's environment.

Some plugin site customizations (e.g. this dev box's tunneled-TPU
``sitecustomize``) call ``jax.config.update("jax_platforms", ...)`` at
interpreter start, which silently overrides the user's ``JAX_PLATFORMS``
environment variable. The CLI apps call :func:`assert_env_platform` so an
explicit ``JAX_PLATFORMS=cpu`` (or any other choice) in the environment
wins again — required for running the apps on virtual CPU device meshes
(``--devices`` with ``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import os


def assert_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - best effort
        pass
