"""Persistent XLA compilation cache (versioned).

First compilation of the encoder pipeline takes minutes on TPU (the
candidate-shift unrolls produce large programs); enabling JAX's persistent
compilation cache makes every subsequent process start in seconds. Used by
the CLI apps and bench.

The cache directory is VERSIONED by (svc_tpu version, jax version): the
boundary-layout pins (runtime/layouts.py) leave the concrete TILING of
pinned parameters unspecified, the compiled executable specializes to the
tiling of the first argument that reaches it, and the persistent cache
does NOT key on that choice — so an executable cached by an older build
whose staging path produced a different tiling can be loaded by a newer
build and fail every dispatch with ``INVALID_ARGUMENT: TPU backend error``
(this exact failure took out 3 of 4 bench matrix legs in the round-3
driver run). Keying the directory on both versions makes stale
cross-build executables unloadable. :func:`purge_cache` is the recovery
path when a live session still hits a poisoned entry.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

_BASE = os.path.expanduser("~/.cache/svc_tpu")


def cache_dir(path: Optional[str] = None) -> str:
    """The versioned cache directory currently in effect."""
    if path:
        return path
    env = os.environ.get("SVC_TPU_COMPILE_CACHE")
    if env:
        return env
    import jax

    import svc_tpu

    return os.path.join(
        _BASE, f"jax-v{svc_tpu.__version__}-jax{jax.__version__}"
    )


def enable_persistent_cache(path: Optional[str] = None) -> None:
    """Enable the JAX compilation cache at ``path`` (best effort)."""
    import jax

    d = cache_dir(path)
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a requirement


def purge_cache(path: Optional[str] = None) -> None:
    """Delete every entry in the versioned cache directory (best effort).

    Recovery path for a poisoned cache entry (see module docstring): a
    bench leg that fails with ``INVALID_ARGUMENT`` purges and retries once
    in a fresh process.
    """
    d = cache_dir(path)
    try:
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    except Exception:
        pass
