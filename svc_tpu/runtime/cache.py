"""Persistent XLA compilation cache.

First compilation of the encoder pipeline takes minutes on TPU (the
candidate-shift unrolls produce large programs); enabling JAX's persistent
compilation cache makes every subsequent process start in seconds. Used by
the CLI apps and bench.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.expanduser("~/.cache/svc_tpu/jax")


def enable_persistent_cache(path: Optional[str] = None) -> None:
    """Enable the JAX compilation cache at ``path`` (best effort)."""
    import jax

    cache_dir = path or os.environ.get(
        "SVC_TPU_COMPILE_CACHE", _DEFAULT
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a requirement
