"""Region/gaze-adaptive coefficient quantization.

The decoder picks a quantization step per transform block — 1 inside the
gaze rectangle, otherwise the background step for background blocks and the
foreground step for everything else — then quantizes every DCT coefficient
by divide / round / multiply (reference: libs/decoder.cpp:128-149).

``std::round`` rounds halves away from zero; ``jnp.round`` is banker's
rounding, so the away-from-zero rule is implemented explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp

from svc_tpu.io.bitstream import BLOCK_TYPE_BACKGROUND


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C ``std::round`` semantics (libs/decoder.cpp:142)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize(coeffs: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """``round(c / step) * step`` with away-from-zero rounding.

    ``step`` broadcasts against ``coeffs`` (per-block steps are expanded by
    the caller).
    """
    step = step.astype(coeffs.dtype)
    return round_half_away(coeffs / step) * step


def block_quant_steps(
    block_types: jnp.ndarray,
    gazed: jnp.ndarray,
    fg_step: int,
    bg_step: int,
) -> jnp.ndarray:
    """Per-transform-block step selection (libs/decoder.cpp:128-135).

    Args:
      block_types: ``(nby, nbx)`` uint32 wire block types.
      gazed: ``(nby, nbx)`` bool — block top-left inside the gaze rect.

    Returns float32 ``(nby, nbx)`` steps.
    """
    steps = jnp.where(
        block_types == BLOCK_TYPE_BACKGROUND,
        jnp.float32(bg_step),
        jnp.float32(fg_step),
    )
    return jnp.where(gazed, jnp.float32(1), steps)
