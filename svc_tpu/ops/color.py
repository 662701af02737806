"""Color conversion: BGR -> luma (Y), matching OpenCV bit-for-bit.

The reference converts each padded BGR frame to YUV and extracts the Y
channel as the motion-estimation input (reference: libs/encoder.cpp:468-469,
``cv::cvtColor(..., COLOR_BGR2YUV)`` + ``cv::extractChannel(..., 0)``).

OpenCV's 8-bit path uses 14-bit fixed-point BT.601 luma coefficients with
round-half-up descaling:

    Y = (R*4899 + G*9617 + B*1868 + (1 << 13)) >> 14

This op reproduces that integer arithmetic exactly so motion fields (and
therefore everything downstream) can match the reference bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV fixed-point BT.601 luma weights, 14 fractional bits.
_R2Y = 4899
_G2Y = 9617
_B2Y = 1868
_SHIFT = 14


def bgr_planes_to_y(
    b: jnp.ndarray, g: jnp.ndarray, r: jnp.ndarray
) -> jnp.ndarray:
    """OpenCV-exact luma from separate uint8 channel planes.

    Same arithmetic as :func:`bgr_to_y`; the plane form keeps every operand
    dense on TPU (a trailing channel axis of 3 tile-pads to 128 lanes).
    """
    y = (
        r.astype(jnp.int32) * _R2Y
        + g.astype(jnp.int32) * _G2Y
        + b.astype(jnp.int32) * _B2Y
        + (1 << (_SHIFT - 1))
    ) >> _SHIFT
    return y.astype(jnp.uint8)


def bgr_to_y(frame_bgr: jnp.ndarray) -> jnp.ndarray:
    """Extract OpenCV-exact luma from uint8 BGR pixels.

    Args:
      frame_bgr: ``(..., 3)`` uint8 array, channel order B, G, R.

    Returns:
      ``(...)`` uint8 luma plane.
    """
    f = frame_bgr.astype(jnp.int32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = (r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)
