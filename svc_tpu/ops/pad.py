"""Frame padding to codec-aligned dimensions.

The reference pads each frame on the bottom/right with constant zeros so the
padded dims divide both the MV block size and the top pyramid level's
reduction factor (reference: libs/encoder.cpp:165-172 for the dims,
libs/encoder.cpp:459-461 ``cv::copyMakeBorder(..., BORDER_CONSTANT, 0)``
for the op).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from svc_tpu.utils.mathx import closest_larger_divisible, pow2


def padded_dims(
    frame_w: int,
    frame_h: int,
    mv_block_w: int,
    mv_block_h: int,
    pyr_lvl_count: int,
) -> Tuple[int, int]:
    """Padded (w, h) per the reference's LCM rule (libs/encoder.cpp:165-172)."""
    factor = pow2(pyr_lvl_count - 1)
    return (
        closest_larger_divisible(frame_w, mv_block_w, factor),
        closest_larger_divisible(frame_h, mv_block_h, factor),
    )


def pad_frame(frame: jnp.ndarray, padded_w: int, padded_h: int) -> jnp.ndarray:
    """Zero-pad ``(..., H, W, C)`` or ``(..., H, W)`` on bottom/right."""
    if frame.ndim >= 3 and frame.shape[-1] <= 4:
        h, w = frame.shape[-3], frame.shape[-2]
        pad = [(0, 0)] * (frame.ndim - 3) + [
            (0, padded_h - h),
            (0, padded_w - w),
            (0, 0),
        ]
    else:
        h, w = frame.shape[-2], frame.shape[-1]
        pad = [(0, 0)] * (frame.ndim - 2) + [
            (0, padded_h - h),
            (0, padded_w - w),
        ]
    return jnp.pad(frame, pad, mode="constant", constant_values=0)
