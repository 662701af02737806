"""Gaussian image pyramid, bit-exact with OpenCV's ``buildPyramid``.

The reference builds an L-level pyramid of the luma plane per frame
(reference: libs/encoder.cpp:470 ``cv::buildPyramid(y, pyr, lvl_count - 1)``)
and the HBMA search consumes every level (libs/motion.cpp:412-465).

``cv::pyrDown`` on 8-bit input is a separable 5-tap binomial filter
[1, 4, 6, 4, 1] in each dimension (sum 256), computed in integer arithmetic
with BORDER_REFLECT_101 and final round-half-up descaling by 8 bits, sampled
at even coordinates. This implementation reproduces that integer pipeline
exactly using stride-2 slicing (no data-dependent shapes, VPU-friendly),
so pyramid levels — and hence motion fields — can match the C++ reference
bit-for-bit.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

_TAPS = (1, 4, 6, 4, 1)


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level reduction of a ``(..., H, W)`` uint8 plane.

    Output dims are ``ceil(H/2), ceil(W/2)`` (here always exact halves:
    codec padding keeps dims divisible by ``2**(levels-1)``).
    """
    h, w = img.shape[-2], img.shape[-1]
    out_h, out_w = (h + 1) // 2, (w + 1) // 2

    x = img.astype(jnp.int32)
    # reflect-101 padding by 2 in each image dim
    pad = [(0, 0)] * (x.ndim - 2) + [(2, 2), (2, 2)]
    x = jnp.pad(x, pad, mode="reflect")

    # horizontal pass at stride 2
    cols = [
        _TAPS[k] * x[..., :, k : k + 2 * out_w : 2] for k in range(5)
    ]
    x = sum(cols)
    # vertical pass at stride 2
    rows = [
        _TAPS[k] * x[..., k : k + 2 * out_h : 2, :] for k in range(5)
    ]
    x = sum(rows)
    # OpenCV descale: (sum + 128) >> 8
    x = (x + 128) >> 8
    return x.astype(jnp.uint8)


def build_pyramid(img: jnp.ndarray, level_count: int) -> List[jnp.ndarray]:
    """Levels 0..level_count-1; level 0 is the input itself
    (matching ``cv::buildPyramid(src, dst, maxlevel=level_count-1)``)."""
    levels = [img]
    for _ in range(level_count - 1):
        levels.append(pyr_down(levels[-1]))
    return levels
