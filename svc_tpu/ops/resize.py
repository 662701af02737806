"""Resize ops matching the reference's two OpenCV uses.

* nearest-exact upscale — used to blow MV-grid masks up to frame size in the
  visualizer (reference: libs/encoder.cpp:516-517, INTER_NEAREST_EXACT),
* bilinear resize — used by the decoder to scale the padded reconstruction
  back to the original frame size for display
  (reference: libs/decoder.cpp:210, CV_INTER_LINEAR).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resize_nearest_exact(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Center-aligned nearest resize of ``(..., H, W)``.

    Matches OpenCV INTER_NEAREST_EXACT: source index =
    round-half-down of the center-aligned coordinate.
    """
    h, w = img.shape[-2], img.shape[-1]
    # src = floor((dst + 0.5) * in/out) — the PIL/skimage convention OpenCV's
    # INTER_NEAREST_EXACT documents itself as matching
    ys = np.minimum(
        np.floor((np.arange(out_h) + 0.5) * h / out_h), h - 1
    ).astype(np.int32)
    xs = np.minimum(
        np.floor((np.arange(out_w) + 0.5) * w / out_w), w - 1
    ).astype(np.int32)
    return img[..., ys, :][..., :, xs]


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Center-aligned bilinear resize of float ``(..., H, W)`` or
    ``(..., H, W, C)`` data, matching OpenCV INTER_LINEAR coordinate
    mapping ``src = (dst + 0.5) * scale - 0.5`` with edge clamping.
    """
    channels_last = img.ndim >= 3 and img.shape[-1] <= 4
    if channels_last:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]

    def axis_weights(out_n: int, in_n: int):
        src = (np.arange(out_n) + 0.5) * in_n / out_n - 0.5
        i0 = np.floor(src).astype(np.int32)
        frac = (src - i0).astype(np.float32)
        # clamp to valid range; OpenCV clamps coordinates at the borders
        frac = np.where(i0 < 0, 0.0, frac)
        frac = np.where(i0 >= in_n - 1, 0.0, frac).astype(np.float32)
        i0 = np.clip(i0, 0, in_n - 1)
        i1 = np.clip(i0 + 1, 0, in_n - 1)
        return i0, i1, jnp.asarray(frac)

    y0, y1, fy = axis_weights(out_h, h)
    x0, x1, fx = axis_weights(out_w, w)

    if channels_last:
        top = img[..., y0, :, :]
        bot = img[..., y1, :, :]
        fyb = fy[:, None, None]
        mid0 = top * (1 - fyb) + bot * fyb
        left = mid0[..., :, x0, :]
        right = mid0[..., :, x1, :]
        fxb = fx[None, :, None]
        return left * (1 - fxb) + right * fxb
    top = img[..., y0, :]
    bot = img[..., y1, :]
    fyb = fy[:, None]
    mid0 = top * (1 - fyb) + bot * fyb
    left = mid0[..., :, x0]
    right = mid0[..., :, x1]
    return left * (1 - fx) + right * fx
