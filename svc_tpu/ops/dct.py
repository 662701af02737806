"""Blockwise 2-D DCT-II / DCT-III as MXU matrix products.

The encoder applies an orthonormal 2-D DCT to every ``transform_block`` of
every float RGB channel (reference: libs/encoder.cpp:323-339 driving
``cv::dct`` per 8x8 ROI); the decoder inverts per block with ``cv::idct``
(libs/decoder.cpp:128-149). ``cv::dct`` computes the standard orthonormal
type-II DCT, so each block transform is exactly

    Y = D_h @ X @ D_w^T        (forward)
    X = D_h^T @ Y @ D_w        (inverse)

with ``D_n[k, j] = s_k * cos(pi * (2j + 1) * k / (2n))``,
``s_0 = sqrt(1/n)``, ``s_k = sqrt(2/n)``.

Instead of looping ROIs, whole frames are transformed at once: the rows of
all blocks in a frame-width strip form one big matmul against the small DCT
matrix — batched, MXU-shaped work. float32 throughout (parity with
OpenCV's float path is to ~1e-3 absolute on 0..255 inputs; bit-exactness is
not defined across differing float summation orders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, float32."""
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * j + 1) * k / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d.astype(np.float32)


def _to_blocks(frame: jnp.ndarray, bw: int, bh: int) -> jnp.ndarray:
    """(..., H, W) -> (..., nby, nbx, bh, bw)"""
    *lead, h, w = frame.shape
    x = frame.reshape(*lead, h // bh, bh, w // bw, bw)
    return jnp.moveaxis(x, -3, -2)


def _from_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    *lead, nby, nbx, bh, bw = blocks.shape
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(*lead, nby * bh, nbx * bw)


def dct2_blockwise(frame: jnp.ndarray, block_w: int, block_h: int) -> jnp.ndarray:
    """Forward blockwise 2-D DCT of float32 ``(..., H, W)`` planes."""
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    blocks = _to_blocks(frame, block_w, block_h)
    out = jnp.einsum(
        "ki,...ij,lj->...kl", dh, blocks, dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _from_blocks(out)


def dct2_blockwise_nhwc(
    frames: jnp.ndarray, block_w: int, block_h: int
) -> jnp.ndarray:
    """Forward blockwise DCT of uint8 ``(T, H, W, C)`` frames directly into
    ``(T, C, H, W)`` float32 coefficient planes.

    Fuses the channel-plane split (``cv::split``, libs/encoder.cpp:328),
    the float conversion (libs/encoder.cpp:638) and both DCT matmuls into
    one contraction so XLA never materializes a transposed float copy of
    the frame batch.
    """
    t, h, w, c = frames.shape
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    blocks = frames.reshape(
        t, h // block_h, block_h, w // block_w, block_w, c
    ).astype(jnp.float32)
    out = jnp.einsum(
        "ki,tyixjc,lj->tcykxl",
        dh,
        blocks,
        dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(t, c, h, w)


def dct2_to_wire_blocks(
    frames: jnp.ndarray, block_w: int, block_h: int
) -> jnp.ndarray:
    """Forward blockwise DCT of uint8 ``(T, H, W, C)`` frames directly into
    the bitstream's block layout ``(T, nby, nbx, C, bh, bw)``.

    The wire format stores each transform block contiguously (type, then
    per-channel coefficient rows — libs/encoder.cpp:243-265), so producing
    this layout on device turns host serialization into a plain memcpy and
    avoids materializing transposed float frame copies.
    """
    t, h, w, c = frames.shape
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    blocks = frames.reshape(
        t, h // block_h, block_h, w // block_w, block_w, c
    ).astype(jnp.float32)
    return jnp.einsum(
        "ki,tyixjc,lj->tyxckl",
        dh,
        blocks,
        dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def idct2_from_wire_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``dct2_to_wire_blocks`` for one frame:
    ``(nby, nbx, C, bh, bw)`` coefficients -> ``(H, W, C)`` float pixels."""
    nby, nbx, c, bh, bw = blocks.shape
    dh = jnp.asarray(dct_matrix(bh))
    dw = jnp.asarray(dct_matrix(bw))
    out = jnp.einsum(
        "ik,yxcij,jl->ykxlc",
        dh,
        blocks,
        dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(nby * bh, nbx * bw, c)


def idct2_blockwise(frame: jnp.ndarray, block_w: int, block_h: int) -> jnp.ndarray:
    """Inverse blockwise 2-D DCT (DCT-III) of float32 ``(..., H, W)``."""
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    blocks = _to_blocks(frame, block_w, block_h)
    out = jnp.einsum(
        "ik,...ij,jl->...kl", dh, blocks, dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _from_blocks(out)
