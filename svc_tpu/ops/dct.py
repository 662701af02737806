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


def dct2_planes_to_wire(
    planes: jnp.ndarray, block_w: int, block_h: int
) -> jnp.ndarray:
    """Forward blockwise DCT of uint8 ``(C, T, H, W)`` channel planes into
    the bitstream's per-block payload layout ``(T, nby, nbx, C*bh*bw)``.

    The wire format stores each transform block contiguously (type, then
    per-channel coefficient rows — libs/encoder.cpp:243-265), so producing
    this layout on device turns host serialization into a plain memcpy.

    The trailing C*bh*bw axis is deliberately MERGED: a trailing ``(bh,bw)``
    = (8,8) pair would be tiled to (8,128) TPU lanes — a 16x physical
    blowup on the 400 MB/batch coefficient write at 1080p. Merged, the
    trailing axis is 192 (pad to 256, 1.33x). Channel-plane input likewise
    avoids the 43x tiling blowup of trailing C=3 interleaved frames.
    """
    c, t, h, w = planes.shape
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    blocks = planes.reshape(
        c, t, h // block_h, block_h, w // block_w, block_w
    ).astype(jnp.float32)
    out = jnp.einsum(
        "ki,ctyixj,lj->tyxckl",
        dh,
        blocks,
        dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(t, h // block_h, w // block_w, c * block_h * block_w)


def dct2_packed_to_wire(
    packed: jnp.ndarray, channels: int, block_w: int, block_h: int
) -> jnp.ndarray:
    """Forward blockwise DCT of packed interleaved ``(T, H, W*C)`` uint8
    frames into the wire layout ``(T, nby, nbx, C*bh*bw)``.

    Equivalent to de-interleaving channel planes and calling
    :func:`dct2_planes_to_wire`, but the channel separation is folded into
    the column-transform contraction weights
    (``W[l, c, q] = dct[l, q // C] * (q % C == c)``), so the interleaved
    frame bytes feed the MXU directly — the measured ~5 ms/batch of layout
    copies XLA emitted to build separated channel-plane blocks disappears.
    """
    t, h, wc = packed.shape
    w = wc // channels
    dh = jnp.asarray(dct_matrix(block_h))
    dw_np = dct_matrix(block_w)
    q = block_w * channels
    sel = np.zeros((block_w, channels, q), np.float32)
    for j in range(block_w):
        for c in range(channels):
            sel[j, c, j * channels + c] = 1.0
    wmat = jnp.asarray(np.einsum("lj,jcq->lcq", dw_np, sel))
    blocks = packed.reshape(
        t, h // block_h, block_h, w // block_w, q
    ).astype(jnp.float32)
    out = jnp.einsum(
        "ki,tyixq,lcq->tyxckl",
        dh,
        blocks,
        wmat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(t, h // block_h, w // block_w, channels * block_h * block_w)


def idct2_wire_to_planes(
    blocks: jnp.ndarray, channels: int, block_h: int, block_w: int
) -> jnp.ndarray:
    """Inverse blockwise DCT of one frame's wire coefficients into
    ``(C, H, W)`` float32 channel planes.

    The plane output keeps the TPU lane axis wide (W) — the channel-last
    variant below tile-pads its trailing C=3 axis to 128 lanes, which made
    the decoder spend most of its time in relayout copies.
    """
    nby, nbx, _ = blocks.shape
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    split = blocks.reshape(nby, nbx, channels, block_h, block_w)
    out = jnp.einsum(
        "ik,yxcij,jl->cykxl",
        dh,
        split,
        dw,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(channels, nby * block_h, nbx * block_w)


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
