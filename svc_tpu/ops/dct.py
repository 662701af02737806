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

    Layout strategy (the third iteration — each measured in-context on the
    22 ms 1080p encode step):

    * a 3-factor einsum over ``(..., bh, nbx, bw)`` blocks lowered to a
      reshape + two tile-layout copies + an output transpose (6.6 ms);
    * pre-transposing uint8 into wire block order for square wire-axis
      matmuls made XLA emit two even slower uint8 tile copies (7.9 ms);
    * this version: one cheap block-pitch lane transpose per plane
      (``(T*H, nbx, bw) -> (T*H, bw, nbx)`` — the same swapaxes XLA
      compiles to a fast tiled copy in ops/motion_pallas.py), giving
      ``(C, T, nby, bh, bw, nbx)`` with the block-column axis on lanes.
      Both DCT stages are then contractions over the small leading block
      axes — the MXU performs the lane->wire transpose implicitly in the
      final contraction, and its output IS the wire layout (~2 ms).

    The two chained 8-term contractions keep the float32 summation
    structure of the row/column DCT factorization that the golden-parity
    coefficient gate is baselined against (BASELINE.md: measured 1.2e-4
    vs ``cv::dct``; a fused single 64-term contraction doubles that).
    """
    c, t, h, w = planes.shape
    nby, nbx = h // block_h, w // block_w
    dh = jnp.asarray(dct_matrix(block_h))
    dw = jnp.asarray(dct_matrix(block_w))
    # block-pitch the columns: (C,T,H,W) -> (C,T,nby,bh,bw,nbx)
    p = planes.reshape(c, t, h, nbx, block_w)
    p = jnp.swapaxes(p, -1, -2)
    p = p.reshape(c, t, nby, block_h, block_w, nbx).astype(jnp.float32)
    # rows: contract i -> k (both leading small axes; no relayout)
    a = jnp.einsum(
        "ki,ctyijx->ctykjx", dh, p,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # columns: contract j -> l; the MXU dot emits (..., nbx, bh, bw) with
    # nbx back on sublanes — the wire layout — without a transpose op
    out = jnp.einsum(
        "lj,ctykjx->tyxckl", dw, a,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(t, nby, nbx, c * block_h * block_w)


def dct2_packed_to_wire(
    packed: jnp.ndarray, channels: int, block_w: int, block_h: int
) -> jnp.ndarray:
    """Forward blockwise DCT of packed interleaved ``(T, H, W*C)`` uint8
    frames into the wire layout ``(T, nby, nbx, C*bh*bw)``.

    Convenience wrapper: de-interleaves with ``channels`` strided lane
    slices (the one interleaved-byte access pattern XLA compiles cheaply)
    and runs :func:`dct2_planes_to_wire`. The encoder calls the planes
    variant directly — its preprocess stage already built the planes.
    """
    t, h, wc = packed.shape
    planes = jnp.stack([packed[:, :, c::channels] for c in range(channels)])
    return dct2_planes_to_wire(planes, block_w, block_h)


@functools.lru_cache(maxsize=None)
def _inv_stage_weights(channels: int, block_h: int, block_w: int):
    """The two ``(C*n, C*n)`` block-structured inverse-stage matrices.

    Operating in WIRE-LANE space: stage 1 applies ``dh`` over the row
    index (``(c,k,l) -> (c,i,l)``), stage 2 applies ``dw`` over the
    column index (``(c,i,l) -> (c,i,j)``). Keeping the whole inverse in
    the wire layout means the only relayout in the decode path is ONE
    well-tiled transpose of the pixel-space result — the small-axis
    einsum formulation made XLA emit two ~5 ms relayout copies per
    16-frame 1080p batch around the contraction (42% of decode time).
    Each output element still sums exactly ``block_h`` (resp.
    ``block_w``) terms, the same row/column factorization the golden
    decoder gate is baselined against.
    """
    dh = dct_matrix(block_h)
    dw = dct_matrix(block_w)
    n = block_h * block_w
    m1 = np.zeros((channels * n, channels * n), np.float32)
    m2 = np.zeros((channels * n, channels * n), np.float32)
    for c in range(channels):
        o = c * n
        for k in range(block_h):
            for i in range(block_h):
                for l in range(block_w):
                    m1[o + k * block_w + l, o + i * block_w + l] = dh[k, i]
        for i in range(block_h):
            for l in range(block_w):
                for j in range(block_w):
                    m2[o + i * block_w + l, o + i * block_w + j] = dw[l, j]
    return m1, m2


def idct2_wire_to_planes(
    blocks: jnp.ndarray, channels: int, block_h: int, block_w: int
) -> jnp.ndarray:
    """Inverse blockwise DCT of one frame's wire coefficients into
    ``(C, H, W)`` float32 channel planes.

    Wire-lane-space stage dots (see :func:`_inv_stage_weights`) followed
    by a single reshape+transpose into planes. The plane output keeps the
    TPU lane axis wide (W) — a channel-last variant tile-pads its
    trailing C=3 axis to 128 lanes, which made the decoder spend most of
    its time in relayout copies.
    """
    nby, nbx, cn = blocks.shape
    n = block_h * block_w
    m1, m2 = _inv_stage_weights(channels, block_h, block_w)
    flat = blocks.reshape(nby * nbx, cn)
    a = jax.lax.dot_general(
        flat, jnp.asarray(m1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = jax.lax.dot_general(
        a, jnp.asarray(m2), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = z.reshape(nby, nbx, channels, block_h, block_w)
    out = jnp.transpose(z, (2, 0, 3, 1, 4))  # (C, nby, bh, nbx, bw)
    return out.reshape(channels, nby * block_h, nbx * block_w)


def idct2_wire_to_planes_pitched(
    blocks: jnp.ndarray, channels: int, block_h: int, block_w: int
):
    """Inverse blockwise DCT into COLUMN-PITCHED planes.

    Returns ``(planes, col_map)`` where ``planes`` is ``(C, PH, bw,
    nbx)`` float32 with storage position ``(j, x)`` holding spatial
    column ``x*bw + j``, and ``col_map`` is the int32 ``(2, W)`` table of
    per-spatial-column ``(j, x)`` pairs (kept as two separate axes — the
    merged ``bw*nbx`` column is a full relayout copy under TPU tiling).
    The spatial layout's transpose lands on a trailing
    ``(nbx, bw)`` f32 intermediate whose ``bw``-wide lane axis tile-pads
    16x (measured ~10 ms of relayout per 16-frame 1080p decode batch);
    the pitched permutation ``(c, nby, bh, bw, nbx)`` tiles exactly
    (8 sublanes x nbx lanes), so the single transpose runs at memory
    bandwidth. Downstream consumers remap column indices through
    ``col_map`` (see ``resize_bilinear``'s ``col_map`` argument) — the
    gathered values, and therefore all results, are bit-identical to the
    spatial-layout path.
    """
    nby, nbx, cn = blocks.shape
    m1, m2 = _inv_stage_weights(channels, block_h, block_w)
    flat = blocks.reshape(nby * nbx, cn)
    a = jax.lax.dot_general(
        flat, jnp.asarray(m1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = jax.lax.dot_general(
        a, jnp.asarray(m2), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z = z.reshape(nby, nbx, channels, block_h, block_w)
    out = jnp.transpose(z, (2, 0, 3, 4, 1))  # (C, nby, bh, bw, nbx)
    # keep the (bw, nbx) pitch as separate axes: merging them is a full
    # relayout copy under TPU tiling, while the leading (nby, bh) merge
    # is free — consumers gather columns through the (j, x) pair
    planes = out.reshape(channels, nby * block_h, block_w, nbx)
    cols = np.arange(nbx * block_w, dtype=np.int32)
    col_map = np.stack([cols % block_w, cols // block_w])  # (2, W): j, x
    return planes, col_map


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
