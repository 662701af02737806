"""Exact selection-matmul (de)interleave between packed pixel rows and
channel planes.

The natural formulations are hostile on TPU: a trailing channel axis of
C=3 tile-pads to 128 lanes (43x physical memory), stride-C lane slices
lower to scalar gathers plus relayout copies (~2 ms per 16-frame 1080p
batch in the encoder frontend), and the repeat-plus-select interleave
costs ~1.5 ms in the decoder. When the frame width is a lane multiple,
both directions are instead ONE einsum against a 0/1 selector over
``C*128``-byte lane groups: uint8 is exact in bfloat16 and every output
element is a single selected product, so the results are bit-exact.

Used by the encoder frontend (``models/encoder.py:preprocess``) and the
decoder's packed-output stage (``models/decoder.py``); the two selectors
are mutual inverses by construction (asserted in tests/test_image_ops.py).
Reference analog: the interleaved BGR frames of ``cv::VideoCapture`` /
``cv::imshow`` (libs/encoder.cpp:360-365, libs/decoder.cpp:208-215).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def lane_aligned(width: int) -> bool:
    """True when ``width`` supports the selection-matmul fast path."""
    return width % 128 == 0


@functools.lru_cache(maxsize=None)
def _deint_selector(channels: int) -> np.ndarray:
    """(C, C*128, 128) 0/1: packed lane group -> per-channel pixel lanes."""
    sel = np.zeros((channels, channels * 128, 128), np.float32)
    lanes = np.arange(128)
    for c in range(channels):
        sel[c, channels * lanes + c, lanes] = 1.0
    return sel


@functools.lru_cache(maxsize=None)
def _int_selector(channels: int) -> np.ndarray:
    """(C, 128, C*128) 0/1: per-channel pixel lanes -> packed lane group."""
    sel = np.zeros((channels, 128, channels * 128), np.float32)
    lanes = np.arange(128)
    for c in range(channels):
        sel[c, lanes, channels * lanes + c] = 1.0
    return sel


def deinterleave_rows(packed: jnp.ndarray, channels: int) -> jnp.ndarray:
    """``(..., H, W*C)`` packed uint8 rows -> ``(C, ..., H, W)`` planes.

    Requires ``lane_aligned(W)``.
    """
    w = packed.shape[-1] // channels
    g = w // 128
    x = packed.reshape(packed.shape[:-1] + (g, channels * 128))
    out = jnp.einsum(
        "...gi,cio->c...go",
        x.astype(jnp.bfloat16),
        jnp.asarray(_deint_selector(channels), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)
    return out.reshape((channels,) + packed.shape[:-1] + (w,))


def interleave_rows(planes: jnp.ndarray) -> jnp.ndarray:
    """``(..., C, H, W)`` uint8 planes -> ``(..., H, W*C)`` packed rows.

    Requires ``lane_aligned(W)``.
    """
    *lead, channels, h, w = planes.shape
    g = w // 128
    x = planes.reshape(tuple(lead) + (channels, h, g, 128))
    out = jnp.einsum(
        "...chgi,cio->...hgo",
        x.astype(jnp.bfloat16),
        jnp.asarray(_int_selector(channels), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)
    return out.reshape(tuple(lead) + (h, w * channels))


@functools.lru_cache(maxsize=None)
def _jsplit_selector(channels: int, bw: int, gpx: int = 128) -> np.ndarray:
    """(C*bw, C*gpx, gpx//bw) 0/1: packed ``gpx``-pixel group -> per-
    (channel, column-phase) block lanes. Pixel ``x = b*bw + j`` of a group
    (``b`` the block-in-group, ``j`` the column phase) reads packed byte
    ``(x_local)*C + c`` and lands on lane ``b`` of subplane ``(c, j)`` —
    the column-PITCHED plane layout the blockwise-DCT kernel consumes
    (ops/dct_pallas.py), emitted straight off the de-interleave
    contraction with no transpose op anywhere. Keep ``gpx`` at 128: the
    selector's useful density is 1/gpx per element, so wider groups
    inflate the matmul FLOPs quadratically — gpx=960 measured 5.3 ms vs
    0.9 for this einsum at 1080p despite its near-dense output minor."""
    bpg = gpx // bw
    sel = np.zeros((channels * bw, channels * gpx, bpg), np.float32)
    for c in range(channels):
        for j in range(bw):
            for b in range(bpg):
                sel[c * bw + j, (b * bw + j) * channels + c, b] = 1.0
    return sel


def jsplit_supported(width: int, bw: int) -> bool:
    """True when the pitched de-interleave applies: lane-aligned width and
    whole blocks per pixel group."""
    return width % 128 == 0 and 128 % bw == 0


def deinterleave_rows_jsplit(
    packed: jnp.ndarray, channels: int, bw: int
) -> jnp.ndarray:
    """``(..., H, W*C)`` packed uint8 rows -> ``(C, bw, ..., H, W//bw)``
    column-pitched channel subplanes: subplane ``(c, j)`` lane ``bx`` holds
    spatial pixel ``x = bx*bw + j`` of channel ``c``.

    One exact bf16 selection einsum per 128-pixel group performs the
    BGR de-interleave AND the DCT column pitch together (the contraction
    axis ``i`` is the operand's minor axis, so XLA lowers it as a clean
    dot with no relayout — unlike a post-hoc pitch transpose of the
    spatial planes, measured ~1 ms/batch at 1080p).
    Requires ``jsplit_supported(W, bw)``.
    """
    w = packed.shape[-1] // channels
    # 128-pixel groups: the selector matmul's useful density is 1/gpx per
    # element, so wider groups inflate FLOPs quadratically (a 960-pixel
    # variant measured 5.3 ms vs 0.9 for this einsum at 1080p even though
    # its output minor axis was nearly dense)
    gpx = 128
    g = w // gpx
    bpg = gpx // bw
    x = packed.reshape(packed.shape[:-1] + (g, channels * gpx))
    out = jnp.einsum(
        "...gi,kio->k...go",
        x.astype(jnp.bfloat16),
        jnp.asarray(_jsplit_selector(channels, bw, gpx), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)  # (C*bw, ..., g, bpg)
    return out.reshape(
        (channels, bw) + packed.shape[:-1] + (g * bpg,)
    )


@functools.lru_cache(maxsize=None)
def _int_pitched_selector(channels: int, bw: int) -> np.ndarray:
    """(C, bw, 128//bw, C*128) 0/1: column-pitched per-channel lanes ->
    packed lane group. Spatial column ``i*bw + j`` of a 128-column group
    sits at pitched position ``(j, block i)``; its packed bytes land at
    ``(i*bw + j)*C + c`` — the un-pitch permutation rides the selection
    contraction for free (same K = C*128 as the spatial selector)."""
    bpg = 128 // bw  # blocks per 128-column group
    sel = np.zeros((channels, bw, bpg, channels * 128), np.float32)
    for c in range(channels):
        for i in range(bpg):
            for j in range(bw):
                sel[c, j, i, (i * bw + j) * channels + c] = 1.0
    return sel


def pitched_interleave_supported(bw: int, nbx: int) -> bool:
    """True when the pitched selector applies: whole 128-column groups."""
    return 128 % bw == 0 and nbx % (128 // bw) == 0


def interleave_rows_pitched(planes: jnp.ndarray, bw: int) -> jnp.ndarray:
    """``(..., C, H, bw, nbx)`` column-pitched uint8 planes (storage
    ``(j, x)`` = spatial column ``x*bw + j``, see
    dct.idct2_wire_to_planes_pitched) -> ``(..., H, W*C)`` packed rows.

    One exact bf16 selection einsum performs the channel interleave AND
    the un-pitch permutation together. Requires
    ``pitched_interleave_supported(bw, nbx)``.

    NOT in the production decode path: the contraction axes ``(c, j, i)``
    are non-contiguous in the operand (``h`` and the group axis sit
    between them), so XLA lowers this einsum with a full lhs relayout —
    measured 5.25 ms per 16-frame 1080p batch versus ~1.3 ms for the
    un-pitch gather + spatial interleave it was meant to replace. Kept
    (tested, exact) as the record of that measurement.
    """
    *lead, channels, h, bw_, nbx = planes.shape
    assert bw_ == bw
    bpg = 128 // bw
    g = nbx // bpg
    x = planes.reshape(tuple(lead) + (channels, h, bw, g, bpg))
    out = jnp.einsum(
        "...chjgi,cjio->...hgo",
        x.astype(jnp.bfloat16),
        jnp.asarray(_int_pitched_selector(channels, bw), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)
    return out.reshape(tuple(lead) + (h, bw * nbx * channels))
