"""Pallas TPU kernel: blockwise 2-D DCT straight into wire layout.

The encoder's DCT stage (reference: libs/encoder.cpp:323-339 driving
``cv::dct`` per 8x8 ROI) produces ~400 MB of float32 coefficients per
16-frame 1080p batch, so the stage is bandwidth-bound and lives or dies by
layout. The XLA einsum formulations (ops/dct.py) are algorithmically
identical but at the mercy of layout assignment: in the full encoder
program XLA materializes tile-layout copies around the contractions
(measured 6.6-9 ms/batch of a 22 ms step across three einsum variants).
This kernel pins the layouts: it consumes block-pitched uint8 planes and
writes wire-layout float32, with the lane->sublane "transpose" performed
implicitly by the MXU in the first contraction.

Per (frame, block-row) grid step and channel, the input tile is
``x[(i*bw + j), bx]`` — all ``bh*bw`` pixels of a block on sublanes, the
``nbx`` block columns on lanes. Two matmuls then compute the 2-D DCT in
wire order:

    A = x^T @ W1        A[bx, k*bw + j] = sum_i dh[k,i] x[(i,j), bx]
    Z = A   @ W2        Z[bx, k*bw + l] = sum_j dw[l,j] A[bx, (k,j)]

where ``W1[(i*bw+j), (k*bw+j')] = dh[k,i] * (j==j')`` and
``W2[(k*bw+j), (k'*bw+l)] = dw[l,j] * (k==k')`` are tiny constant
block-diagonal matrices. The first dot contracts over the SUBLANE axis of
``x`` (lhs-transposed dot), so the MXU emits ``bx`` on sublanes — the wire
layout — with no transpose op anywhere. Channels concatenate on lanes into
the merged per-block payload axis (c*bh*bw), which the host serializer
memcpys (svc_tpu.io.bitstream).

The two chained 8-term contractions keep the float32 summation structure
of the row/column DCT factorization that the golden-parity coefficient
gate is baselined against (BASELINE.md; a fused 64-term contraction
doubles the measured error vs ``cv::dct``).

Toolchain notes (probed): uint8 cannot cast directly to float32 in this
Mosaic build — it hops through int32; lhs-transposed ``dot_general`` and
lane-axis concatenation are supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svc_tpu.ops.dct import dct_matrix


@functools.lru_cache(maxsize=None)
def _wire_stage_weights(block_w: int, block_h: int):
    """The two (bh*bw, bh*bw) block-diagonal stage matrices (see module
    docstring). Built once on host; exact zero fill keeps the nonzero
    8-term dot structure of the separable row/column factorization."""
    dh = dct_matrix(block_h)
    dw = dct_matrix(block_w)
    n = block_h * block_w
    w1 = np.zeros((n, n), np.float32)
    w2 = np.zeros((n, n), np.float32)
    for k in range(block_h):
        for i in range(block_h):
            for j in range(block_w):
                w1[i * block_w + j, k * block_w + j] = dh[k, i]
    for k in range(block_h):
        for j in range(block_w):
            for l in range(block_w):
                w2[k * block_w + j, k * block_w + l] = dw[l, j]
    return w1, w2


@functools.lru_cache(maxsize=None)
def _stage1_bf16_terms(block_w: int, block_h: int):
    """Stage-1 weights split as w1 = t0 + t1 + t2 in bfloat16 terms.

    The stage-1 lhs is uint8 data, which is EXACT in bfloat16 (<= 8
    mantissa bits), so the float32 dot can run as three 1-pass bf16
    matmuls against an exact 3-term split of the weights: every product
    is exact in the MXU's float32 accumulator and the only rounding is
    the f32 accumulation — the same error class as a float32 dot, at
    half the MXU passes of ``Precision.HIGHEST`` (measured: stage 1 drops
    from ~1.4 ms to ~0.7 ms/batch at 1080p with max |err| unchanged at
    8.7e-5 vs float64). Stage 2's lhs is float32 (not bf16-exact), so it
    stays a HIGHEST-precision dot.
    """
    w1, _ = _wire_stage_weights(block_w, block_h)
    w = w1.astype(np.float64)
    terms = []
    for _ in range(3):
        t = w.astype(np.float32).astype(jnp.bfloat16)
        terms.append(np.asarray(t))
        w = w - np.asarray(t, np.float64)
    return tuple(terms)


@functools.lru_cache(maxsize=None)
def _jsplit_row_perm(block_w: int, block_h: int) -> np.ndarray:
    """Input-sublane permutation for column-pitched (j-split) planes.

    The j-split frontend (interleave.deinterleave_rows_jsplit) delivers a
    block's pixels as ``bw`` subplanes stacked ``(j*bh + i)`` instead of
    the spatial ``(i*bw + j)``; permuting the stage-1 weight ROWS the same
    way keeps every output coefficient's 8 nonzero products in the same
    K order, so results are BIT-IDENTICAL to the spatial-input kernel
    (zeros interleave differently, but adding exact zeros in any order
    changes nothing)."""
    n = block_h * block_w
    perm = np.empty(n, np.int64)
    for i in range(block_h):
        for j in range(block_w):
            perm[j * block_h + i] = i * block_w + j
    return perm


@functools.lru_cache(maxsize=None)
def _pair_stage_weights(block_w: int, block_h: int):
    """Row-paired stage weights diag(W, W): two block rows stacked on the
    contraction axis make K = N = 2n = 128 — a full MXU tile instead of
    the 1/4-utilized 64x64 dots (measured 1.4x on the 1080p batch).
    The interleaved blocks are exact zeros, so every coefficient's 8-term
    summation is untouched: results are BIT-IDENTICAL to the unpaired
    kernel (asserted in tests/test_dct.py)."""
    _, w2 = _wire_stage_weights(block_w, block_h)
    t1 = _stage1_bf16_terms(block_w, block_h)
    z32 = np.zeros_like(w2)
    w2p = np.block([[w2, z32], [z32, w2]])
    zb = np.zeros_like(t1[0])
    t1p = tuple(np.block([[t, zb], [zb, t]]) for t in t1)
    return t1p, w2p


def _make_pair_kernel(
    channels: int,
    pairs_per_step: int,
    n: int,
    nbx: int,
    bw_split: int = 0,
    rows_per_block: int = 0,
    valid_nby: int = 0,
):
    # valid_nby > 0: the input planes are UNPADDED (the frame's zero pad
    # rows were never materialized); block rows >= valid_nby read garbage
    # from the masked tail block and their coefficients are synthesized
    # as the exact DCT-of-zeros (= zeros) instead. The row pairing is
    # block-diagonal, so a garbage half-pair cannot leak into its real
    # sibling's products.
    def kernel(*refs):
        m1_refs = refs[0:3]
        m2_ref = refs[3]
        n_planes = channels * bw_split if bw_split else channels
        plane_refs = refs[4 : 4 + n_planes]
        o_ref = refs[4 + n_planes]
        m1_terms = [r[...] for r in m1_refs]
        m2 = m2_ref[...]
        bh = rows_per_block

        for u in range(pairs_per_step):
            if bw_split:
                # j-split planes: per channel, concat the bw column-phase
                # subplanes on sublanes — rows ordered (j*bh + i), matched
                # by the permuted stage-1 weights (_jsplit_row_perm).
                # Block rows are static row slices of the raw (r*bh, nbx)
                # subplane slab
                x = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                jnp.concatenate(
                                    [
                                        plane_refs[c * bw_split + j][
                                            0, 0, 0,
                                            (2 * u + v) * bh
                                            : (2 * u + v + 1) * bh,
                                        ]
                                        for j in range(bw_split)
                                    ],
                                    axis=0,
                                )
                                for c in range(channels)
                            ],
                            axis=1,
                        )
                        for v in (0, 1)
                    ],
                    axis=0,
                )  # (2n, C*nbx)
            else:
                x = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                ref[0, 0, 2 * u + v].reshape(n, nbx)
                                for ref in plane_refs
                            ],
                            axis=1,
                        )
                        for v in (0, 1)
                    ],
                    axis=0,
                )  # (2n, C*nbx)
            xb = x.astype(jnp.int32).astype(jnp.bfloat16)
            a = None
            for m in m1_terms:
                p = jax.lax.dot_general(
                    xb, m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                a = p if a is None else a + p  # (C*nbx, 2n)
            z = jax.lax.dot_general(
                a, m2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (C*nbx, 2n)
            zc = z.reshape(channels, nbx, 2 * n)
            for v in (0, 1):
                row = jnp.concatenate(
                    [
                        zc[c, :, v * n : (v + 1) * n]
                        for c in range(channels)
                    ],
                    axis=1,
                )
                if valid_nby:
                    rows_per_step = 2 * pairs_per_step
                    block_row = (
                        pl.program_id(1) * rows_per_step + 2 * u + v
                    )
                    row = jnp.where(block_row < valid_nby, row, 0.0)
                o_ref[0, 2 * u + v] = row

    return kernel


def _make_kernel(channels: int, rows_per_step: int, n: int, nbx: int):
    def kernel(*refs):
        m1_refs = refs[0:3]
        m2_ref = refs[3]
        plane_refs = refs[4 : 4 + channels]
        o_ref = refs[4 + channels]
        m1_terms = [r[...] for r in m1_refs]
        m2 = m2_ref[...]
        for t in range(rows_per_step):
            # merge channels on lanes: one (n, C*nbx) lhs per block row
            # keeps the MXU fed (M = C*nbx) instead of C small dots
            x = jnp.concatenate(
                [ref[0, 0, t].reshape(n, nbx) for ref in plane_refs],
                axis=1,
            )
            # stage 1: uint8 is exact in bf16 -> three 1-pass bf16 dots
            # against the exact 3-term weight split (_stage1_bf16_terms)
            xb = x.astype(jnp.int32).astype(jnp.bfloat16)
            a = None
            for m in m1_terms:
                p = jax.lax.dot_general(
                    xb, m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                a = p if a is None else a + p  # (C*nbx, n)
            z = jax.lax.dot_general(
                a, m2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (C*nbx, n)
            zc = z.reshape(channels, nbx, n)
            o_ref[0, t] = jnp.concatenate(
                [zc[c] for c in range(channels)], axis=1
            )

    return kernel


def _rows_per_step(nby: int, target: int = 8) -> int:
    """Largest divisor of ``nby`` up to ``target`` (grid rows per step)."""
    for d in range(min(nby, target), 0, -1):
        if nby % d == 0:
            return d
    return 1


def dct2_planes_to_wire_pallas(
    planes: jnp.ndarray,
    block_w: int,
    block_h: int,
    frame_offset: int = 0,
) -> jnp.ndarray:
    """Forward blockwise DCT of uint8 ``(C, T, H, W)`` channel planes into
    wire layout ``(T - frame_offset, nby, nbx, C*bh*bw)`` float32 (TPU
    production path; same contract as ops.dct.dct2_planes_to_wire).

    ``frame_offset`` skips leading frames via the kernel's index maps
    instead of a host-visible slice: the encoder passes the FULL padded
    plane stack (whose frame 0 is the tracked-only overlap frame,
    libs/encoder.cpp:360-365) and XLA never materializes the sliced
    anchor copy (measured 0.46 ms/batch at 1080p)."""
    c, t, h, w = planes.shape
    t -= frame_offset
    nby, nbx = h // block_h, w // block_w
    n = block_h * block_w
    r = _rows_per_step(nby)

    # block-pitch the columns: one fast lane transpose per plane
    # (T*H, nbx, bw) -> (T*H, bw, nbx), then free leading reshapes
    tf = planes.shape[1]  # full stack, including skipped leading frames
    p = planes.reshape(c, tf, h, nbx, block_w)
    p = jnp.swapaxes(p, -1, -2)
    p5 = p.reshape(c, tf, nby, block_h, block_w, nbx)

    paired = r % 2 == 0
    if paired:
        m1_terms, w2 = _pair_stage_weights(block_w, block_h)
        kernel = _make_pair_kernel(c, r // 2, n, nbx)
        msz = 2 * n
    else:
        _, w2 = _wire_stage_weights(block_w, block_h)
        m1_terms = _stage1_bf16_terms(block_w, block_h)
        kernel = _make_kernel(c, r, n, nbx)
        msz = n
    mspec = pl.BlockSpec(
        (msz, msz), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    pspecs = [
        pl.BlockSpec(
            (1, 1, r, block_h, block_w, nbx),
            functools.partial(
                lambda ci, ti, yi: (ci, ti + frame_offset, yi, 0, 0, 0),
                ci,
            ),
            memory_space=pltpu.VMEM,
        )
        for ci in range(c)
    ]
    return pl.pallas_call(
        kernel,
        grid=(t, nby // r),
        in_specs=[mspec] * 4 + pspecs,
        out_specs=pl.BlockSpec(
            (1, r, nbx, c * n), lambda ti, yi: (ti, yi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, nby, nbx, c * n), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )(*[jnp.asarray(m) for m in m1_terms], jnp.asarray(w2), *([p5] * c))


def dct2_jsplit_to_wire_pallas(
    planes: jnp.ndarray,
    block_w: int,
    block_h: int,
    frame_offset: int = 0,
    padded_h: int = 0,
) -> jnp.ndarray:
    """Forward blockwise DCT of column-pitched (j-split) uint8 planes
    ``(C, bw, T, H, nbx)`` (interleave.deinterleave_rows_jsplit) into wire
    layout ``(T - frame_offset, nby, nbx, C*bh*bw)`` float32.

    Same two-stage MXU pipeline as :func:`dct2_planes_to_wire_pallas`,
    consuming the de-interleave's pitched output DIRECTLY: the spatial
    path's full-stack pitch transpose (~1 ms/batch at 1080p) never runs.
    The stage-1 weights are row-permuted to the (j*bh + i) sublane order
    the subplane concat produces; the 8 nonzero products per coefficient
    keep their K order, so coefficients are BIT-IDENTICAL to the spatial
    kernel (asserted in tests/test_dct.py).

    ``padded_h > h`` declares UNPADDED input planes for a frame whose
    zero pad band covers whole transform-block rows: the coefficient
    grid spans ``padded_h`` but the pad block rows' coefficients are
    synthesized as exact zeros in-kernel — the 100 MB/batch padded plane
    copy never materializes (callers gate via
    :func:`pallas_wire_dct_jsplit_supported` on the PADDED height and
    ``h % block_h == 0``)."""
    c, bw_, tf, h, nbx = planes.shape
    assert bw_ == block_w
    t = tf - frame_offset
    valid_nby = 0
    if padded_h and padded_h > h:
        assert h % block_h == 0 and padded_h % block_h == 0
        valid_nby = h // block_h
        nby = padded_h // block_h
    else:
        nby = h // block_h
    n = block_h * block_w
    r = _rows_per_step(nby)
    assert r % 2 == 0, "j-split kernel requires an even rows-per-step"

    t1p, w2 = _pair_stage_weights(block_w, block_h)
    perm = _jsplit_row_perm(block_w, block_h)
    perm2 = np.concatenate([perm, perm + n])
    m1_terms = tuple(m[perm2] for m in t1p)
    kernel = _make_pair_kernel(
        c, r // 2, n, nbx, bw_split=block_w, rows_per_block=block_h,
        valid_nby=valid_nby,
    )
    msz = 2 * n
    mspec = pl.BlockSpec(
        (msz, msz), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    # blocks are (r*bh)-row slabs of the RAW subplanes — no 6-D reshape:
    # at 4K, XLA materialized that reshape (fused with the row pad) as a
    # 10.6 ms/batch copy of the lane-padded de-interleave output
    pspecs = [
        pl.BlockSpec(
            (1, 1, 1, r * block_h, nbx),
            functools.partial(
                lambda ci, ji, ti, yi: (
                    ci, ji, ti + frame_offset, yi, 0
                ),
                ci, ji,
            ),
            memory_space=pltpu.VMEM,
        )
        for ci in range(c)
        for ji in range(block_w)
    ]
    return pl.pallas_call(
        kernel,
        grid=(t, nby // r),
        in_specs=[mspec] * 4 + pspecs,
        out_specs=pl.BlockSpec(
            (1, r, nbx, c * n), lambda ti, yi: (ti, yi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, nby, nbx, c * n), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )(
        *[jnp.asarray(m) for m in m1_terms],
        jnp.asarray(w2),
        *([planes] * (c * block_w)),
    )


def pallas_wire_dct_jsplit_supported(
    channels: int, h: int, w: int, block_w: int, block_h: int
) -> bool:
    """Gate for the j-split forward kernel: the spatial gate plus an even
    rows-per-step (the j-split variant only implements the paired path)."""
    if not pallas_wire_dct_supported(channels, h, w, block_w, block_h):
        return False
    return _rows_per_step(h // block_h) % 2 == 0


# ---------------------------------------------------------------------------
# Inverse: fused dequant + wire IDCT straight into column-pitched planes
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _inv_pair_stage_weights(block_w: int, block_h: int):
    """Row-paired inverse stage matrices diag(U, U) (2n, 2n).

    Per block, in flat wire coordinates ``(k*bw + l)``:

        U1[(k*bw + l), (i*bw + l)] = dh[k, i]   (rows stage, contract k)
        U2[(i*bw + l), (i*bw + j)] = dw[l, j]   (cols stage, contract l)

    — exactly the per-channel blocks of ``ops.dct._inv_stage_weights``'s
    m1/m2, so each output element sums the same ``bh`` (resp. ``bw``)
    nonzero terms in the same order as the XLA decode path (the
    interleaved exact zeros of the pairing cannot change any partial
    sum). Two block rows stack on the contraction axis for K = N = 2n =
    128 full-MXU tiles, like the forward pair kernel.
    """
    dh = dct_matrix(block_h)
    dw = dct_matrix(block_w)
    n = block_h * block_w
    u1 = np.zeros((n, n), np.float32)
    u2 = np.zeros((n, n), np.float32)
    for k in range(block_h):
        for i in range(block_h):
            for l in range(block_w):
                u1[k * block_w + l, i * block_w + l] = dh[k, i]
    for i in range(block_h):
        for l in range(block_w):
            for j in range(block_w):
                u2[i * block_w + l, i * block_w + j] = dw[l, j]
    z = np.zeros_like(u1)
    u1p = np.block([[u1, z], [z, u1]])
    u2p = np.block([[u2, z], [z, u2]])
    return u1p, u2p


def _jmajor_perm(channels: int, bh: int, bw: int) -> np.ndarray:
    """(bh*bw*C, C*bh*bw) 0/1 j-major sublane interleave: out row
    ``r*bw*C + j*C + c`` reads in row ``c*bh*bw + r*bw + j``. Applied as
    one bf16 MXU dot AFTER the display round/clip (which commutes with a
    permutation): all values are exact 0..255 integers, each output row
    has exactly one nonzero product — bit-exact."""
    n = bh * bw
    perm = np.zeros((n * channels, channels * n), np.float32)
    for c_i in range(channels):
        for r_i in range(bh):
            for j_i in range(bw):
                perm[
                    r_i * bw * channels + j_i * channels + c_i,
                    c_i * n + r_i * bw + j_i,
                ] = 1.0
    return perm


def pack_words_supported(channels: int, bw: int) -> bool:
    """True when the display row's merged sublane minor (bw*C) splits
    into whole int32 words."""
    return (bw * channels) % 4 == 0


def _jmajor_pack_perms(channels: int, bh: int, bw: int):
    """(P_lo, P_hi): the j-major interleave of :func:`_jmajor_perm`
    COMPOSED with the 4-bytes-per-int32 pack, split into two exact bf16
    matrices. Out row ``r*s4 + sq`` (s4 = bw*C//4 packed words per
    column group) accumulates display bytes ``s = 4*sq + b``: P_lo
    carries bytes b in {0, 1} with weights {1, 256}, P_hi bytes {2, 3}
    with the same weights. Each matrix's dot yields exact integers
    <= 65535 (two u8 bytes) in f32; the kernel then combines
    ``lo + hi * 65536`` in int32 (wrapping add/mul — the components
    occupy disjoint bit ranges, so the bit pattern equals the packed
    little-endian bytes, including byte-3 values >= 128 that wrap the
    int32 negative)."""
    n = bh * bw
    s4 = (bw * channels) // 4
    lo = np.zeros((bh * s4, channels * n), np.float32)
    hi = np.zeros((bh * s4, channels * n), np.float32)
    for c_i in range(channels):
        for r_i in range(bh):
            for j_i in range(bw):
                s = j_i * channels + c_i
                sq, b = divmod(s, 4)
                m = (lo, lo, hi, hi)[b]
                m[
                    r_i * s4 + sq, c_i * n + r_i * bw + j_i
                ] = float(256 ** (b % 2))
    return lo, hi


def _make_wire_idct_kernel(
    channels: int,
    pairs_per_step: int,
    n: int,
    nbx: int,
    bh: int,
    bw: int,
    emit_u8: bool = False,
    channel_minor: bool = False,
    merged_minor: bool = False,
):
    pack = merged_minor and pack_words_supported(channels, bw)
    s4 = (bw * channels) // 4 if pack else None

    def kernel(u1_ref, u2_ref, ident_ref, *rest):
        if pack:
            plo_ref, phi_ref, c_ref, s_ref, o_ref = rest
        elif merged_minor:
            perm_ref, c_ref, s_ref, o_ref = rest
        else:
            c_ref, s_ref, o_ref = rest
        u1 = u1_ref[...]
        u2 = u2_ref[...]
        ident = ident_ref[...]
        for u in range(pairs_per_step):
            # dequantize both rows: round(c/step)*step with C
            # away-from-zero rounding (libs/decoder.cpp:137-146). Steps
            # arrive dense on LANES (a (nbx, 1)-shaped input would
            # tile-pad its lane axis 1 -> 128, 668 MB/batch at 1080p —
            # measured); the identity dot transposes the row onto
            # sublanes exactly (HIGHEST keeps integer steps f32-exact)
            rows = []
            for v in (0, 1):
                c = c_ref[0, 2 * u + v]  # (nbx, C*n) f32
                s = jax.lax.dot_general(
                    ident, s_ref[0, 0, 2 * u + v : 2 * u + v + 1, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (nbx, 1)
                y = c / s
                # round-half-away dequant with BITWISE sign handling
                # (same path as the fused resample kernel: mask ops
                # replace abs/sign-multiply — one VPU pass fewer over
                # the wire tensor; exact, see that kernel's comment)
                ybits = pltpu.bitcast(y, jnp.uint32)
                mag = pltpu.bitcast(
                    ybits & jnp.uint32(0x7FFFFFFF), jnp.float32
                )
                tval = jnp.floor(mag + 0.5) * s
                rows.append(
                    pltpu.bitcast(
                        pltpu.bitcast(tval, jnp.uint32)
                        | (ybits & jnp.uint32(0x80000000)),
                        jnp.float32,
                    )
                )
            vcollect = ([], []) if merged_minor else None
            for ch in range(channels):
                # two block rows of one channel on the contraction axis
                g = jnp.concatenate(
                    [r[:, ch * n : (ch + 1) * n] for r in rows], axis=1
                )  # (nbx, 2n)
                a = jax.lax.dot_general(
                    g, u1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (nbx, 2n)
                # lhs-side contraction emits pixels on SUBLANES — the
                # column-pitched plane layout — with no transpose op
                xt = jax.lax.dot_general(
                    u2, a, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (2n, nbx)
                for v in (0, 1):
                    val = xt[v * n : (v + 1) * n].reshape(bh, bw, nbx)
                    if merged_minor:
                        # round/clip first (commutes with the j-major
                        # permutation dot below)
                        vcollect[v].append(
                            jnp.clip(jnp.round(val), 0.0, 255.0)
                        )
                        continue
                    if emit_u8:
                        # display round/clip fused in (valid only when
                        # the downstream resize is a pure identity /
                        # gather — rounding commutes with gathering);
                        # f32 -> u8 hops through int32 on this Mosaic
                        val = (
                            jnp.clip(jnp.round(val), 0.0, 255.0)
                            .astype(jnp.int32)
                            .astype(jnp.uint8)
                        )
                    if channel_minor:
                        # channel axis just above (bw, nbx): the display
                        # tail then un-pitches AND interleaves in ONE
                        # lane gather over the contiguous (C, bw, nbx)
                        # minor block (models/decoder.py)
                        o_ref[0, 2 * u + v, :, ch] = val
                    else:
                        o_ref[0, ch, 2 * u + v] = val
            if merged_minor:
                # j-major sublane interleave on the MXU (see
                # _jmajor_perm / the resample kernel's identical trick):
                # the packed display tail is then one swapaxes relayout
                # instead of a 3-axis gather; with `pack`, the 4-byte
                # int32 word pack folds into the same dots
                # (_jmajor_pack_perms) and the relayout moves 4x fewer
                # elements
                for v in (0, 1):
                    stackc = (
                        vcollect[v][0].reshape(n, nbx)
                        if channels > 1 or pack
                        else None
                    )
                    if channels > 1:
                        stackc = jnp.concatenate(
                            [
                                x.reshape(n, nbx)
                                for x in vcollect[v]
                            ],
                            axis=0,
                        )  # (C*n, nbx), rows c*n + r*bw + j — free
                    if pack:
                        sb = stackc.astype(jnp.bfloat16)
                        lo = jax.lax.dot_general(
                            plo_ref[...], sb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        hi = jax.lax.dot_general(
                            phi_ref[...], sb,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        o_ref[0, 2 * u + v] = (
                            lo.astype(jnp.int32)
                            + hi.astype(jnp.int32) * 65536
                        ).reshape(bh, s4, nbx)
                        continue
                    if channels == 1:
                        q = vcollect[v][0].reshape(bh, bw, nbx)
                    else:
                        q = jax.lax.dot_general(
                            perm_ref[...],
                            stackc.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(bh, bw * channels, nbx)
                    o_ref[0, 2 * u + v] = q.astype(jnp.int32).astype(
                        jnp.uint8
                    )

    return kernel


def idct_wire_to_pitched_pallas(
    coeffs: jnp.ndarray,
    steps: jnp.ndarray,
    channels: int,
    block_h: int,
    block_w: int,
    emit_u8: bool = False,
    channel_minor: bool = False,
    merged_minor: bool = False,
) -> jnp.ndarray:
    """Fused dequantize + inverse blockwise DCT into column-pitched planes.

    The decode-side twin of :func:`dct2_planes_to_wire_pallas`: consumes
    ``(T, nby, nbx, C*bh*bw)`` float32 wire coefficients and per-block
    quantization steps ``(T, nby, nbx)`` (libs/decoder.cpp:128-149), and
    emits ``(T, C, nby*bh, bw, nbx)`` float32 column-pitched planes — the
    layout ``ops.dct.idct2_wire_to_planes_pitched`` produces, with the
    pitch "transpose" performed implicitly by the MXU in the second
    contraction and the dequant fused into the coefficient load. Replaces
    the XLA path's (C*n, C*n) mostly-zero stage dots plus a separate
    full-tensor pitch transpose (together ~6 ms of the 12 ms 1080p decode
    batch).

    Returns planes whose storage position ``(j, x)`` on the last two axes
    holds spatial column ``x*bw + j`` (see idct2_wire_to_planes_pitched's
    ``col_map``). ``channel_minor`` moves the channel axis to just above
    ``(bw, nbx)`` — ``(T, nby*bh, C, bw, nbx)`` — so the display tail can
    un-pitch and interleave in a single lane gather over the contiguous
    per-row ``(C, bw, nbx)`` block. ``merged_minor`` (implies u8) emits
    ``(T, nby*bh, bw*C, nbx)`` with the J-MAJOR merged sublane minor
    (position ``(j*C + c, x)`` = channel ``c`` of spatial column
    ``x*bw + j``, via the in-kernel bf16 permutation dot): packed display
    rows are then one ``swapaxes`` + minor flatten — the identity-resize
    display route's tail drops from a 3-axis gather to a single relayout
    (same trick and measurements as ``idct_wire_resample_pallas``).
    """
    t, nby, nbx, cn = coeffs.shape
    n = block_h * block_w
    r = _rows_per_step(nby)
    assert r % 2 == 0
    # steps regrouped (T, nby/r, rp, nbx): the per-grid-step block then
    # carries its r step rows on an 8-aligned sublane axis (a (1, r, nbx)
    # block is illegal whenever r isn't 8-divisible — 4K's nby = 270
    # factors to r = 6)
    rp = ((r + 7) // 8) * 8
    steps_grp = jnp.pad(
        steps.astype(jnp.float32).reshape(t, nby // r, r, nbx),
        ((0, 0), (0, 0), (0, rp - r), (0, 0)),
    )
    kernel = _make_wire_idct_kernel(
        channels, r // 2, n, nbx, block_h, block_w,
        emit_u8=emit_u8, channel_minor=channel_minor,
        merged_minor=merged_minor,
    )
    pack = merged_minor and pack_words_supported(channels, block_w)
    out_dtype = jnp.uint8 if (emit_u8 or merged_minor) else jnp.float32
    u1p, u2p = _inv_pair_stage_weights(block_w, block_h)
    mspec = pl.BlockSpec(
        (2 * n, 2 * n), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    if merged_minor:
        out_minor = (
            (block_w * channels) // 4 if pack else channels * block_w
        )
        if pack:
            out_dtype = jnp.int32
        out_spec = pl.BlockSpec(
            (1, r, block_h, out_minor, nbx),
            lambda ti, yi: (ti, yi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (t, nby, block_h, out_minor, nbx), out_dtype
        )
    elif channel_minor:
        out_spec = pl.BlockSpec(
            (1, r, block_h, channels, block_w, nbx),
            lambda ti, yi: (ti, yi, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (t, nby, block_h, channels, block_w, nbx), out_dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (1, channels, r, block_h, block_w, nbx),
            lambda ti, yi: (ti, 0, yi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (t, channels, nby, block_h, block_w, nbx), out_dtype
        )
    perm_specs = []
    perm_args = []
    if merged_minor:
        if pack:
            plo, phi = _jmajor_pack_perms(channels, block_h, block_w)
            perm_args = [
                jnp.asarray(plo, jnp.bfloat16),
                jnp.asarray(phi, jnp.bfloat16),
            ]
        else:
            perm_args = [
                jnp.asarray(
                    _jmajor_perm(channels, block_h, block_w),
                    jnp.bfloat16,
                )
            ]
        perm_specs = [
            pl.BlockSpec(
                p.shape, lambda ti, yi: (0, 0),
                memory_space=pltpu.VMEM,
            )
            for p in perm_args
        ]
    out = pl.pallas_call(
        kernel,
        grid=(t, nby // r),
        in_specs=[
            mspec,
            mspec,
            pl.BlockSpec(
                (nbx, nbx), lambda ti, yi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + perm_specs
        + [
            pl.BlockSpec(
                (1, r, nbx, cn), lambda ti, yi: (ti, yi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, rp, nbx), lambda ti, yi: (ti, yi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jnp.asarray(u1p),
        jnp.asarray(u2p),
        jnp.eye(nbx, dtype=jnp.float32),
        *perm_args,
        coeffs,
        steps_grp,
    )
    if merged_minor:
        return out.reshape(t, nby * block_h, out_minor, nbx)
    if channel_minor:
        return out.reshape(
            t, nby * block_h, channels, block_w, nbx
        )
    return out.reshape(t, channels, nby * block_h, block_w, nbx)


def pallas_wire_idct_supported(
    channels: int, nby: int, nbx: int, block_h: int, block_w: int
) -> bool:
    """Shape gate: even rows-per-step (pairing), lane-aligned blocks, and
    a VMEM budget across the in/out blocks."""
    if nbx < 8 or nbx % 8 or nby < 2:
        return False
    n = block_h * block_w
    r = _rows_per_step(nby)
    if r % 2:
        return False
    in_bytes = r * nbx * channels * n * 4
    out_bytes = channels * r * n * nbx * 4
    return in_bytes + out_bytes <= 6 * 1024 * 1024


# ---------------------------------------------------------------------------
# Inverse + display row-resample: the full decode hot path in one kernel
# ---------------------------------------------------------------------------


def _make_wire_idct_resample_kernel(
    channels: int,
    pairs_per_step: int,
    n: int,
    nbx: int,
    bh: int,
    bw: int,
    n_groups: int,
    g_rows: int,
    pack: bool,
):
    s4 = (bw * channels) // 4 if pack else None

    def kernel(
        a_ref, jmp_ref,  # SMEM per-chunk tables (n_out, g_rows//bh)
        f_ref,  # VMEM per-row weights block (1, g_rows, 128)
        u1_ref, u2_ref, ident_ref, *rest,
    ):
        if pack:
            plo_ref, phi_ref, c_ref, s_ref, o_ref, win_ref = rest
        else:
            perm_ref, c_ref, s_ref, o_ref, win_ref = rest
        yi = pl.program_id(1)
        u1 = u1_ref[...]
        u2 = u2_ref[...]
        ident = ident_ref[...]

        # ---- phase 1: slide the window one group (previous group moves
        # to the front — unconditionally: the extra final step, when the
        # output tile count equals the group count, emits a tile whose
        # sources all live in the LAST group, which the slide moves to
        # the front half), then IDCT block-row group yi into the back ----
        for ch in range(channels):
            win_ref[ch, 0:g_rows] = win_ref[ch, g_rows : 2 * g_rows]

        @pl.when(yi < n_groups)
        def _compute():
            for u in range(pairs_per_step):
                rows = []
                for v in (0, 1):
                    c = c_ref[0, 2 * u + v]  # (nbx, C*n) f32
                    s = jax.lax.dot_general(
                        ident, s_ref[0, 0, 2 * u + v : 2 * u + v + 1, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (nbx, 1)
                    y = c / s
                    # round-half-away dequant with BITWISE sign handling
                    # (abs/sign-multiply replaced by mask ops — one VPU
                    # pass fewer over the 400 MB hot tensor). Exact:
                    # s > 0, so sign(y) rides y's sign bit, and
                    # multiplying the magnitude result by +-1 vs OR-ing
                    # the bit yields the same f32 (+-0 included; a -0
                    # contributes identically through the MXU dots)
                    ybits = pltpu.bitcast(y, jnp.uint32)
                    mag = pltpu.bitcast(
                        ybits & jnp.uint32(0x7FFFFFFF), jnp.float32
                    )
                    t = jnp.floor(mag + 0.5) * s
                    rows.append(
                        pltpu.bitcast(
                            pltpu.bitcast(t, jnp.uint32)
                            | (ybits & jnp.uint32(0x80000000)),
                            jnp.float32,
                        )
                    )
                for ch in range(channels):
                    g = jnp.concatenate(
                        [r[:, ch * n : (ch + 1) * n] for r in rows],
                        axis=1,
                    )  # (nbx, 2n)
                    a = jax.lax.dot_general(
                        g, u1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    xt = jax.lax.dot_general(
                        u2, a, (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (2n, nbx)
                    for v in (0, 1):
                        val = xt[v * n : (v + 1) * n].reshape(bh, bw, nbx)
                        row0 = g_rows + (2 * u + v) * bh
                        win_ref[ch, row0 : row0 + bh] = val

        # ---- phase 2: emit output tile yi-1 from the 2-group window.
        # Within any bh-row output chunk the source-row drift jumps at
        # most once (gated), so each chunk is ONE dynamic-start load of
        # bh+2 window rows plus a two-candidate select — no per-row
        # loads/stores. (A pl.when fast path for the jump-free chunks
        # measured slower than the unconditional selects — predication
        # overhead; selects stay.)
        #
        # Channels interleave into the SUBLANE axis before the u8
        # convert, J-MAJOR (s = j*C + c): the merged (bw*C, nbx) output
        # minor pair tile-pads 1.42x (24->32 sublanes) instead of the
        # channel-separated (C, bw, nbx) layout's 4.27x (8->32 per
        # channel) — 285 MB less write traffic per 1080p/16 batch —
        # and in j-major order the packed display row is EXACTLY
        # swapaxes(s, x) + minor flatten, ONE XLA relayout at
        # 0.71 ms/batch vs the 3-axis gather's 1.36
        # (benchmarks/micro_decode_tail.py variants I vs B/J).
        #
        # The interleave itself rides the MXU: round/clip FIRST (it
        # commutes with a permutation), making every value an exact
        # 0..255 integer, then one bf16 0/1-permutation-matrix dot
        # reorders the chunk's (C*bh*bw) sublanes in a single pass —
        # exact, since small integers are bf16-representable and each
        # output row has exactly one nonzero product. (VPU routes
        # measured: stack(axis=2)+reshape relayout +1.7 ms/batch,
        # sublane repeat+select +2.4 — cross-register sublane shuffles
        # don't vectorize; the MXU does them for ~0.2 ms.)
        @pl.when(yi >= 1)
        def _emit():
            k = yi - 1
            riota = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
            for q in range(g_rows // bh):
                a0 = a_ref[k, q]
                jmp = jmp_ref[k, q]
                fv = f_ref[0, q * bh : (q + 1) * bh, 0:1].reshape(
                    bh, 1, 1
                )

                after = riota >= jmp
                vals = []
                for ch in range(channels):
                    w = win_ref[ch, pl.ds(a0, bh + 2)]
                    top = jnp.where(after, w[1 : bh + 1], w[0:bh])
                    bot = jnp.where(
                        after, w[2 : bh + 2], w[1 : bh + 1]
                    )
                    vals.append(
                        # display round/clip, pre-permutation
                        jnp.clip(
                            jnp.round(top * (1.0 - fv) + bot * fv),
                            0.0,
                            255.0,
                        )
                    )
                stackc = (
                    vals[0].reshape(bh * bw, nbx)
                    if channels == 1
                    else jnp.concatenate(
                        [x.reshape(bh * bw, nbx) for x in vals],
                        axis=0,
                    )  # (C*bh*bw, nbx), rows c*n + r*bw + j — free
                )
                if pack:
                    # interleave + 4-byte int32 pack in the same dots
                    # (see _jmajor_pack_perms): the downstream swapaxes
                    # relayout then moves 4x fewer elements for the
                    # same bytes (0.30 vs 0.71 ms/batch at 1080p,
                    # micro_decode_tail variant L)
                    sb = stackc.astype(jnp.bfloat16)
                    lo = jax.lax.dot_general(
                        plo_ref[...], sb,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    hi = jax.lax.dot_general(
                        phi_ref[...], sb,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    words = (
                        lo.astype(jnp.int32)
                        + hi.astype(jnp.int32) * 65536
                    ).reshape(bh, s4, nbx)
                    o_ref[0, q * bh : (q + 1) * bh] = words
                elif channels == 1:
                    o_ref[0, q * bh : (q + 1) * bh] = (
                        vals[0].astype(jnp.int32).astype(jnp.uint8)
                    )
                else:
                    v = jax.lax.dot_general(
                        perm_ref[...],
                        stackc.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(bh, bw * channels, nbx)
                    o_ref[0, q * bh : (q + 1) * bh] = v.astype(
                        jnp.int32
                    ).astype(jnp.uint8)

    return kernel


def _resample_loc_ext(
    y0: np.ndarray, out_h: int, g_rows: int, n_out: int
) -> np.ndarray:
    """Per-output-row source positions in 2-group window coordinates,
    linearly extended past ``out_h`` (pad rows of the tail tile — masked
    off by the non-divisible output block, but the chunk drift pattern
    must stay monotone; the boundary chunk's overhang reads land in the
    window scratch's ``bh`` pad rows, selected with weight 0)."""
    pad_rows = n_out * g_rows
    rows = np.arange(pad_rows)
    y_ext = np.where(
        rows < out_h,
        np.concatenate([y0, np.zeros(pad_rows - out_h, y0.dtype)]),
        int(y0[out_h - 1]) + rows - (out_h - 1),
    )
    return y_ext - (rows // g_rows) * g_rows


def idct_wire_resample_pallas(
    coeffs: jnp.ndarray,
    steps: jnp.ndarray,
    channels: int,
    block_h: int,
    block_w: int,
    y0: np.ndarray,
    y1: np.ndarray,
    fy: np.ndarray,
    out_h: int,
) -> jnp.ndarray:
    """Fused dequantize + inverse wire DCT + bilinear row-resample +
    display round/clip, in ONE pass over the wire coefficients.

    The decode hot path (libs/decoder.cpp:128-149 then the display
    resize :210) without the pitched float32 intermediate: the unfused
    pipeline writes and re-reads the full (T, C, PH, bw, nbx) plane
    stack between the IDCT and resample kernels — 802 MB per 16-frame
    1080p batch against 401 MB of coefficients actually read. Here each
    grid step slides a two-group VMEM window (previous group to the
    front), inverse-transforms one block-row group into its back half,
    and emits the PREVIOUS display-row tile by lerping window rows via
    per-chunk dynamic-start loads (the resample's 2-row halo never
    leaves VMEM). Validity of the two-group window is guaranteed by
    :func:`pallas_wire_idct_resample_supported`: every output tile k
    reads source rows inside groups {k, k+1} exactly when
    ``y0[Y] >= Y`` (downscale) and the per-tile drift stays under one
    group — true for every LCM-padded display geometry.

    Returns merged-minor ``(T, out_h, bw*C, nbx)`` uint8, J-MAJOR:
    position ``(j*C + c, x)`` holds channel ``c`` of spatial column
    ``x*bw + j``. Packed display rows ``(T, out_h, W*C)`` are then
    exactly ``swapaxes(-1, -2)`` + a minor flatten — one XLA relayout
    (0.71 ms/batch at 1080p/16 vs 1.36 for any gather-based tail,
    benchmarks/micro_decode_tail.py), and the merged 24-sublane minor
    tile-pads 1.42x vs the channel-separated layout's 4.27x.
    """
    t, nby, nbx, cn = coeffs.shape
    n = block_h * block_w
    r = _rows_per_step(nby)
    assert r % 2 == 0
    g_rows = r * block_h
    in_h = nby * block_h
    n_groups = nby // r
    n_out = -(-out_h // g_rows)
    n_steps = max(n_groups, n_out + 1)

    # per-output-row source tables in window coordinates (the 2-group
    # sliding window of tile k covers input rows [g*k, g*(k+2)) at
    # positions [0, 2g)); pad rows of the tail tile (masked off by the
    # non-divisible output block) replay the last real row with weight 0
    pad_rows = n_out * g_rows
    loc_ext = _resample_loc_ext(y0, out_h, g_rows, n_out)
    fp = np.zeros(pad_rows, np.float32)
    fp[:out_h] = fy
    chunks = loc_ext.reshape(n_out, g_rows // block_h, block_h)
    a_tab = chunks[:, :, 0].astype(np.int32)  # (n_out, chunks)
    drift = chunks - (
        chunks[:, :, :1] + np.arange(block_h)[None, None, :]
    )
    # chunks made entirely of pad rows (masked off by the non-divisible
    # output block) read window row 0 with weight 0 — never a real output
    full_pad = (
        np.arange(pad_rows).reshape(n_out, -1, block_h)[:, :, 0] >= out_h
    )
    a_tab = np.where(full_pad, 0, a_tab)
    real_drift = drift[~full_pad]
    assert ((real_drift == 0) | (real_drift == 1)).all(), (
        "idct_wire_resample_pallas called outside its drift gate"
    )
    # first in-chunk row whose source drifted by one (block_h if none)
    jmp_tab = np.where(
        drift.any(axis=2), np.argmax(drift == 1, axis=2), block_h
    ).astype(np.int32)
    jmp_tab = np.where(full_pad, block_h, jmp_tab).astype(np.int32)
    f_tab = np.repeat(
        fp.reshape(n_out, g_rows)[:, :, None], 128, axis=2
    ).astype(np.float32)

    rp = ((r + 7) // 8) * 8
    steps_grp = jnp.pad(
        steps.astype(jnp.float32).reshape(t, nby // r, r, nbx),
        ((0, 0), (0, 0), (0, rp - r), (0, 0)),
    )
    u1p, u2p = _inv_pair_stage_weights(block_w, block_h)
    pack = pack_words_supported(channels, block_w)
    if pack:
        plo, phi = _jmajor_pack_perms(channels, block_h, block_w)
        perms = [
            jnp.asarray(plo, jnp.bfloat16),
            jnp.asarray(phi, jnp.bfloat16),
        ]
        s4 = (block_w * channels) // 4
        out_minor, out_dtype = s4, jnp.int32
    else:
        perms = [
            jnp.asarray(
                _jmajor_perm(channels, block_h, block_w), jnp.bfloat16
            )
        ]
        out_minor, out_dtype = channels * block_w, jnp.uint8
    kernel = _make_wire_idct_resample_kernel(
        channels, r // 2, n, nbx, block_h, block_w, n_groups, g_rows,
        pack,
    )
    mspec = pl.BlockSpec(
        (2 * n, 2 * n), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    grp_clamp = lambda ti, yi: (  # noqa: E731
        ti, jnp.minimum(yi, n_groups - 1), 0, 0,
    )
    out = pl.pallas_call(
        kernel,
        grid=(t, n_steps),
        in_specs=[
            smem((n_out, g_rows // block_h), lambda ti, yi: (0, 0)),
            smem((n_out, g_rows // block_h), lambda ti, yi: (0, 0)),
            pl.BlockSpec(
                (1, g_rows, 128),
                lambda ti, yi: (jnp.maximum(yi - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            mspec,
            mspec,
            pl.BlockSpec(
                (nbx, nbx), lambda ti, yi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                p.shape, lambda ti, yi: (0, 0),
                memory_space=pltpu.VMEM,
            )
            for p in perms
        ]
        + [
            pl.BlockSpec((1, r, nbx, cn), grp_clamp,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, rp, nbx),
                lambda ti, yi: (ti, jnp.minimum(yi, n_groups - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, g_rows, out_minor, nbx),
            lambda ti, yi: (ti, jnp.maximum(yi - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # rows = out_h exactly: the tail tile's pad rows are masked off
        # by the non-divisible block (a caller-side [:, :out_h] slice
        # materialized a 0.77 ms/batch copy at 1080p)
        out_shape=jax.ShapeDtypeStruct(
            (t, out_h, out_minor, nbx), out_dtype
        ),
        scratch_shapes=[
            # 2 groups + bh pad rows (the fixed-size chunk load may
            # overhang by up to bh-2 rows when its chunk has no drift
            # jump; the overhang rows are never selected)
            pltpu.VMEM(
                (channels, 2 * g_rows + block_h, block_w, nbx),
                jnp.float32,
            ),
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(
        jnp.asarray(a_tab),
        jnp.asarray(jmp_tab),
        jnp.asarray(f_tab),
        jnp.asarray(u1p),
        jnp.asarray(u2p),
        jnp.eye(nbx, dtype=jnp.float32),
        *perms,
        coeffs,
        steps_grp,
    )
    return out


def pallas_wire_idct_resample_supported(
    channels: int,
    nby: int,
    nbx: int,
    block_h: int,
    block_w: int,
    y0: np.ndarray,
    y1: np.ndarray,
    fy: np.ndarray,
    out_h: int,
) -> bool:
    """Gate for the fused resample kernel: the base IDCT gate, a true
    downscale whose source never lags the output row (``y0[Y] >= Y``),
    the standard clamp pattern, and every output tile's 2-row-halo
    window inside its two ring groups."""
    if not pallas_wire_idct_supported(channels, nby, nbx, block_h, block_w):
        return False
    r = _rows_per_step(nby)
    g_rows = r * block_h
    in_h = nby * block_h
    if not (1 <= out_h <= in_h) or out_h != y0.shape[0]:
        return False
    # no bottom clamp anywhere: the kernel reads bot = top + 1
    if not (y1 == y0 + 1).all() or int(y1[-1]) > in_h - 1:
        return False
    if (y0 < np.arange(out_h)).any():
        return False
    n_out = -(-out_h // g_rows)
    for k in range(n_out):
        lo = int(y0[k * g_rows])
        hi = int(y1[min((k + 1) * g_rows, out_h) - 1])
        if lo < k * g_rows or hi >= (k + 2) * g_rows:
            return False
    # at most one source-row drift step inside any bh-row output chunk
    # (full-pad tail chunks are table-overridden, so exclude them)
    pad_rows = n_out * g_rows
    loc = _resample_loc_ext(y0, out_h, g_rows, n_out)
    chunks = loc.reshape(-1, block_h)
    real = np.arange(pad_rows).reshape(-1, block_h)[:, 0] < out_h
    drift = chunks - (chunks[:, :1] + np.arange(block_h)[None, :])
    drift = drift[real]
    return bool(((drift == 0) | (drift == 1)).all())


def pallas_wire_dct_supported(
    channels: int, h: int, w: int, block_w: int, block_h: int
) -> bool:
    """Shape gate: divisible grid, sublane-reshapeable tiles, and a VMEM
    budget ( <= ~4 MB across in/out blocks at the chosen rows-per-step)."""
    if h % block_h or w % block_w:
        return False
    nby, nbx = h // block_h, w // block_w
    if nbx < 8 or nby < 1:
        return False
    n = block_h * block_w
    r = _rows_per_step(nby)
    in_bytes = channels * r * n * nbx
    out_bytes = r * nbx * channels * n * 4
    return in_bytes + out_bytes <= 4 * 1024 * 1024
