"""Pallas TPU kernel for Gaussian pyramid reduction.

Fuses the 5-tap binomial pyrDown (see ops/pyramid.py for the exact OpenCV
semantics this reproduces, reference: libs/encoder.cpp:470) into one
VMEM-resident kernel per frame: horizontal filter, vertical filter, and
round-descale happen without materializing intermediates in HBM.

Toolchain constraints shape the design (this environment's Mosaic compiler
rejects strided slices, lane reshapes, and all dynamic addressing; sublane
reshapes and contiguous static slices work — probed explicitly):

* the stride-2 *column* deinterleave is done by XLA outside the kernel
  (two cheap strided slices producing even/odd column planes),
* the stride-2 *row* deinterleave uses an in-kernel sublane reshape,
* everything else is contiguous static slices and elementwise VPU math.

Arithmetic is integer-exact: uint8 -> int16 horizontal sums (<= 4080) ->
int32 vertical sums (<= 65280) -> ``(v + 128) >> 8`` -> uint8, matching
``cv::pyrDown``'s fixed-point path bit for bit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pyr_kernel(e_ref, eh_ref, o_ref, oh_ref, out_ref):
    # e/o: (1, 2*RT, W/2+2) uint8 even/odd column planes of a row tile of
    # the reflect-padded frame; eh/oh: the 4-row halo below the tile;
    # out: (1, RT, W/2)
    _, rows, wp = e_ref.shape
    out_w = wp - 2
    out_h = rows // 2
    hp = rows + 4

    # the halo block is 8 rows for tiling-divisibility; only 4 are real
    e = jnp.concatenate([e_ref[0], eh_ref[0][:4]], axis=0).astype(jnp.int16)
    o = jnp.concatenate([o_ref[0], oh_ref[0][:4]], axis=0).astype(jnp.int16)

    # horizontal 5-tap at stride 2 via the even/odd decomposition:
    # hf[i] = E[i] + 6 E[i+1] + E[i+2] + 4 (O[i] + O[i+1]).
    # Tap weights are built from additions — this toolchain's Mosaic
    # compiler crashes on scalar*int multiplies (probed).
    ec = e[:, 1 : out_w + 1]
    ec2 = ec + ec
    osum = o[:, : out_w] + o[:, 1 : out_w + 1]
    osum2 = osum + osum
    hf = (
        e[:, : out_w]
        + (ec2 + ec2 + ec2)
        + e[:, 2 : out_w + 2]
        + (osum2 + osum2)
    )  # (hp, out_w) int16, <= 4080

    # vertical even/odd rows via sublane reshape (hp is even)
    half = hp // 2
    pairs = hf.reshape(half, 2, out_w)
    ev = pairs[:, 0, :].astype(jnp.int32)  # rows 0,2,4,...
    ov = pairs[:, 1, :].astype(jnp.int32)  # rows 1,3,5,...

    evc = ev[1 : out_h + 1]
    evc2 = evc + evc
    ovsum = ov[:out_h] + ov[1 : out_h + 1]
    ovsum2 = ovsum + ovsum
    v = (
        ev[:out_h]
        + (evc2 + evc2 + evc2)
        + ev[2 : out_h + 2]
        + (ovsum2 + ovsum2)
    )
    out_ref[0] = ((v + 128) >> 8).astype(jnp.uint8)


def _row_tile(out_h: int, target: int = 136) -> int:
    """Row-tile size: a multiple-of-8 divisor of ``out_h`` (output blocks
    must be 8-row divisible), else the whole height as a single tile when
    it is 4-aligned (the halo offset needs 8-row alignment = rt % 4 == 0)
    and small enough for VMEM. Returns 0 if unsupported."""
    best = 0
    for d in range(8, min(out_h, target) + 1, 8):
        if out_h % d == 0:
            best = d
    if best:
        return best
    if out_h % 4 == 0 and out_h <= 544:
        return out_h
    return 0


@jax.jit
def pyr_down_pallas(imgs: jnp.ndarray) -> jnp.ndarray:
    """One pyramid reduction of ``(T, H, W)`` uint8 planes (H, W even)."""
    t, h, w = imgs.shape
    out_h, out_w = h // 2, w // 2
    rt = _row_tile(out_h)
    n_tiles = out_h // rt

    pad = [(0, 0), (2, 2), (2, 2)]
    xp = jnp.pad(imgs, pad, mode="reflect")  # (t, h+4, w+4)
    even = xp[:, :, 0::2]  # (t, h+4, w/2+2)
    odd = xp[:, :, 1::2]

    # row tile i consumes padded rows [2*rt*i, 2*rt*i + 2*rt + 4): a main
    # block of 2*rt rows plus a 4-row halo block (rt is even, so the halo
    # offset is a whole number of 4-row blocks)
    main_spec = pl.BlockSpec(
        (1, 2 * rt, out_w + 2),
        lambda ti, i: (ti, i, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec = pl.BlockSpec(
        (1, 8, out_w + 2),
        lambda ti, i: (ti, (i + 1) * rt // 4, 0),
        memory_space=pltpu.VMEM,
    )

    return pl.pallas_call(
        _pyr_kernel,
        grid=(t, n_tiles),
        in_specs=[main_spec, halo_spec, main_spec, halo_spec],
        out_specs=pl.BlockSpec(
            (1, rt, out_w), lambda ti, i: (ti, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(even, even, odd, odd)


def pallas_pyr_supported(h: int, w: int) -> bool:
    """Even dims, a sane minimum size, and a valid row tiling."""
    return (
        h % 2 == 0
        and w % 2 == 0
        and h >= 8
        and w >= 16
        and _row_tile(h // 2) > 0
    )


# ---------------------------------------------------------------------------
# MXU variant: the horizontal stride-2 filter (and its reflect-101 border)
# as ONE selection-filter matmul, so the XLA-side reflect pad + even/odd
# column gathers disappear entirely.  Measured on the 16-frame 1080p encode
# batch, that prep cost ~1.3 ms against a 0.45 ms kernel: the pad
# materializes a (T, H+4, W+4) uint8 copy and each strided column slice is
# a half-frame gather.  Here the kernel reads the raw row-padded plane and
# computes ``hf = X @ M`` where ``M[(w, out_w)]`` holds the taps [1,4,6,4,1]
# scattered at stride 2 with the reflected border taps folded in.  uint8
# values and the taps are exact in bfloat16 and every horizontal sum is
# <= 4080, so the f32-accumulated MXU product is bit-exact integer
# arithmetic; the vertical stage then runs the same int32 VPU path as the
# VPU kernel above.
# ---------------------------------------------------------------------------


def _filter_matrix(w: int):
    """(w, w//2) float32 horizontal pyrDown matrix, reflect-101 folded."""
    import numpy as np

    out_w = w // 2
    m = np.zeros((w, out_w), np.float32)
    taps = (1.0, 4.0, 6.0, 4.0, 1.0)
    for j in range(out_w):
        for d in range(5):
            c = 2 * j + d - 2  # source column, reflect-101 at borders
            if c < 0:
                c = -c
            elif c >= w:
                c = 2 * w - 2 - c
            m[c, j] += taps[d]
    return m


def _pyr_mxu_kernel(xp_ref, x_ref, xn_ref, m_ref, out_ref, *, n_tiles):
    # x: (1, 2*RT, W) uint8 main rows of the UNPADDED plane; xp/xn: the
    # 8-row blocks just above/below (index-map clamped at the frame edges,
    # where the reflect-101 border rows are synthesized from the main
    # block instead); m: (W, OW) bf16 filter matrix. Reading the raw plane
    # through three views replaces the (T, H+8, W) row-padded concat copy
    # the previous version materialized in HBM (~0.3 ms/batch at 1080p).
    _, rows, w = x_ref.shape
    out_w = m_ref.shape[1]
    out_h = rows // 2
    hp = rows + 4

    i = pl.program_id(1)
    xm = x_ref[0]
    # two rows above (source rows 2rt*i - 2, -1): interior tiles take the
    # last two halo rows; tile 0 takes reflect-101 rows [2, 1] from its
    # own main block
    above = [
        jnp.where(i == 0, xm[2:3], xp_ref[0, 6:7]),
        jnp.where(i == 0, xm[1:2], xp_ref[0, 7:8]),
    ]
    # two rows below (source rows 2rt*(i+1), +1): interior tiles read the
    # next block; the last tile reflects rows [h-2, h-3] from its main
    last = n_tiles - 1
    below = [
        jnp.where(i == last, xm[rows - 2 : rows - 1], xn_ref[0, 0:1]),
        jnp.where(i == last, xm[rows - 3 : rows - 2], xn_ref[0, 1:2]),
    ]
    x = jnp.concatenate(above + [xm] + below, axis=0)
    xb = x.astype(jnp.int32).astype(jnp.bfloat16)
    hf = jax.lax.dot_general(
        xb,
        m_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (hp, out_w) exact ints <= 4080

    half = hp // 2
    pairs = hf.reshape(half, 2, out_w)
    ev = pairs[:, 0, :]
    ov = pairs[:, 1, :]
    evc = ev[1 : out_h + 1]
    evc2 = evc + evc
    ovsum = ov[:out_h] + ov[1 : out_h + 1]
    ovsum2 = ovsum + ovsum
    v = (
        ev[:out_h]
        + (evc2 + evc2 + evc2)
        + ev[2 : out_h + 2]
        + (ovsum2 + ovsum2)
    )
    out_ref[0] = ((v + 128) >> 8).astype(jnp.uint8)


@jax.jit
def pyr_down_mxu_pallas(imgs: jnp.ndarray) -> jnp.ndarray:
    """One pyramid reduction of ``(T, H, W)`` uint8 planes via the MXU."""
    import functools as _ft

    import numpy as np

    t, h, w = imgs.shape
    out_h, out_w = h // 2, w // 2
    rt = _row_tile(out_h)
    n_tiles = out_h // rt

    m = jnp.asarray(_filter_matrix(w).astype(np.float32), jnp.bfloat16)

    # three views of the raw plane: an 8-row block above the tile, the
    # 2*rt main rows, and an 8-row block below; the above/below indices
    # clamp into range at the frame edges (tile 0 / last tile), where the
    # kernel substitutes in-kernel reflect-101 rows and never reads the
    # clamped block's rows
    nblk8 = h // 8
    main_spec = pl.BlockSpec(
        (1, 2 * rt, w), lambda ti, i: (ti, i, 0), memory_space=pltpu.VMEM
    )
    prev_spec = pl.BlockSpec(
        (1, 8, w),
        lambda ti, i: (ti, jnp.maximum(rt * i // 4 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    next_spec = pl.BlockSpec(
        (1, 8, w),
        lambda ti, i: (ti, jnp.minimum(rt * (i + 1) // 4, nblk8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    m_spec = pl.BlockSpec(
        (w, out_w), lambda ti, i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _ft.partial(_pyr_mxu_kernel, n_tiles=n_tiles),
        grid=(t, n_tiles),
        in_specs=[prev_spec, main_spec, next_spec, m_spec],
        out_specs=pl.BlockSpec(
            (1, rt, out_w), lambda ti, i: (ti, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(imgs, imgs, imgs, m)


def pallas_pyr_mxu_supported(h: int, w: int) -> bool:
    """The VPU-kernel gate plus a VMEM bound on the filter matrix (the
    full (w, w//2) bf16 matrix lives in VMEM: 4K's first reduction at
    w=3840 needs 14.7 MB and uses the column-tiled variant below)."""
    return (
        pallas_pyr_supported(h, w)
        and w % 2 == 0
        and w * (w // 2) * 2 <= 8 * 1024 * 1024
    )


# ---------------------------------------------------------------------------
# Column-tiled (banded) MXU variant: frames too wide for the full filter
# matrix (4K level 0, w = 3840: 14.7 MB) tile the OUTPUT columns instead.
# Each (row tile, col tile) program reads a 2ct-wide slab of the raw plane
# plus a 4-column boundary sliver and multiplies by ONE shared interior
# band matrix (2ct+4, ct) — the reflect-101 column border is baked into
# the boundary sliver on the XLA side (20 single-column slices per frame,
# microscopic), so every tile shares the same weights. Replaces the VPU
# path's reflect pad + stride-2 column gathers, which scalarized into
# ~18 ms/batch of copies at 4K.
# ---------------------------------------------------------------------------


def _band_matrix(ct: int):
    """(2ct+4, ct) interior horizontal pyrDown band: out col j (of the
    tile) reads assembled cols [2j, 2j+5) with taps [1,4,6,4,1]."""
    import numpy as np

    m = np.zeros((2 * ct + 4, ct), np.float32)
    taps = (1.0, 4.0, 6.0, 4.0, 1.0)
    for j in range(ct):
        for d in range(5):
            m[2 * j + d, j] = taps[d]
    return m


def _col_tile(out_w: int) -> int:
    """Largest 128-multiple divisor of ``out_w`` up to 512 (0 if none —
    both the output block and the 2x input slab must stay 128-lane
    aligned, so only 128-multiples are legal)."""
    for ct in (512, 384, 256, 128):
        if out_w % ct == 0:
            return ct
    return 0


def _boundary_cols(imgs, ct: int, nct: int):
    """(T, nct, H, 4) uint8: per col tile, the two columns left of it and
    the two right of it, reflect-101 at the frame borders (the col-tile
    axis leads so the kernel's blocks keep (rows, 4) as the tiled pair)."""
    t, h, w = imgs.shape
    cols = []
    for ci in range(nct):
        lo = 2 * ci * ct - 2
        hi = 2 * (ci + 1) * ct
        for c in (lo, lo + 1, hi, hi + 1):
            cc = -c if c < 0 else (2 * w - 2 - c if c >= w else c)
            cols.append(imgs[:, :, cc : cc + 1])
    stacked = jnp.concatenate(cols, axis=2).reshape(t, h, nct, 4)
    return jnp.swapaxes(stacked, 1, 2)  # (T, nct, H, 4)


def _pyr_mxu_banded_kernel(
    xp_ref, x_ref, xn_ref, bp_ref, b_ref, bn_ref, m_ref, out_ref,
    *, n_tiles,
):
    # x: (1, 2*RT, 2ct) main slab; xp/xn: 8-row blocks above/below
    # (clamped at frame edges, where reflect-101 rows come from the main
    # block); b*: matching (rows, 1, 4) boundary slivers; m: (2ct+4, ct)
    _, rows, w2 = x_ref.shape
    ct = m_ref.shape[1]
    out_h = rows // 2
    hp = rows + 4

    i = pl.program_id(1)

    def asm(main, prev, nxt):
        # reflect-101 rows at the frame edges, copied rows elsewhere —
        # applied identically to the main slab and the boundary sliver
        above = [
            jnp.where(i == 0, main[2:3], prev[6:7]),
            jnp.where(i == 0, main[1:2], prev[7:8]),
        ]
        last = n_tiles - 1
        below = [
            jnp.where(i == last, main[rows - 2 : rows - 1], nxt[0:1]),
            jnp.where(i == last, main[rows - 3 : rows - 2], nxt[1:2]),
        ]
        return jnp.concatenate(above + [main] + below, axis=0)

    xm = asm(x_ref[0], xp_ref[0], xn_ref[0])
    bm = asm(b_ref[0, 0], bp_ref[0, 0], bn_ref[0, 0])  # (hp, 4)
    x = jnp.concatenate(
        [bm[:, 0:2], xm, bm[:, 2:4]], axis=1
    )  # (hp, 2ct+4)
    xb = x.astype(jnp.int32).astype(jnp.bfloat16)
    hf = jax.lax.dot_general(
        xb,
        m_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (hp, ct) exact ints <= 4080

    half = hp // 2
    pairs = hf.reshape(half, 2, ct)
    ev = pairs[:, 0, :]
    ov = pairs[:, 1, :]
    evc = ev[1 : out_h + 1]
    evc2 = evc + evc
    ovsum = ov[:out_h] + ov[1 : out_h + 1]
    ovsum2 = ovsum + ovsum
    v = (
        ev[:out_h]
        + (evc2 + evc2 + evc2)
        + ev[2 : out_h + 2]
        + (ovsum2 + ovsum2)
    )
    out_ref[0] = ((v + 128) >> 8).astype(jnp.uint8)


@jax.jit
def pyr_down_mxu_banded_pallas(imgs: jnp.ndarray) -> jnp.ndarray:
    """One pyramid reduction of wide ``(T, H, W)`` uint8 planes via the
    MXU with column-tiled band matrices."""
    import functools as _ft

    import numpy as np

    t, h, w = imgs.shape
    out_h, out_w = h // 2, w // 2
    rt = _row_tile(out_h)
    ct = _col_tile(out_w)
    n_tiles = out_h // rt
    nct = out_w // ct

    m = jnp.asarray(_band_matrix(ct).astype(np.float32), jnp.bfloat16)
    bnd = _boundary_cols(imgs, ct, nct)

    nblk8 = h // 8
    main_spec = pl.BlockSpec(
        (1, 2 * rt, 2 * ct),
        lambda ti, i, ci: (ti, i, ci),
        memory_space=pltpu.VMEM,
    )
    prev_spec = pl.BlockSpec(
        (1, 8, 2 * ct),
        lambda ti, i, ci: (ti, jnp.maximum(rt * i // 4 - 1, 0), ci),
        memory_space=pltpu.VMEM,
    )
    next_spec = pl.BlockSpec(
        (1, 8, 2 * ct),
        lambda ti, i, ci: (
            ti, jnp.minimum(rt * (i + 1) // 4, nblk8 - 1), ci
        ),
        memory_space=pltpu.VMEM,
    )
    bmain_spec = pl.BlockSpec(
        (1, 1, 2 * rt, 4),
        lambda ti, i, ci: (ti, ci, i, 0),
        memory_space=pltpu.VMEM,
    )
    bprev_spec = pl.BlockSpec(
        (1, 1, 8, 4),
        lambda ti, i, ci: (ti, ci, jnp.maximum(rt * i // 4 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    bnext_spec = pl.BlockSpec(
        (1, 1, 8, 4),
        lambda ti, i, ci: (
            ti, ci, jnp.minimum(rt * (i + 1) // 4, nblk8 - 1), 0
        ),
        memory_space=pltpu.VMEM,
    )
    m_spec = pl.BlockSpec(
        (2 * ct + 4, ct), lambda ti, i, ci: (0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _ft.partial(_pyr_mxu_banded_kernel, n_tiles=n_tiles),
        grid=(t, n_tiles, nct),
        in_specs=[
            prev_spec, main_spec, next_spec,
            bprev_spec, bmain_spec, bnext_spec, m_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, rt, ct), lambda ti, i, ci: (ti, i, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(imgs, imgs, imgs, bnd, bnd, bnd, m)


def pallas_pyr_mxu_banded_supported(h: int, w: int) -> bool:
    """Wide-frame gate: valid row AND column tilings."""
    return (
        pallas_pyr_supported(h, w)
        and w % 2 == 0
        and _col_tile(w // 2) > 0
    )


# ---------------------------------------------------------------------------
# Pitched-input MXU variant: consume the frontend's COLUMN-PITCHED luma
# subplanes (ops/color.bgr_planes_to_y of the j-split de-interleave:
# y8[j, t, r, bx] = Y_spatial[t, r, bx*bw + j]) directly.  The horizontal
# filter matmul absorbs the un-pitch permutation for free: with
# M = _filter_matrix(w) the spatial product X @ M decomposes EXACTLY as
#
#     hf = sum_j  Y_j @ M_j,      M_j[b, ow] = M[b*bw + j, ow]
#
# — same multiplies, same f32 accumulation structure per output element
# up to addition order of exact integer terms, so results stay bit-exact
# (uint8 and the taps are exact in bfloat16; horizontal sums <= 4080).
# This deletes the ~0.6 ms/batch luma respatialize transpose that
# previously materialized the spatial plane just to feed pyrDown
# (models/encoder.py round-3 profile).  Vertical stage identical to
# _pyr_mxu_kernel.
# ---------------------------------------------------------------------------


def _pyr_mxu_pitched_kernel(*refs, n_tiles, bw):
    # refs: per j: (xp_j, x_j, xn_j) triplets; then m_js (bw matrices);
    # out. x_j: (1, 1, 2*RT, nbx) uint8 main rows of subplane j; xp/xn:
    # the 8-row blocks above/below (index-map clamped at frame edges,
    # where reflect-101 rows come from the main block).
    views = refs[: 3 * bw]
    m_refs = refs[3 * bw : 4 * bw]
    out_ref = refs[4 * bw]
    _, _, rows, nbx = views[1].shape
    out_w = m_refs[0].shape[1]
    out_h = rows // 2
    hp = rows + 4

    i = pl.program_id(1)
    last = n_tiles - 1

    hf = None
    for j in range(bw):
        xp, xm_, xn = views[3 * j], views[3 * j + 1], views[3 * j + 2]
        xm = xm_[0, 0]
        above = [
            jnp.where(i == 0, xm[2:3], xp[0, 0, 6:7]),
            jnp.where(i == 0, xm[1:2], xp[0, 0, 7:8]),
        ]
        below = [
            jnp.where(i == last, xm[rows - 2 : rows - 1], xn[0, 0, 0:1]),
            jnp.where(i == last, xm[rows - 3 : rows - 2], xn[0, 0, 1:2]),
        ]
        x = jnp.concatenate(above + [xm] + below, axis=0)  # (hp, nbx)
        xb = x.astype(jnp.int32).astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            xb,
            m_refs[j][...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hf = p if hf is None else hf + p
    hf = hf.astype(jnp.int32)  # (hp, out_w) exact ints <= 4080

    half = hp // 2
    pairs = hf.reshape(half, 2, out_w)
    ev = pairs[:, 0, :]
    ov = pairs[:, 1, :]
    evc = ev[1 : out_h + 1]
    evc2 = evc + evc
    ovsum = ov[:out_h] + ov[1 : out_h + 1]
    ovsum2 = ovsum + ovsum
    v = (
        ev[:out_h]
        + (evc2 + evc2 + evc2)
        + ev[2 : out_h + 2]
        + (ovsum2 + ovsum2)
    )
    out_ref[0] = ((v + 128) >> 8).astype(jnp.uint8)


@jax.jit
def pyr_down_mxu_pitched_pallas(y8: jnp.ndarray) -> jnp.ndarray:
    """One pyramid reduction of column-pitched ``(bw, T, H, W//bw)``
    uint8 luma subplanes via the MXU; returns SPATIAL ``(T, H//2, W//2)``
    planes, bit-exact vs ``pyr_down_mxu_pallas`` of the respatialized
    input (asserted in tests/test_pallas_kernels.py)."""
    import functools as _ft

    import numpy as np

    bw, t, h, nbx = y8.shape
    w = bw * nbx
    out_h, out_w = h // 2, w // 2
    rt = _row_tile(out_h)
    n_tiles = out_h // rt

    m = _filter_matrix(w).astype(np.float32)
    m_js = [
        jnp.asarray(m[j::bw], jnp.bfloat16) for j in range(bw)
    ]  # (nbx, out_w) each

    nblk8 = h // 8
    main_spec = lambda j: pl.BlockSpec(  # noqa: E731
        (1, 1, 2 * rt, nbx),
        _ft.partial(lambda jj, ti, i: (jj, ti, i, 0), j),
        memory_space=pltpu.VMEM,
    )
    prev_spec = lambda j: pl.BlockSpec(  # noqa: E731
        (1, 1, 8, nbx),
        _ft.partial(
            lambda jj, ti, i: (jj, ti, jnp.maximum(rt * i // 4 - 1, 0), 0),
            j,
        ),
        memory_space=pltpu.VMEM,
    )
    next_spec = lambda j: pl.BlockSpec(  # noqa: E731
        (1, 1, 8, nbx),
        _ft.partial(
            lambda jj, ti, i: (
                jj, ti, jnp.minimum(rt * (i + 1) // 4, nblk8 - 1), 0
            ),
            j,
        ),
        memory_space=pltpu.VMEM,
    )
    m_spec = pl.BlockSpec(
        (nbx, out_w), lambda ti, i: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = []
    for j in range(bw):
        in_specs += [prev_spec(j), main_spec(j), next_spec(j)]
    in_specs += [m_spec] * bw
    return pl.pallas_call(
        _ft.partial(_pyr_mxu_pitched_kernel, n_tiles=n_tiles, bw=bw),
        grid=(t, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rt, out_w), lambda ti, i: (ti, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(*([y8] * (3 * bw)), *m_js)


def pallas_pyr_mxu_pitched_supported(
    bw: int, h: int, w: int
) -> bool:
    """Gate for the pitched-input variant: the spatial MXU gate plus a
    whole number of 8-row blocks (halo views index 8-row blocks of the
    subplane stacks)."""
    return (
        pallas_pyr_mxu_supported(h, w)
        and w % bw == 0
        and h % 8 == 0
    )
