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


_CT = 128  # output-column tile width of the in-kernel banded dots


def _col_windows(w: int):
    """Static column tiling of one pyrDown: per output-column tile,
    ``(src_lo, src_len, out_lo, out_len)``. The last tile may be narrow;
    source windows clip to the frame (reflect-101 taps at the global
    borders fold into the tile matrices instead)."""
    out_w = w // 2
    wins = []
    j0 = 0
    while j0 < out_w:
        jn = min(_CT, out_w - j0)
        lo = max(2 * j0 - 2, 0)
        hi = min(2 * (j0 + jn) + 2, w)
        wins.append((lo, hi - lo, j0, jn))
        j0 += jn
    return tuple(wins)


def _band_filter_matrix(w: int, lo: int, klen: int, j0: int, jn: int):
    """(klen, jn) float32 horizontal pyrDown band for output columns
    [j0, j0+jn): the global filter matrix's rows [lo, lo+klen) x those
    columns, reflect-101 folded at the frame borders. Dropping the
    all-zero rows outside the band is exact (adding exact zeros), so the
    tiled dot is bit-identical to the full (w, w//2) matrix dot."""
    import numpy as np

    m = np.zeros((klen, jn), np.float32)
    taps = (1.0, 4.0, 6.0, 4.0, 1.0)
    for j in range(jn):
        for d in range(5):
            c = 2 * (j0 + j) + d - 2  # source col, reflect-101 borders
            if c < 0:
                c = -c
            elif c >= w:
                c = 2 * w - 2 - c
            m[c - lo, j] += taps[d]
    return m


def _pyr_mxu_kernel(xp_ref, x_ref, xn_ref, *refs, n_tiles, wins):
    # x: (1, 2*RT, W) uint8 main rows of the UNPADDED plane; xp/xn: the
    # 8-row blocks just above/below (index-map clamped at the frame edges,
    # where the reflect-101 border rows are synthesized from the main
    # block instead); refs: one (klen, jn) bf16 band matrix per output
    # column tile, then the output. The horizontal filter runs as one
    # banded dot per column tile — the single full-width (W, W/2) matrix
    # this replaced is 5/W dense, so its dot burned ~W/500x the needed
    # MXU passes (measured 0.51 -> 0.16 ms per 17-frame 1080p level-1
    # call); dropping exact-zero products keeps it bit-identical.
    m_refs = refs[: len(wins)]
    out_ref = refs[len(wins)]
    _, rows, w = x_ref.shape
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
    hf_parts = []
    for (lo, klen, _, _), m_ref in zip(wins, m_refs):
        hf_parts.append(
            jax.lax.dot_general(
                xb[:, lo : lo + klen],
                m_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    hf = (
        hf_parts[0]
        if len(hf_parts) == 1
        else jnp.concatenate(hf_parts, axis=1)
    ).astype(jnp.int32)  # (hp, out_w) exact ints <= 4080
    out_w = hf.shape[1]

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

    wins = _col_windows(w)
    ms = [
        jnp.asarray(
            _band_filter_matrix(w, lo, klen, j0, jn).astype(np.float32),
            jnp.bfloat16,
        )
        for lo, klen, j0, jn in wins
    ]

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
    m_specs = [
        pl.BlockSpec(
            (klen, jn), lambda ti, i: (0, 0), memory_space=pltpu.VMEM
        )
        for _, klen, _, jn in wins
    ]
    return pl.pallas_call(
        _ft.partial(_pyr_mxu_kernel, n_tiles=n_tiles, wins=wins),
        grid=(t, n_tiles),
        in_specs=[prev_spec, main_spec, next_spec] + m_specs,
        out_specs=pl.BlockSpec(
            (1, rt, out_w), lambda ti, i: (ti, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(imgs, imgs, imgs, *ms)


def pallas_pyr_mxu_supported(h: int, w: int) -> bool:
    """The VPU-kernel gate plus a VMEM bound: the input row slab plus
    the banded tile matrices (~(2*CT+4)*CT*2 bytes each) must fit."""
    if not (pallas_pyr_supported(h, w) and w % 2 == 0):
        return False
    rt = _row_tile(h // 2)
    slab = 2 * rt * w  # uint8 main block
    mats = sum(
        klen * jn * 2 for _, klen, _, jn in _col_windows(w)
    )
    return slab + mats <= 8 * 1024 * 1024



# ---------------------------------------------------------------------------
# Pitched-input MXU variant: consume the frontend's COLUMN-PITCHED luma
# subplanes (ops/color.bgr_planes_to_y of the j-split de-interleave:
# y8[j, t, r, bx] = Y_spatial[t, r, bx*bw + j]) directly.  The horizontal
# filter matmul absorbs the un-pitch permutation for free: with
# M = the full filter matrix (_band_filter_matrix over the whole width) the spatial product X @ M decomposes EXACTLY as
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


def _pyr_mxu_pitched_kernel(*refs, n_tiles, bw, wins_b):
    # refs: per j: (xp_j, x_j, xn_j) triplets; then one (bw, K, jn) bf16
    # band stack per output-column window (round 5: the former full
    # (nbx, out_w) per-j matrices were ~1/out_w dense — banding the
    # per-j dots the same way as the spatial kernel cuts the MXU passes
    # ~7x; zero-padded band rows add exact zeros, and every sum is an
    # integer <= 4080, exact in f32 in any order); then out. x_j:
    # (1, 1, 2*RT, nbx) uint8 main rows of subplane j; xp/xn: the 8-row
    # blocks above/below (index-map clamped at frame edges, where
    # reflect-101 rows come from the main block). wins_b: per window,
    # (out_lo, out_len, K, per-j lane starts).
    views = refs[: 3 * bw]
    m_refs = refs[3 * bw : 3 * bw + len(wins_b)]
    out_ref = refs[3 * bw + len(wins_b)]
    _, _, rows, nbx = views[1].shape
    out_h = rows // 2
    hp = rows + 4

    i = pl.program_id(1)
    last = n_tiles - 1

    xbs = []
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
        xbs.append(x.astype(jnp.int32).astype(jnp.bfloat16))

    hf_parts = []
    for wi, (_, _, klb, starts) in enumerate(wins_b):
        acc = None
        for j in range(bw):
            p = jax.lax.dot_general(
                xbs[j][:, starts[j] : starts[j] + klb],
                m_refs[wi][j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
        hf_parts.append(acc)
    hf = (
        hf_parts[0]
        if len(hf_parts) == 1
        else jnp.concatenate(hf_parts, axis=1)
    ).astype(jnp.int32)  # (hp, out_w) exact ints <= 4080
    out_w = hf.shape[1]

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

    # banded per-j filter stacks: for output-column window
    # [j0, j0+jn) the spatial band reads source rows [lo, lo+klen);
    # subplane j's rows are the x-blocks b with b*bw + j in that range.
    # All j share one padded band depth K per window (zero rows add
    # exact zeros); lane starts clamp so the in-kernel static slice
    # stays in range, with the band rows offset to compensate.
    m = _band_filter_matrix(w, 0, w, 0, w // 2).astype(np.float32)
    wins = _col_windows(w)
    wins_b = []
    m_stacks = []
    for lo, klen, j0, jn in wins:
        p0s = [(j - lo) % bw for j in range(bw)]
        klbs = [-(-(klen - p0) // bw) for p0 in p0s]
        klb = max(klbs)
        starts = []
        stack = np.zeros((bw, klb, jn), np.float32)
        for j in range(bw):
            blo = (lo + p0s[j]) // bw
            s = min(blo, nbx - klb)
            off = blo - s
            for k in range(klbs[j]):
                stack[j, off + k] = m[(blo + k) * bw + j, j0 : j0 + jn]
            starts.append(s)
        wins_b.append((j0, jn, klb, tuple(starts)))
        m_stacks.append(jnp.asarray(stack, jnp.bfloat16))

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
    in_specs = []
    for j in range(bw):
        in_specs += [prev_spec(j), main_spec(j), next_spec(j)]
    in_specs += [
        pl.BlockSpec(
            (bw, klb, jn), lambda ti, i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for (_, jn, klb, _) in wins_b
    ]
    return pl.pallas_call(
        _ft.partial(
            _pyr_mxu_pitched_kernel,
            n_tiles=n_tiles, bw=bw, wins_b=tuple(wins_b),
        ),
        grid=(t, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rt, out_w), lambda ti, i: (ti, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, out_h, out_w), jnp.uint8),
        interpret=(jax.default_backend() == "cpu"),
    )(*([y8] * (3 * bw)), *m_stacks)


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
