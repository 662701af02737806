"""Pallas TPU kernel for the HBMA candidate-MAD search.

This is the framework's counterpart of the reference's SSE2 MAD kernels
(``Mad16x16Sse2``/``Mad8x8Sse2`` with ``_mm_sad_epu8``,
libs/motion.cpp:472-550) — the innermost hot loop of the codec
(SURVEY.md §3.1). Where the SSE2 code evaluates one candidate block pair
per call, this kernel evaluates EVERY candidate of EVERY block in a block
row per grid step, entirely out of VMEM:

1. Per block row, a *motion-compensated extended strip* is assembled in a
   VMEM scratch: for each block, one dynamic-slice copy of its
   ``(bh + 2r, bw + 2r)`` search window from the (VMEM-resident) tracked
   frame, positioned by the block's propagated MV (read from SMEM). Blocks
   get disjoint ``bw + 2r``-wide cells, so windows never collide.
2. Every search offset ``(oy, ox)`` then becomes a *static* slice of the
   scratch, absolute-differenced against a pre-spread anchor strip across
   the full vector width — dense VPU work with no per-block control.
3. Column sums are reduced to per-block SADs by one 0/1 indicator matmul
   on the MXU (float32: SADs <= block_area * 255 < 2**24, exact).

HBM traffic per frame is one read of each luma plane plus the tiny SAD
output — versus re-reading the frame per candidate in the XLA fallback.

The kernel computes raw SADs only; MAD normalization and the reference's
exact sequential selection semantics (tie-breaks Q8, flat-region rule Q6,
cross-level carry) stay in ``ops.motion``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SAD formulation switch for the stack refine kernel (see
# _make_stack_refine_kernel): bf16 diffs + a ones-matmul reduce when
# True, int32 VPU reduce when False. Bit-identical either way (probed);
# measured at the 1080p base level the MXU variant is SLOWER (3.64 vs
# 3.35 ms/batch): each candidate's (1, bh*bw) x (bh*bw, mfw) dot wastes
# 127/128 MXU rows and the 9-per-subrow dot chain is latency-bound,
# costing more than the saved VPU reduction tree. Kept as the measured
# record of VERDICT r3's suggested attack; the int32 path stands as the
# toolchain floor (int16 compare/abs rejected by this Mosaic build).
_MXU_SAD = False


def _col_indicator(mfw: int, bw: int, r: int) -> np.ndarray:
    """(strip_width, mfw) 0/1 matrix selecting each block's anchor columns."""
    cw = bw + 2 * r
    width = mfw * cw
    ind = np.zeros((width, mfw), np.float32)
    for j in range(mfw):
        ind[j * cw + r : j * cw + r + bw, j] = 1.0
    return ind


def _spread_anchor(anchor: jnp.ndarray, mfw: int, bw: int, r: int) -> jnp.ndarray:
    """Spread ``(T, H, W)`` anchor cols into ``bw + 2r``-wide cells.

    Block j's columns land at ``[j*cw + r, j*cw + r + bw)`` — aligned with
    its window cell in the kernel scratch. Pad columns are zero; the
    indicator matmul ignores them.
    """
    t, h, w = anchor.shape
    cells = anchor.reshape(t, h, mfw, bw)
    cells = jnp.pad(cells, ((0, 0), (0, 0), (0, 0), (r, r)))
    return cells.reshape(t, h, mfw * (bw + 2 * r))


def _sad_kernel(mv_ref, tracked_ref, anchor_ref, colind_ref, out_ref, acc_ref):
    """One program = all candidates of one block row of one frame."""
    shape = out_ref.shape  # (1, 1, ncand, mfw)
    ncand, mfw = shape[2], shape[3]
    side = int(np.sqrt(ncand))
    r = (side - 1) // 2
    strip_h, strip_w = acc_ref.shape  # scratch strip: (bh + 2r, mfw*cw)
    bh = strip_h - 2 * r
    cw = strip_w // mfw
    bw = cw - 2 * r

    i = pl.program_id(1)

    anchor = anchor_ref[0]  # (bh, strip_w) int16, spread layout

    def build(j, _):
        my = mv_ref[0, 0, j, 1]
        mx = mv_ref[0, 0, j, 0]
        # tracked frame is pre-padded by PAD = bound + r on each side, so
        # window starts are always in range
        row0 = i * bh + my
        col0 = j * bw + mx
        window = tracked_ref[0, pl.ds(row0, strip_h), pl.ds(col0, cw)]
        acc_ref[:, pl.ds(j * cw, cw)] = window
        return 0

    jax.lax.fori_loop(0, mfw, build, 0, unroll=1)

    strip = acc_ref[...]
    base = anchor[:, r : strip_w - r]
    for oy in range(side):
        for ox in range(side):
            cand = strip[oy : oy + bh, ox : ox + strip_w - 2 * r]
            diff = jnp.abs(cand - base).astype(jnp.float32)
            colsum = jnp.sum(diff, axis=0, keepdims=True)  # (1, W')
            sad = jnp.dot(
                colsum,
                colind_ref[...],
                preferred_element_type=jnp.float32,
            )  # (1, mfw)
            out_ref[0, 0, oy * side + ox, :] = sad[0]


@functools.partial(
    jax.jit,
    static_argnames=("search_range", "block_w", "block_h", "mv_pad"),
)
def candidate_sads(
    tracked: jnp.ndarray,
    anchor: jnp.ndarray,
    mv_round: jnp.ndarray,
    search_range: int,
    block_w: int,
    block_h: int,
    mv_pad: int,
) -> jnp.ndarray:
    """Per-block SADs for all ``(2r+1)^2`` candidate offsets around each
    block's propagated position.

    Args:
      tracked/anchor: ``(T, H, W)`` uint8 luma planes.
      mv_round: ``(T, mfh, mfw, 2)`` int32 propagated MVs (x, y); pass
        zeros for an exhaustive search around the anchor grid.
      search_range: r; offsets scan ``[-r, r]^2`` in raster order.
      mv_pad: static bound on ``|mv_round|`` components (0 for EBMA).

    Returns:
      ``(T, (2r+1)^2, mfh, mfw)`` float32 SADs, raster offset order.
      Entries whose windows fall outside the frame are garbage — callers
      mask them (exactly like the reference skips clamped candidates).
    """
    t, h, w = tracked.shape
    r = search_range
    bw, bh = block_w, block_h
    mfh, mfw = h // bh, w // bw
    side = 2 * r + 1
    ncand = side * side
    cw = bw + 2 * r
    strip_w = mfw * cw

    pad = mv_pad + r
    tracked_pad = jnp.pad(
        tracked.astype(jnp.int16), ((0, 0), (pad, pad), (pad, pad)),
        constant_values=0,
    )
    anchor_spread = _spread_anchor(anchor, mfw, bw, r).astype(jnp.int16)
    # kernel slices cols [r, r + strip_w - 2r) of the spread strips; the
    # indicator must use that slice's coordinates
    colind = jnp.asarray(_col_indicator(mfw, bw, r)[r : strip_w - r])

    # the kernel addresses tracked with (i*bh + my, j*bw + mx) relative to
    # a frame origin shifted by (pad - r): fold that shift into mv
    mv_shifted = mv_round + (pad - r)

    grid = (t, mfh)
    kernel = pl.pallas_call(
        _sad_kernel,
        grid=grid,
        in_specs=[
                pl.BlockSpec(
                    (1, 1, mfw, 2),
                    lambda ti, i: (ti, i, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, h + 2 * pad, w + 2 * pad),
                    lambda ti, i: (ti, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bh, strip_w),
                    lambda ti, i: (ti, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (strip_w - 2 * r, mfw),
                    lambda ti, i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ncand, mfw),
            lambda ti, i: (ti, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, mfh, ncand, mfw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bh + 2 * r, strip_w), jnp.int16)],
        interpret=(jax.default_backend() == "cpu"),
    )
    out = kernel(
        mv_shifted.reshape(t, mfh, mfw, 2),
        tracked_pad,
        anchor_spread,
        colind,
    )
    return jnp.moveaxis(out, 1, 2)  # -> (t, ncand, mfh, mfw)


def pallas_supported(
    search_range: int, block_w: int, block_h: int, mfw: int
) -> bool:
    """Shape gate for the kernel: modest unroll, lane-friendly strips."""
    side = 2 * search_range + 1
    return side * side <= 81 and mfw * (block_w + 2 * search_range) >= 128


# ---------------------------------------------------------------------------
# Static-only refine kernel (compiles on this toolchain)
# ---------------------------------------------------------------------------
#
# The kernel above needs dynamic addressing, which this environment's
# Mosaic compiler rejects. This variant expresses the same per-block
# motion compensation with ONLY static operations: the per-block MV becomes
# dense masked selects over statically shifted full-width slices
# (output-indexed, so overlapping source reads need no disjoint "cells").
# Column compensation runs first — anchor and output columns then map 1:1,
# so the row masks index correctly by anchor column.


def _make_refine_kernel(r: int, shifts, bh: int, n_views: int):
    side = 2 * r + 1

    def kernel(mvy_ref, mvx_ref, *rest):
        # rest: n_views tracked row-block views, anchor, colind, out
        views = rest[:n_views]
        anchor_ref, colind_ref, out_ref = rest[n_views:]
        w = anchor_ref.shape[2]
        pad = (views[0].shape[2] - w) // 2

        # int16 throughout: this toolchain's Mosaic crashes on uint8 selects
        strip = jnp.concatenate(
            [v[0] for v in views], axis=0
        ).astype(jnp.int16)  # (3bh, Wp)
        mvx = mvx_ref[0, 0]  # (1, W) int32
        mvy = mvy_ref[0, 0]

        # columns first: C_ox[y, x] = strip[y, pad + x + mx(block(x)) + ox]
        cols = []
        for ox in range(-r, r + 1):
            acc = jnp.zeros((strip.shape[0], w), jnp.int16)
            for s in shifts:
                acc = jnp.where(
                    mvx == s, strip[:, pad + s + ox : pad + s + ox + w], acc
                )
            cols.append(acc)

        anchor = anchor_ref[0].astype(jnp.int16)  # (bh, W)
        colind = colind_ref[...]
        for oy in range(-r, r + 1):
            for ox in range(-r, r + 1):
                c = cols[ox + r]
                cand = jnp.zeros((bh, w), jnp.int16)
                for s in shifts:
                    cand = jnp.where(
                        mvy == s, c[bh + s + oy : bh + s + oy + bh, :], cand
                    )
                diff = jnp.abs(cand - anchor).astype(jnp.float32)
                colsum = jnp.sum(diff, axis=0, keepdims=True)  # (1, W)
                sad = jnp.dot(
                    colsum, colind, preferred_element_type=jnp.float32
                )  # (1, mfw)
                k = (oy + r) * side + (ox + r)
                out_ref[0, 0, k : k + 1, :] = sad

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("search_range", "block_w", "block_h", "mv_bound"),
)
def refine_sads_static(
    tracked: jnp.ndarray,
    anchor: jnp.ndarray,
    mv_round: jnp.ndarray,
    search_range: int,
    block_w: int,
    block_h: int,
    mv_bound: int,
) -> jnp.ndarray:
    """Candidate SADs via the static-only kernel.

    Same contract as ``candidate_sads`` (invalid-window entries are garbage
    and must be masked by the caller), restricted to
    ``mv_bound + search_range <= block_h`` so three ``block_h``-row views
    cover every window, and to even MVs (hierarchical refinement inputs are
    always doubled integer fields).
    """
    t, h, w = tracked.shape
    r = search_range
    bw, bh = block_w, block_h
    mfh, mfw = h // bh, w // bw
    side = 2 * r + 1
    pad = mv_bound + r
    assert pad <= bh

    # pad rows by exactly one block (>= pad) so row views stay block-aligned;
    # pad cols by `pad`
    hp = h + 2 * bh
    tracked_pad = jnp.pad(
        tracked, ((0, 0), (bh, bh), (pad, pad)), constant_values=0
    )

    # per-pixel-column MV masks, indexed by anchor column
    mvx_px = jnp.repeat(mv_round[..., 0], bw, axis=2).astype(jnp.int32)
    mvy_px = jnp.repeat(mv_round[..., 1], bw, axis=2).astype(jnp.int32)
    mvx_px = mvx_px.reshape(t, mfh, 1, w)
    mvy_px = mvy_px.reshape(t, mfh, 1, w)

    rows = np.zeros((w, mfw), np.float32)
    rows[np.arange(w), np.arange(w) // bw] = 1.0
    colind = jnp.asarray(rows)

    shifts = tuple(range(-mv_bound, mv_bound + 1, 2)) or (0,)
    kernel = _make_refine_kernel(r, shifts, bh, 3)

    view_spec = lambda k: pl.BlockSpec(  # noqa: E731
        (1, bh, w + 2 * pad),
        lambda ti, i, k=k: (ti, i + k, 0),
        memory_space=pltpu.VMEM,
    )
    mv_spec = pl.BlockSpec(
        (1, 1, 1, w), lambda ti, i: (ti, i, 0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        kernel,
        grid=(t, mfh),
        in_specs=[
            mv_spec,
            mv_spec,
            view_spec(0),
            view_spec(1),
            view_spec(2),
            pl.BlockSpec(
                (1, bh, w), lambda ti, i: (ti, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w, mfw), lambda ti, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, side * side, mfw),
            lambda ti, i: (ti, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (t, mfh, side * side, mfw), jnp.float32
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(mvy_px, mvx_px, tracked_pad, tracked_pad, tracked_pad, anchor, colind)
    return jnp.moveaxis(out, 1, 2)  # (t, ncand, mfh, mfw)


def static_refine_supported(
    r: int, block_w: int, block_h: int, mv_bound: int, w: int
) -> bool:
    """Gate for ``refine_sads_static``.

    Currently always False on hardware: although the kernel is fully
    static and exact (interpret-mode tested), this environment's remote
    Mosaic compiler also crashes on chained masked-select slices (probed:
    a single select chain over a loaded ref compiles; selecting from a
    previously selected value does not). Enable once the toolchain can
    compile it; the shape conditions below are the real requirements.
    """
    del r, block_w, block_h, mv_bound, w
    return False


# ---------------------------------------------------------------------------
# Fused spread-cell refine kernel — THE production motion kernel
# ---------------------------------------------------------------------------


def _two_stage_ok(bound_in: int) -> bool:
    """Wide shift ranges decompose as s = a + f (coarse multiples of 6,
    fine {-2, 0, 2}) — the same decomposition as motion.select_windows,
    valid when ``bound_in % 6 == 2`` (the default pyramid's base level
    hits bound_in = 14)."""
    return bound_in >= 8 and bound_in % 6 == 2


def _make_two_stage_refine_kernel(
    r: int, bound_in: int, pad: int, bh: int, bw: int, n_tiles: int, cw: int
):
    """Two-stage variant of :func:`_make_fused_refine_kernel`: with 15
    shifts a linear chain reads every candidate slice per output element
    (measured 3.0 ms/batch at the 1080p base level); coarse 6-multiples
    into a slightly taller intermediate plus a 3-way fine stage reads
    5 + 3 slices per axis instead (1.85 ms/batch, bit-exact). Coarse row
    slices assemble directly from the tile refs, so the full cells
    scratch copy disappears too."""
    wh, ww = bh + 2 * r, bw + 2 * r
    amax = bound_in - 2
    coarse = list(range(-amax, amax + 1, 6))
    fine = (-2, 0, 2)

    def kernel(*refs):
        views = refs[:n_tiles]
        a_ref, m_ref, o_ref, rc_scr, rf_scr, cc_scr = refs[n_tiles:]
        mvy = m_ref[0, 0:1, :, :]  # (1, 1, mfw) int32
        mvx = m_ref[0, 1:2, :, :]

        def coarse_of(mv):
            # round(mv/6)*6 for even mv (never exactly half), clipped;
            # integer arithmetic only (float round is untested Mosaic)
            mag = (jnp.abs(mv) + 3) // 6 * 6
            return jnp.clip(jnp.sign(mv) * mag, -amax, amax)

        ay, ax = coarse_of(mvy), coarse_of(mvx)
        fy, fx = mvy - ay, mvx - ax  # in {-2, 0, 2}

        def row_range(lo, size):
            """Rows [lo, lo+size) of the cell window, read straight from
            the consecutive block-row tile views."""
            pieces = []
            off = lo
            while off < lo + size:
                t = off // bh
                take = min((t + 1) * bh, lo + size) - off
                pieces.append(
                    views[t][0, off - t * bh : off - t * bh + take]
                )
                off += take
            if len(pieces) == 1:
                return pieces[0]
            return jnp.concatenate(pieces, axis=0)

        inter = None
        for a in coarse:
            sl = row_range(pad + a - 2 - r, wh + 4)
            inter = sl if inter is None else jnp.where(ay == a, sl, inter)
        rc_scr[...] = inter

        rc = rc_scr[...]
        winf = None
        for f in fine:
            sl = rc[2 + f : 2 + f + wh, :, :]
            winf = sl if winf is None else jnp.where(fy == f, sl, winf)
        rf_scr[...] = winf

        rf = rf_scr[...]
        cinter = None
        for a in coarse:
            sl = rf[:, pad + a - 2 - r : pad + a - 2 - r + ww + 4, :]
            cinter = sl if cinter is None else jnp.where(ax == a, sl, cinter)
        cc_scr[...] = cinter

        cc = cc_scr[...]
        out = None
        for f in fine:
            sl = cc[:, 2 + f : 2 + f + ww, :]
            out = sl if out is None else jnp.where(fx == f, sl, out)

        # widen the selected window ONCE; the per-candidate slices below
        # then read int32 directly (hoisting the unpack out of the loop
        # removes (2r+1)^2 - 1 full-block convert passes per program)
        out32 = out.astype(jnp.int32)
        a_blk = a_ref[0].astype(jnp.int32)
        o_ref[...] = jnp.zeros_like(o_ref)
        i = 0
        for oy in range(2 * r + 1):
            for ox in range(2 * r + 1):
                cand = out32[oy : oy + bh, ox : ox + bw, :]
                sad = jnp.sum(jnp.abs(cand - a_blk), axis=(0, 1))
                o_ref[0, i : i + 1, :] = sad[None, :]
                i += 1

    return kernel


def _make_fused_refine_kernel(
    r: int, bound_in: int, pad: int, bh: int, bw: int, n_tiles: int, cw: int
):
    """Kernel factory for :func:`refine_mads_pallas` (all params static)."""
    shifts = list(range(-bound_in, bound_in + 1, 2)) or [0]
    wh, ww = bh + 2 * r, bw + 2 * r

    def kernel(*refs):
        views = refs[:n_tiles]
        a_ref, m_ref, o_ref, cells_scr, win_scr = refs[n_tiles:]

        # assemble this block row's overlapping cell window from the
        # consecutive row tiles (pallas index_maps stride by whole blocks,
        # so overlap is realized as multiple shifted views — the same halo
        # technique as ops/pyramid_pallas.py)
        for t in range(n_tiles):
            cells_scr[t * bh : (t + 1) * bh, :, :] = views[t][0]

        mvy = m_ref[0, 0:1, :, :]  # (1, 1, mfw) int32
        mvx = m_ref[0, 1:2, :, :]

        # rows: one masked-select chain over the scratch picks each
        # block's vertical window position (mirrors motion._refine_spread)
        win = None
        for s in shifts:
            sl = cells_scr[pad + s - r : pad + s - r + wh, :, :]
            win = sl if win is None else jnp.where(mvy == s, sl, win)
        win_scr[...] = win

        # cols: second chain over the scratch (selecting again from the
        # chain's own value instead of a ref crashes this Mosaic build)
        wr = win_scr[...]
        out = None
        for s in shifts:
            sl = wr[:, pad + s - r : pad + s - r + ww, :]
            out = sl if out is None else jnp.where(mvx == s, sl, out)

        # every candidate is a static slice; |a-b| in int32 (uint8
        # max/min and int16 abs both crash this Mosaic build); the
        # window unpacks to int32 once, outside the candidate loop
        out32 = out.astype(jnp.int32)
        a = a_ref[0].astype(jnp.int32)
        o_ref[...] = jnp.zeros_like(o_ref)
        i = 0
        for oy in range(2 * r + 1):
            for ox in range(2 * r + 1):
                cand = out32[oy : oy + bh, ox : ox + bw, :]
                sad = jnp.sum(jnp.abs(cand - a), axis=(0, 1))
                o_ref[0, i : i + 1, :] = sad[None, :]
                i += 1

    return kernel


def refine_mads_pallas(
    tracked: jnp.ndarray,
    anchor: jnp.ndarray,
    mv_yx: jnp.ndarray,
    r: int,
    bound_in: int,
    block_w: int,
    block_h: int,
) -> jnp.ndarray:
    """Fused window-select + candidate-SAD refine for one frame.

    The TPU-native replacement for the reference's per-level SSE2 refiners
    (``RefineHierMotionEst{8x8,16x16}Sse2``, libs/motion.cpp:552-689): the
    tracked plane is read in block-pitched form exactly ONCE and both
    MV-conditioned window selections plus all ``(2r+1)^2`` candidate SADs
    happen VMEM-resident — versus the XLA select-chain path, which
    materializes 9x-overlapping strips and re-reads them once per shift.

    Args:
      tracked / anchor: ``(fh, fw)`` uint8 luma planes.
      mv_yx: ``(mfh, 2, 1, mfw)`` int32 — row 0 the y components, row 1
        the x components; values even in ``[-bound_in, bound_in]``.

    Returns ``(mfh, rows, mfw)`` int32 raw SADs, candidate (oy, ox) in
    raster order on the first ``(2r+1)**2`` rows (rest zero-padding).
    Bit-exact vs the XLA path (integer arithmetic throughout).
    """
    fh, fw = tracked.shape
    mfh, mfw = fh // block_h, fw // block_w
    pad = bound_in + r
    ch = block_h + 2 * pad
    cw = block_w + 2 * pad
    wh = block_h + 2 * r
    ncand = (2 * r + 1) ** 2
    rows_out = ((ncand + 7) // 8) * 8
    n_tiles = -(-ch // block_h)

    # block-pitched plane: cells_p[row, o, j] = padded[row, j*bw + o] —
    # one lane transpose per bw-wide part instead of transposing
    # 9x-duplicated overlapping strips
    rows_p = (mfh - 1 + n_tiles) * block_h
    width_needed = (cw - 1) // block_w * block_w + mfw * block_w
    tp = jnp.pad(
        tracked,
        ((pad, rows_p - fh - pad), (pad, width_needed - fw - pad)),
    )
    parts = [
        jnp.swapaxes(
            tp[:, c0 : c0 + mfw * block_w].reshape(rows_p, mfw, block_w),
            -1,
            -2,
        )
        for c0 in range(0, cw, block_w)
    ]
    # keep the part-aligned width (cwp >= cw): trimming to cw here forced
    # XLA to materialize a second full copy of the pitched plane at the
    # tiles reshape (~0.5 ms/batch at 1080p); the kernels never read
    # beyond column 2*bound_in + ww < cw, so the pad columns are inert
    cwp = len(parts) * block_w
    cells_p = jnp.concatenate(parts, axis=1)
    tiles = cells_p.reshape(rows_p // block_h, block_h, cwp, mfw)

    # anchor in block-pitched layout: leading-dim reshape is free
    anchor_p = jnp.swapaxes(
        anchor.reshape(fh, mfw, block_w), -1, -2
    ).reshape(mfh, block_h, block_w, mfw)

    wh_ = block_h + 2 * r
    ww_ = block_w + 2 * r
    if _two_stage_ok(bound_in):
        kernel = _make_two_stage_refine_kernel(
            r, bound_in, pad, block_h, block_w, n_tiles, cwp
        )
        scratches = [
            pltpu.VMEM((wh_ + 4, cwp, mfw), jnp.uint8),
            pltpu.VMEM((wh_, cwp, mfw), jnp.uint8),
            pltpu.VMEM((wh_, ww_ + 4, mfw), jnp.uint8),
        ]
    else:
        kernel = _make_fused_refine_kernel(
            r, bound_in, pad, block_h, block_w, n_tiles, cwp
        )
        scratches = [
            pltpu.VMEM((n_tiles * block_h, cwp, mfw), jnp.uint8),
            pltpu.VMEM((wh, cwp, mfw), jnp.uint8),
        ]
    tile_specs = [
        pl.BlockSpec(
            (1, block_h, cwp, mfw),
            functools.partial(lambda d, i: (i + d, 0, 0, 0), d),
            memory_space=pltpu.VMEM,
        )
        for d in range(n_tiles)
    ]
    return pl.pallas_call(
        kernel,
        grid=(mfh,),
        in_specs=tile_specs
        + [
            pl.BlockSpec(
                (1, block_h, block_w, mfw), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, 1, mfw), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_out, mfw), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mfh, rows_out, mfw), jnp.int32),
        scratch_shapes=scratches,
        interpret=(jax.default_backend() == "cpu"),
    )(*([tiles] * n_tiles), anchor_p, mv_yx)


def fused_refine_supported(
    mfh: int, ch: int, cw: int, mfw: int, bound_in: int
) -> bool:
    """VMEM-size and shift-structure gate for :func:`refine_mads_pallas`."""
    cells_bytes = ch * cw * mfw
    return (
        mfw >= 8
        and mfh >= 1
        and bound_in % 2 == 0
        and cells_bytes <= 2 * 1024 * 1024
    )


# ---------------------------------------------------------------------------
# Stack refine kernel — the production encoder's motion path
# ---------------------------------------------------------------------------
#
# Same algorithm as refine_mads_pallas, but over the FULL (T+1)-frame level
# stack at once: frame t's tracked plane and frame t+1's anchor blocks are
# both BlockSpec views of ONE shared block-pitched cell tensor, with the
# frame pairing expressed in the index maps (ti vs ti+1). This deletes the
# per-frame prep that dominated the measured encode profile: no tracked/
# anchor slice copies of the pyramid (lvl[:-1] / lvl[1:]), no per-frame
# pitched-plane concat, no separate anchor transpose — one pad + transpose
# + part-concat pass over the stack feeds every (frame, block-row) program.


def _make_stack_refine_kernel(
    r: int,
    bound_in: int,
    bh: int,
    bw: int,
    row_pad: int,
    col_pad: int,
    n_tiles: int,
    two_stage: bool,
    mfw: int,
    compact: bool,
    rpp: int = 1,
):
    """Kernel factory for :func:`refine_mads_stack_pallas`.

    ``row_pad``/``col_pad`` are the block-aligned paddings of the cell
    layout (raw pixel (0, 0) sits at cell row ``row_pad``, cell column
    ``col_pad``); selection offsets below are absolute in that frame.

    With ``compact`` the views are ``(1, bh, bw, lanes)`` windows of the
    block-pitched plane and the ``(2*halo_b + 1)``-shift cell widening
    (formerly a 3x-duplicated HBM tensor) happens here in VMEM — worth
    it for the big base level whose cell tensor is ~100 MB/batch, a net
    loss for the small levels where the per-program widening pass costs
    more than their tiny cell tensors; those keep the HBM cell layout.

    ``rpp`` block rows run per program (grid shrinks by rpp): the
    widening, tile DMAs, and program-fixed overheads amortize across the
    sub-rows, which otherwise cost ~0.25 us of each base-level program's
    ~2.7 us.
    """
    side = 2 * r + 1
    wh, ww = bh + 2 * r, bw + 2 * r
    shifts = list(range(-bound_in, bound_in + 1, 2)) or [0]
    amax = bound_in - 2
    coarse = list(range(-amax, amax + 1, 6)) if two_stage else []
    fine = (-2, 0, 2)
    halo_b = col_pad // bw

    def kernel(*refs):
        views = refs[:n_tiles]
        a_refs = refs[n_tiles : n_tiles + rpp]
        m_ref, o_ref = refs[n_tiles + rpp : n_tiles + rpp + 2]
        if compact:
            cells_scr = refs[n_tiles + rpp + 2]
            scratches = refs[n_tiles + rpp + 3 :]
        else:
            scratches = refs[n_tiles + rpp + 2 :]

        if compact:
            # widen the compact views into cell layout ONCE per program:
            # cells[row, k*bw + o, j] = view_row[o, j + k]. The store
            # normalizes each lane-shifted slice's layout (Mosaic cannot
            # concatenate values with mismatched lane offsets directly).
            for t in range(n_tiles):
                x = views[t][0]  # (bh, bw, lanes)
                for k in range(2 * halo_b + 1):
                    cells_scr[
                        t * bh : (t + 1) * bh, k * bw : (k + 1) * bw, :
                    ] = x[:, :, k : k + mfw]

            def rows(lo, size):
                """Cell rows [lo, lo+size) of the widened scratch."""
                return cells_scr[lo : lo + size]

        else:

            def rows(lo, size):
                """Cell rows [lo, lo+size) straight from the tile views."""
                pieces = []
                off = lo
                while off < lo + size:
                    t = off // bh
                    take = min((t + 1) * bh, lo + size) - off
                    pieces.append(
                        views[t][0, off - t * bh : off - t * bh + take]
                    )
                    off += take
                if len(pieces) == 1:
                    return pieces[0]
                return jnp.concatenate(pieces, axis=0)

        for s_row in range(rpp):
            base = row_pad + s_row * bh
            mvy = m_ref[0, s_row, 0:1, :, :]  # (1, 1, mfw) int32
            mvx = m_ref[0, s_row, 1:2, :, :]
            a_ref = a_refs[s_row]

            if two_stage:
                rc_scr, rf_scr, cc_scr = scratches

                def coarse_of(mv):
                    mag = (jnp.abs(mv) + 3) // 6 * 6
                    return jnp.clip(jnp.sign(mv) * mag, -amax, amax)

                ay, ax = coarse_of(mvy), coarse_of(mvx)
                fy, fx = mvy - ay, mvx - ax  # in {-2, 0, 2}

                inter = None
                for a in coarse:
                    sl = rows(base + a - 2 - r, wh + 4)
                    inter = (
                        sl
                        if inter is None
                        else jnp.where(ay == a, sl, inter)
                    )
                rc_scr[...] = inter

                rc = rc_scr[...]
                winf = None
                for f in fine:
                    sl = rc[2 + f : 2 + f + wh, :, :]
                    winf = (
                        sl if winf is None else jnp.where(fy == f, sl, winf)
                    )
                rf_scr[...] = winf

                rf = rf_scr[...]
                cinter = None
                for a in coarse:
                    sl = rf[
                        :, col_pad + a - 2 - r : col_pad + a - 2 - r + ww + 4
                    ]
                    cinter = (
                        sl
                        if cinter is None
                        else jnp.where(ax == a, sl, cinter)
                    )
                cc_scr[...] = cinter

                cc = cc_scr[...]
                out = None
                for f in fine:
                    sl = cc[:, 2 + f : 2 + f + ww, :]
                    out = sl if out is None else jnp.where(fx == f, sl, out)
            else:
                (win_scr,) = scratches
                win = None
                for s in shifts:
                    sl = rows(base + s - r, wh)
                    win = sl if win is None else jnp.where(mvy == s, sl, win)
                win_scr[...] = win

                wr = win_scr[...]
                out = None
                for s in shifts:
                    sl = wr[:, col_pad + s - r : col_pad + s - r + ww, :]
                    out = sl if out is None else jnp.where(mvx == s, sl, out)

            # anchor block: in the compact view, motion-field column j is
            # padded block column j + halo_b — a contiguous lane slice; in
            # cell layout, a full-cell-width window whose own columns sit
            # at [col_pad, col_pad + bw)
            if compact:
                a_blk = a_ref[0, :, :, halo_b : halo_b + mfw].astype(
                    jnp.int32
                )
            else:
                a_blk = a_ref[0, :, col_pad : col_pad + bw, :].astype(
                    jnp.int32
                )
            # unpack the selected window to int32 ONCE; per-candidate
            # slices then skip (2r+1)^2 - 1 full-block convert passes
            o_ref[0, s_row] = jnp.zeros_like(o_ref[0, s_row])
            if _MXU_SAD and bh * bw >= 128:
                # bf16 diffs + a ones-matmul reduction: |c - a| <= 255 is
                # EXACT in bfloat16, and the (1, bh*bw) x (bh*bw, mfw)
                # dot accumulates exact products in float32 (SAD <=
                # bh*bw*255 < 2^24) — bit-identical to the int32 path
                # while halving the per-candidate VPU traffic and moving
                # the 255-add reduction tree onto the MXU
                outb = out.astype(jnp.int32).astype(jnp.bfloat16)
                ab = a_blk.astype(jnp.bfloat16)
                ones = jnp.ones((1, bh * bw), jnp.bfloat16)
                i = 0
                for oy in range(side):
                    for ox in range(side):
                        cand = outb[oy : oy + bh, ox : ox + bw, :]
                        d = jnp.abs(cand - ab).reshape(bh * bw, mfw)
                        sad = jax.lax.dot_general(
                            ones, d,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (1, mfw) exact integers
                        o_ref[0, s_row, i : i + 1, :] = sad.astype(
                            jnp.int32
                        )
                        i += 1
            else:
                out32 = out.astype(jnp.int32)
                i = 0
                for oy in range(side):
                    for ox in range(side):
                        cand = out32[oy : oy + bh, ox : ox + bw, :]
                        sad = jnp.sum(jnp.abs(cand - a_blk), axis=(0, 1))
                        o_ref[0, s_row, i : i + 1, :] = sad[None, :]
                        i += 1

    return kernel


def refine_mads_stack_pallas(
    stack: jnp.ndarray,
    mv_yx: jnp.ndarray,
    r: int,
    bound_in: int,
    block_w: int,
    block_h: int,
) -> jnp.ndarray:
    """Fused window-select + candidate-SAD refine over a frame stack.

    Args:
      stack: ``(T+1, fh, fw)`` uint8 luma planes of one pyramid level;
        frame ``t`` is tracked against anchor ``t+1`` (the reference's
        pyramid swap, libs/encoder.cpp:661-663).
      mv_yx: ``(T, mfh, 2, 1, mfw)`` int32 propagated MVs — per frame, row
        0 the y components, row 1 the x; even values in
        ``[-bound_in, bound_in]``.

    Returns ``(T, mfh, rows_out, mfw)`` int32 raw SADs, candidate (oy, ox)
    raster order on the first ``(2r+1)**2`` rows (rest zero padding).
    Entries whose windows fall outside the frame are garbage — callers
    mask them (``motion._refine_select``), exactly like the per-frame
    kernel. Bit-exact vs the XLA fallback path (integer arithmetic).
    """
    tp1, fh, fw = stack.shape
    bw, bh = block_w, block_h
    pad = bound_in + r
    rowpad_b = -(-pad // bh)
    halo_b = -(-pad // bw)
    row_pad = rowpad_b * bh
    col_pad = halo_b * bw
    lanes = fw // bw + 2 * halo_b

    # ONE shared block-pitched tensor for the whole stack:
    #   q[t, row, o, jk] = padded[t, row, jk*bw + o]
    # (a single lane transpose of the padded stack). Every program's
    # tracked tiles AND its anchor block view are BlockSpec windows of
    # either q itself (``compact``: the ``2*halo_b + 1`` lane-shift
    # widening to cell layout happens in-kernel — the former HBM cells
    # tensor duplicated every base-level byte 3x, ~100 MB/batch at
    # 1080p) or, for the small levels where per-program widening costs
    # more than their tiny cell tensors, of the XLA-widened cells.
    padded = jnp.pad(
        stack, ((0, 0), (row_pad, row_pad), (col_pad, col_pad))
    )
    q = jnp.swapaxes(
        padded.reshape(tp1, fh + 2 * row_pad, lanes, bw), -1, -2
    )  # (T+1, rows_p, bw, lanes)
    return _refine_stack_call(
        q, fh, fw, mv_yx, r, bound_in, block_w, block_h
    )


@functools.lru_cache(maxsize=None)
def _pitched_cell_selector(m: int, nbx: int, lanes: int, halo_b: int, b: int):
    """(nbx, lanes) 0/1 selector: subplane lanes -> cell lanes for MV
    block phase ``b`` (cell lane l holds subplane column m*(l - halo_b)
    + b; out-of-range columns are the zero halo)."""
    sel = np.zeros((nbx, lanes), np.float32)
    for l in range(lanes):
        x = m * (l - halo_b) + b
        if 0 <= x < nbx:
            sel[x, l] = 1.0
    return sel


def stack_cells_from_pitched(
    y8: jnp.ndarray, block_w: int, r: int, bound_in: int, block_h: int
) -> jnp.ndarray:
    """Build the refine kernel's shared cell tensor ``q`` straight from
    COLUMN-PITCHED luma subplanes (ops/color luma of the j-split
    de-interleave: ``y8[j, t, row, bx] = Y[t, row, bx*tbw + j]``),
    replacing the spatial path's full-plane pad + lane transpose
    (~0.9 ms/batch at 1080p) with one tiny exact selection einsum per
    q sublane: q sublane ``o`` reads subplane ``o mod tbw`` through a
    (nbx, lanes) 0/1 matrix realizing the stride-``bw/tbw`` lane pick
    and the zero column halo in the same contraction. Row padding is
    zero rows — identical to the spatial jnp.pad. Bit-exact vs the
    spatial construction (asserted in tests/test_pallas_kernels.py)."""
    tbw, tp1, fh, nbx = y8.shape
    bw = block_w
    assert bw % tbw == 0
    m = bw // tbw
    pad = bound_in + r
    rowpad_b = -(-pad // block_h)
    halo_b = -(-pad // bw)
    row_pad = rowpad_b * block_h
    lanes = (nbx // m) + 2 * halo_b

    planes = []
    for o in range(bw):
        sel = jnp.asarray(
            _pitched_cell_selector(m, nbx, lanes, halo_b, o // tbw),
            jnp.bfloat16,
        )
        planes.append(
            jnp.einsum(
                "trx,xl->trl",
                y8[o % tbw].astype(jnp.bfloat16),
                sel,
                preferred_element_type=jnp.float32,
            ).astype(jnp.uint8)
        )
    q = jnp.stack(planes, axis=2)  # (T+1, fh, bw, lanes)
    return jnp.pad(q, ((0, 0), (row_pad, row_pad), (0, 0), (0, 0)))


def refine_mads_stack_pitched_pallas(
    y8: jnp.ndarray,
    mv_yx: jnp.ndarray,
    r: int,
    bound_in: int,
    block_w: int,
    block_h: int,
) -> jnp.ndarray:
    """:func:`refine_mads_stack_pallas` consuming column-pitched luma
    subplanes directly (same contract and bit-identical SADs; the
    spatial plane never materializes)."""
    tbw, tp1, fh, nbx = y8.shape
    fw = tbw * nbx
    q = stack_cells_from_pitched(y8, block_w, r, bound_in, block_h)
    return _refine_stack_call(
        q, fh, fw, mv_yx, r, bound_in, block_w, block_h
    )


def _refine_stack_call(
    q: jnp.ndarray,
    fh: int,
    fw: int,
    mv_yx: jnp.ndarray,
    r: int,
    bound_in: int,
    block_w: int,
    block_h: int,
) -> jnp.ndarray:
    """Shared pallas_call tail of the stack refine (q already built)."""
    tp1 = q.shape[0]
    t = tp1 - 1
    bw, bh = block_w, block_h
    mfh, mfw = fh // bh, fw // bw
    pad = bound_in + r
    ncand = (2 * r + 1) ** 2
    rows_out = ((ncand + 7) // 8) * 8

    rowpad_b = -(-pad // bh)
    halo_b = -(-pad // bw)
    row_pad = rowpad_b * bh
    col_pad = halo_b * bw
    rpp = 2 if mfh % 2 == 0 else 1  # block rows per program
    n_tiles = 2 * rowpad_b + rpp
    lanes = mfw + 2 * halo_b
    cw_cells = (2 * halo_b + 1) * bw

    compact = bh >= 16
    if not compact:
        cells = jnp.concatenate(
            [q[:, :, :, k : k + mfw] for k in range(2 * halo_b + 1)],
            axis=2,
        )  # (T+1, rows_p, (2*halo_b+1)*bw, mfw)

    two_stage = _two_stage_ok(bound_in)
    kernel = _make_stack_refine_kernel(
        r, bound_in, bh, bw, row_pad, col_pad, n_tiles, two_stage, mfw,
        compact, rpp,
    )
    wh_, ww_ = bh + 2 * r, bw + 2 * r
    if two_stage:
        scratches = [
            pltpu.VMEM((wh_ + 4, cw_cells, mfw), jnp.uint8),
            pltpu.VMEM((wh_, cw_cells, mfw), jnp.uint8),
            pltpu.VMEM((wh_, ww_ + 4, mfw), jnp.uint8),
        ]
    else:
        scratches = [pltpu.VMEM((wh_, cw_cells, mfw), jnp.uint8)]
    if compact:
        scratches = [
            pltpu.VMEM((n_tiles * bh, cw_cells, mfw), jnp.uint8)
        ] + scratches

    vshape = (1, bh, bw, lanes) if compact else (1, bh, cw_cells, mfw)
    tile_specs = [
        pl.BlockSpec(
            vshape,
            functools.partial(
                lambda d, ti, i: (ti, i * rpp + d, 0, 0), d
            ),
            memory_space=pltpu.VMEM,
        )
        for d in range(n_tiles)
    ]
    anchor_specs = [
        pl.BlockSpec(
            vshape,
            functools.partial(
                lambda s, ti, i: (ti + 1, i * rpp + s + rowpad_b, 0, 0), s
            ),
            memory_space=pltpu.VMEM,
        )
        for s in range(rpp)
    ]
    mv_spec = pl.BlockSpec(
        (1, rpp, 2, 1, mfw),
        lambda ti, i: (ti, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(t, mfh // rpp),
        in_specs=tile_specs + anchor_specs + [mv_spec],
        out_specs=pl.BlockSpec(
            (1, rpp, rows_out, mfw),
            lambda ti, i: (ti, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, mfh, rows_out, mfw), jnp.int32),
        scratch_shapes=scratches,
        interpret=(jax.default_backend() == "cpu"),
    )(
        *([q if compact else cells] * (n_tiles + rpp)),
        mv_yx.reshape(t, mfh, 2, 1, mfw),
    )


def pitched_refine_supported(
    tbw: int,
    mfh: int,
    mfw: int,
    block_w: int,
    block_h: int,
    r: int,
    bound_in: int,
) -> bool:
    """Gate for :func:`refine_mads_stack_pitched_pallas`: the stack gate
    plus the compact (bh >= 16) cell layout and a whole number of
    subplane phases per MV block column."""
    return (
        stack_refine_supported(mfh, mfw, block_w, block_h, r, bound_in)
        and block_h >= 16
        and block_w % tbw == 0
    )


def stack_refine_supported(
    mfh: int, mfw: int, block_w: int, block_h: int, r: int, bound_in: int
) -> bool:
    """Shape/VMEM gate for :func:`refine_mads_stack_pallas`."""
    pad = bound_in + r
    rowpad_b = -(-pad // block_h)
    halo_b = -(-pad // block_w)
    # mirror the kernel's rows-per-program choice (rpp=2 for even mfh)
    # so odd-mfh geometries near the VMEM bound are not rejected for a
    # scratch the single-row kernel never allocates
    rpp = 2 if mfh % 2 == 0 else 1
    n_tiles = 2 * rowpad_b + rpp
    cells_bytes = n_tiles * block_h * (2 * halo_b + 1) * block_w * mfw
    return (
        mfw >= 8
        and mfh >= 1
        and bound_in % 2 == 0
        and cells_bytes <= 2 * 1024 * 1024
    )
