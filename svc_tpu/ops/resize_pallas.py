"""Pallas TPU kernel: the row stage of the decoder's bilinear resize.

The decoder resizes the padded reconstruction back to the display size
(reference: libs/decoder.cpp:210) at a near-unity scale, so the row map
``y0[Y] = Y + s(Y)`` has a small bounded shift that drifts by at most
``E_MAX`` rows across any aligned 8-row output tile. The XLA lowering
spends ~6 ms per 16-frame 1080p batch on this stage: two full-tensor row
gathers plus a blend that reads both gathered copies.

This kernel reads EXACTLY the source rows each output tile needs: the
per-tile base row ``y0(8i)`` is computed analytically INSIDE the BlockSpec
index maps (leading axes are block-1 granular, so single-row views can be
anchored at any row), giving ``rt + E_MAX + 1`` one-row views per tile —
no halo over-read (the first kernel generation read 3 aligned 8-row views,
a 3x read amplification) and no dense select chain over the global shift
range (it selected among ``s_max + 1`` candidates per row; here each row
picks between ``E_MAX + 1`` local offsets, with E_MAX = 1 for every real
display geometry). Measured on the 16-frame 1080p decode batch this cut
the resample from ~3.2 ms to ~1.2 ms.

The arithmetic is the same lerp expression the XLA path evaluates; the
compilers may contract the multiply-adds differently (FMA), so outputs
agree to ~1e-5 absolute at display scale — two orders of magnitude inside
the golden decoder gate (2.5e-4, tests/test_golden_e2e.py) and asserted
at 1e-4 in tests/test_pallas_kernels.py.

Operates on the column-pitched planes of
``dct.idct2_wire_to_planes_pitched`` — (C, PH, bw, nbx) — whose trailing
(8, nbx) axes tile exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 8
_E_MAX = 2  # max within-tile drift of the row shift (slope <= 1 + 2/rt)


def _base_rows(out_h: int, in_h: int) -> np.ndarray:
    """Analytic ``y0`` (no clipping): floor(((2Y+1)·in − out) / (2·out))."""
    ys = np.arange(out_h, dtype=np.int64)
    return ((2 * ys + 1) * in_h - out_h) // (2 * out_h)


def _make_kernel(
    rt: int,
    n_views: int,
    e_max: int,
    emit_u8: bool,
    channel_minor: bool = False,
):
    # per-row drift/weight tables sit in SMEM; each program reads its row
    # group by grid index. One program handles ALL frames of one (channel,
    # row tile): fat blocks keep the grid small — a per-frame grid ran
    # 6480 programs x 10 row-DMAs at 1080p and the per-step index-map
    # scalar work + tiny-copy overheads dominated (measured 4.6 ms; this
    # shape runs the same math in ~1 ms).
    def kernel(e_ref, f_ref, *refs):
        views = refs[:n_views]
        o_ref = refs[n_views]
        i = pl.program_id(1)
        for r in range(rt):
            e = e_ref[i, r]
            f = f_ref[i, r]
            top = views[r][:, 0, 0]
            bot = views[r + 1][:, 0, 0]
            for d in range(1, e_max + 1):
                take = e == d
                top = jnp.where(take, views[r + d][:, 0, 0], top)
                bot = jnp.where(take, views[r + d + 1][:, 0, 0], bot)
            v = top * (1.0 - f) + bot * f
            if emit_u8:
                # display clamp fused in: same round-half-even + clip the
                # XLA tail applies (f32 -> u8 must hop through int32 on
                # this Mosaic build); quarters the kernel's write traffic
                v = (
                    jnp.clip(jnp.round(v), 0.0, 255.0)
                    .astype(jnp.int32)
                    .astype(jnp.uint8)
                )
            if channel_minor:
                o_ref[:, r, 0] = v
            else:
                o_ref[:, 0, r] = v

    return kernel


def resize_rows_pallas(
    img: jnp.ndarray,
    y0: np.ndarray,
    y1: np.ndarray,
    fy: np.ndarray,
    emit_u8: bool = False,
    channel_minor: bool = False,
) -> jnp.ndarray:
    """Row-resample ``(C, H, bw, nbx)`` or batched ``(T, C, H, bw, nbx)``
    float32 pitched planes to the same shape with ``out_h`` rows, with
    per-row lerp weights.

    Host arrays ``y0``/``y1``/``fy`` follow ``resize_bilinear``'s axis
    conventions (``y1 = clip(y0 + 1)``; callers gate on
    :func:`rows_pallas_supported`). ``emit_u8`` fuses the display
    round/clip into the kernel (uint8 output) — valid only when nothing
    downstream blends in float (the decoder's pure-gather column step).
    Batched callers should pass the 5-D form directly rather than vmap:
    every frame shares the row map, so one fat grid step covers all
    frames of a (channel, row-tile) pair. ``channel_minor`` takes and
    emits the ``(T, H, C, bw, nbx)`` axis order instead (the layout whose
    display tail is a single lane gather, models/decoder.py).
    """
    batched = img.ndim == 5
    if not batched:
        img = img[None]
    if channel_minor:
        assert batched, "channel_minor expects the batched 5-D layout"
        t, h, c, bw, nbx = img.shape
    else:
        t, c, h, bw, nbx = img.shape
    out_h = y0.shape[0]
    rt = _ROW_TILE
    out_pad = -(-out_h // rt) * rt
    n_tiles = out_pad // rt

    # per-row drift within its aligned tile: e[Y] = y0[Y] - base(tile) - r,
    # with base(i) the analytic row map at the tile's first output row —
    # the EXACT expression the view index maps recompute on device
    tile_rows = rt * np.arange(n_tiles, dtype=np.int64)
    bases = ((2 * tile_rows + 1) * h - out_h) // (2 * out_h)
    e_real = y0 - bases.repeat(rt)[:out_h] - (np.arange(out_h) % rt)
    # the gate (rows_pallas_supported) guarantees this; assert rather
    # than clip so an ungated call fails loudly instead of silently
    # sampling the wrong source rows
    assert (e_real >= 0).all() and e_real.max() <= _E_MAX, (
        "resize_rows_pallas called outside its row-map gate"
    )
    e_tab = np.zeros(out_pad, np.int32)  # pad-tile rows stay at drift 0
    e_tab[:out_h] = e_real
    f_tab = np.zeros(out_pad, np.float32)
    f_tab[:out_h] = fy
    # y1 = y0 + 1 except at the bottom clamp, where fy is forced 0 — the
    # bot operand is multiplied by exact 0 there, so reading a clamped
    # (in-bounds) neighbour row is inert
    e_max = int(e_tab.max())
    n_views = rt + e_max + 1

    kernel = _make_kernel(
        rt, n_views, e_max, emit_u8, channel_minor=channel_minor
    )
    out_dtype = jnp.uint8 if emit_u8 else jnp.float32

    # base(i) recomputes the SAME analytic row map as the host e table
    # inside the index map (scalar integer ops only — index maps cannot
    # table-lookup); pad tiles (outputs sliced off) just clamp to h-1
    def make_view_map(d):
        def m(ci, i):
            base = ((2 * rt * i + 1) * h - out_h) // (2 * out_h)
            row = jnp.minimum(base + d, h - 1)
            if channel_minor:
                return (0, row, ci, 0, 0)
            return (0, ci, row, 0, 0)

        return m

    view_specs = [
        pl.BlockSpec(
            (t, 1, 1, bw, nbx), make_view_map(d), memory_space=pltpu.VMEM
        )
        for d in range(n_views)
    ]
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    if channel_minor:
        out_spec = pl.BlockSpec(
            (t, rt, 1, bw, nbx),
            lambda ci, i: (0, i, ci, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (t, out_pad, c, bw, nbx), out_dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (t, 1, rt, bw, nbx),
            lambda ci, i: (0, ci, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (t, c, out_pad, bw, nbx), out_dtype
        )
    out = pl.pallas_call(
        kernel,
        grid=(c, n_tiles),
        in_specs=[
            smem((n_tiles, rt), lambda ci, i: (0, 0)),
            smem((n_tiles, rt), lambda ci, i: (0, 0)),
        ]
        + view_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jnp.asarray(e_tab.reshape(-1, rt)),
        jnp.asarray(f_tab.reshape(-1, rt)),
        *([img] * n_views),
    )
    out = out[:, :out_h] if channel_minor else out[:, :, :out_h]
    return out if batched else out[0]


def rows_pallas_supported(
    y0: np.ndarray, y1: np.ndarray, fy: np.ndarray, h: int, tail_elems: int
) -> bool:
    """Gate: the analytic downscale row map (y0 equals the unclipped
    center-aligned formula, shifts nonnegative), bounded within-tile
    drift, the standard y1 clamp pattern, and a lane-friendly pitch."""
    out_h = y0.shape[0]
    rt = _ROW_TILE
    if not (
        out_h >= rt
        and h >= out_h
        and tail_elems >= 128
        and (y1 == np.clip(y0 + 1, 0, h - 1)).all()
        and (fy[y0 >= h - 1] == 0).all()
        and np.array_equal(y0, _base_rows(out_h, h))
    ):
        return False
    out_pad = -(-out_h // rt) * rt
    n_tiles = out_pad // rt
    tile_rows = rt * np.arange(n_tiles, dtype=np.int64)
    bases = ((2 * tile_rows + 1) * h - out_h) // (2 * out_h)
    e = y0 - bases.repeat(rt)[:out_h] - (np.arange(out_h) % rt)
    # every view row the real output rows touch must exist unclamped
    return bool((e >= 0).all() and e.max() <= _E_MAX)
