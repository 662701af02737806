"""Pallas TPU kernel: the row stage of the decoder's bilinear resize.

The decoder resizes the padded reconstruction back to the display size
(reference: libs/decoder.cpp:210) at a near-unity scale, so the row map
``y0[Y] = Y + s(Y)`` has a small bounded shift ``s``. The XLA lowering
spends ~6 ms per 16-frame 1080p batch on this stage: two full-tensor row
gathers plus a blend that reads both gathered copies. This kernel fuses
all of it — each output row tile reads its (static) halo of input rows
once from VMEM and emits ``(1-f)*img[y0] + f*img[y1]`` directly, with the
per-row source picked by a masked select over the bounded shift values
(the same technique as the fused refine kernel; no dynamic addressing).
Measured in the full decode program this nets ~1.4 ms/batch over the XLA
lowering; several variants (two-level tile selects, direct 4-D output
blocks, gather-first spatial layout) all measured worse in context
because XLA re-materializes neighbouring layouts.

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


def _make_kernel(rt: int, n_views: int, s_max: int, emit_u8: bool):
    # the full (n_tiles, rt) shift/weight tables sit in SMEM; each program
    # reads its row by grid index
    def kernel(s_ref, f_ref, *refs):
        views = refs[:n_views]
        o_ref = refs[n_views]
        i = pl.program_id(1)
        rows = jnp.concatenate([v[0] for v in views], axis=0)
        for r in range(rt):
            sr = s_ref[i, r]
            f = f_ref[i, r]
            top = None
            bot = None
            for s in range(s_max + 1):
                cand_t = rows[r + s]
                cand_b = rows[r + s + 1]
                take = sr == s
                top = cand_t if top is None else jnp.where(take, cand_t, top)
                bot = cand_b if bot is None else jnp.where(take, cand_b, bot)
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
            o_ref[0, 0, r] = v

    return kernel


def resize_rows_pallas(
    img: jnp.ndarray,
    y0: np.ndarray,
    y1: np.ndarray,
    fy: np.ndarray,
    emit_u8: bool = False,
) -> jnp.ndarray:
    """Row-resample ``(C, H, bw, nbx)`` float32 pitched planes to
    ``(C, out_h, bw, nbx)`` with per-row lerp weights.

    Host arrays ``y0``/``y1``/``fy`` follow ``resize_bilinear``'s axis
    conventions (``y1 = clip(y0 + 1)``; callers gate on
    :func:`rows_pallas_supported`). ``emit_u8`` fuses the display
    round/clip into the kernel (uint8 output) — valid only when nothing
    downstream blends in float (the decoder's pure-gather column step).
    """
    c, h, bw, nbx = img.shape
    out_h = y0.shape[0]
    s = y0 - np.arange(out_h)
    s_max = int(s.max())
    rt = _ROW_TILE
    out_pad = -(-out_h // rt) * rt
    n_tiles = out_pad // rt
    s_tab = np.zeros(out_pad, np.int32)
    s_tab[:out_h] = s
    f_tab = np.zeros(out_pad, np.float32)
    f_tab[:out_h] = fy
    # y1 = y0 + 1 except at the bottom clamp, where fy is forced 0 — the
    # bot operand is multiplied by exact 0 there, so reading row y0+1
    # (in-bounds after padding) is inert
    n_views = -(-(rt + s_max + 1) // rt)
    rows_needed = (n_tiles - 1 + n_views) * rt
    imgp = jnp.pad(img, ((0, 0), (0, rows_needed - h), (0, 0), (0, 0)))

    kernel = _make_kernel(rt, n_views, s_max, emit_u8)
    out_dtype = jnp.uint8 if emit_u8 else jnp.float32
    view_specs = [
        pl.BlockSpec(
            (1, rt, bw, nbx),
            functools.partial(lambda d, ci, i: (ci, i + d, 0, 0), d),
            memory_space=pltpu.VMEM,
        )
        for d in range(n_views)
    ]
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(c, n_tiles),
        in_specs=[
            smem((n_tiles, rt), lambda ci, i: (0, 0)),
            smem((n_tiles, rt), lambda ci, i: (0, 0)),
        ]
        + view_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rt, bw, nbx),
            lambda ci, i: (ci, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (c, n_tiles, rt, bw, nbx), out_dtype
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(
        jnp.asarray(s_tab.reshape(-1, rt)),
        jnp.asarray(f_tab.reshape(-1, rt)),
        *([imgp] * n_views),
    ).reshape(c, out_pad, bw, nbx)[:, :out_h]


def rows_pallas_supported(
    y0: np.ndarray, y1: np.ndarray, fy: np.ndarray, h: int, tail_elems: int
) -> bool:
    """Gate: bounded non-negative shifts, standard y1 pattern, lane-friendly
    pitch, and a worthwhile size."""
    out_h = y0.shape[0]
    rt = _ROW_TILE
    s = y0 - np.arange(out_h)
    if not (
        out_h >= rt
        and (s >= 0).all()
        and s.max() <= 15
        and (y1 == np.clip(y0 + 1, 0, h - 1)).all()
        and tail_elems >= 128
        and (fy[y0 >= h - 1] == 0).all()
    ):
        return False
    # the kernel pads the input up to its tiled view extent; a steep
    # downscale can leave that extent SHORTER than the input (negative
    # pad) — such shapes take the XLA path
    out_pad = -(-out_h // rt) * rt
    n_views = -(-(rt + int(s.max()) + 1) // rt)
    rows_needed = (out_pad // rt - 1 + n_views) * rt
    return rows_needed >= h
