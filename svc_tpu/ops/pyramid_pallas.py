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
