"""Decoder display-route equivalence across geometry classes.

The decoder picks one of four display routes from the frame geometry
(models/decoder.py):

1. fused-u8 identity — both resize axes identities (zero frame excess):
   the display round/clip is emitted by the IDCT kernel itself;
2. batched row-resize — width identity, real row resample (row excess);
3. full bilinear with the pitched ``col_map`` (width excess);
4. the XLA fallback (``pallas_wire_idct_supported`` gate off).

Every route must decode the same wire coefficients to the same bytes.
Routes 1-3 are selected by geometry; route 4 is forced by monkeypatching
the kernel gate off — this pins the Pallas decode stack (interpret mode
on CPU) to the plain-XLA reference implementation at DECODER level, not
just per kernel.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from svc_tpu.config import DecoderConfig
from svc_tpu.io import bitstream


def _header(w, h, excess_w, excess_h):
    return bitstream.Header(
        frame_count=2,
        frame_w=w,
        frame_h=h,
        frame_excess_w=excess_w,
        frame_excess_h=excess_h,
        transform_block_w=8,
        transform_block_h=8,
        channel_count=3,
    )


# (display w, display h, excess w, excess h) — one geometry per route:
# zero excess (fused-u8 identity), row excess only (batched row-resize),
# width excess (bilinear col_map path)
GEOMETRIES = [
    (256, 64, 0, 0),
    (256, 56, 0, 8),
    (248, 64, 8, 0),
    # multi-tile fused-resample geometry (4 output tiles, one
    # non-divisible tail, drift jumps inside chunks — the 1080p shape
    # class for the fused dequant+IDCT+resample kernel)
    (256, 248, 0, 8),
]


@pytest.mark.parametrize("w,h,ew,eh", GEOMETRIES)
def test_pallas_route_matches_xla_fallback(w, h, ew, eh, monkeypatch):
    from svc_tpu.models import decoder as dec_mod

    hdr = _header(w, h, ew, eh)
    t = 2
    nby = hdr.padded_frame_h // 8
    nbx = hdr.padded_frame_w // 8
    rng = np.random.default_rng(hash((w, h, ew, eh)) % 2**31)
    coeffs = (rng.normal(size=(t, nby, nbx, 192)) * 90).astype(np.float32)
    btypes = rng.integers(0, 3, (t, nby, nbx)).astype(np.uint32)
    rects = np.tile(np.array([[w // 4, h // 4, 64, 32]], np.int32), (t, 1))

    dec = dec_mod.Decoder(DecoderConfig(), hdr, batch_size=t)
    # fast routes may emit int32-packed display words; normalize to bytes
    got = dec_mod.Decoder.packed_bytes(dec._decode_batch(coeffs, btypes, rects))

    monkeypatch.setattr(
        dec_mod, "pallas_wire_idct_supported", lambda *a: False
    )
    dec_xla = dec_mod.Decoder(DecoderConfig(), hdr, batch_size=t)
    ref = np.asarray(dec_xla._decode_batch(coeffs, btypes, rects))

    assert got.shape == ref.shape == (t, h, w * 3)
    if ew == 0 and eh == 0:
        # zero-excess route: the fused-u8 IDCT emit and the XLA fallback
        # share the identical dequant + stage-dot + round/clip chain with
        # NO resample float math on either side — bit-identical, so any
        # nonzero diff here is a regression, not tolerance
        np.testing.assert_array_equal(got, ref)
    else:
        # resampling routes may associate the resample/round float math
        # differently (FMA): identical after the uint8 display
        # quantization up to the documented boundary-pixel tolerance
        # (BASELINE.md decoded impact)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_two_kernel_fallback_route_matches_fused(monkeypatch):
    """With the fused resample kernel gated off, the width-aligned route
    falls back to the two-kernel path (channel-minor IDCT + channel-minor
    row-resample + the same gather tail). Pin it against the fused route
    at the display-byte level so the fallback cannot rot."""
    from svc_tpu.models import decoder as dec_mod

    w, h, ew, eh = 256, 248, 0, 8  # row-excess, multi-tile
    hdr = _header(w, h, ew, eh)
    t = 2
    nby = hdr.padded_frame_h // 8
    nbx = hdr.padded_frame_w // 8
    rng = np.random.default_rng(42)
    coeffs = (rng.normal(size=(t, nby, nbx, 192)) * 90).astype(np.float32)
    btypes = rng.integers(0, 3, (t, nby, nbx)).astype(np.uint32)
    rects = np.tile(np.array([[w // 4, h // 4, 64, 32]], np.int32), (t, 1))

    dec = dec_mod.Decoder(DecoderConfig(), hdr, batch_size=t)
    fused = dec_mod.Decoder.packed_bytes(dec._decode_batch(coeffs, btypes, rects))

    monkeypatch.setattr(
        dec_mod, "pallas_wire_idct_resample_supported", lambda *a: False
    )
    dec_fb = dec_mod.Decoder(DecoderConfig(), hdr, batch_size=t)
    fallback = dec_mod.Decoder.packed_bytes(
        dec_fb._decode_batch(coeffs, btypes, rects)
    )

    diff = np.abs(fused.astype(np.int32) - fallback.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fast_routes_emit_packed_words():
    """The zero-excess and width-aligned fast routes must emit
    int32-PACKED display words (4 bytes per lane, packed in-kernel):
    a silent regression to the uint8 emit would cost the 0.71-vs-0.30
    ms/batch tail relayout difference without failing any value test."""
    from svc_tpu.models import decoder as dec_mod

    rng = np.random.default_rng(3)
    for w, h, ew, eh in [(256, 64, 0, 0), (256, 56, 0, 8)]:
        hdr = _header(w, h, ew, eh)
        t = 2
        nby = hdr.padded_frame_h // 8
        nbx = hdr.padded_frame_w // 8
        coeffs = (rng.normal(size=(t, nby, nbx, 192)) * 90).astype(
            np.float32
        )
        btypes = rng.integers(0, 3, (t, nby, nbx)).astype(np.uint32)
        rects = np.tile(
            np.array([[w // 4, h // 4, 64, 32]], np.int32), (t, 1)
        )
        dec = dec_mod.Decoder(DecoderConfig(), hdr, batch_size=t)
        out = dec._decode_batch(coeffs, btypes, rects)
        assert np.asarray(out).dtype == np.int32, (w, h, ew, eh)
        assert dec_mod.Decoder.packed_bytes(out).shape == (t, h, w * 3)
