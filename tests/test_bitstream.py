"""Wire-format tests: header layout and block serialization round trips.

The byte layout is the contract between encoder and decoder processes
(reference: libs/codec.hpp:8-17, libs/encoder.cpp:222-269,
apps/decoder.cpp:59-85).
"""

import io
import struct

import numpy as np
import pytest

from svc_tpu.io import bitstream as bs


def _header(**kw):
    defaults = dict(
        frame_count=2,
        frame_w=32,
        frame_h=16,
        frame_excess_w=0,
        frame_excess_h=0,
        transform_block_w=8,
        transform_block_h=8,
        channel_count=3,
    )
    defaults.update(kw)
    return bs.Header(**defaults)


class TestHeader:
    def test_pack_size_and_layout(self):
        h = _header()
        raw = h.pack()
        assert len(raw) == bs.HEADER_SIZE == 32
        fields = struct.unpack("<8I", raw)
        assert fields == (2, 32, 16, 0, 0, 8, 8, 3)

    def test_roundtrip(self):
        h = _header(frame_excess_w=4, frame_excess_h=12)
        assert bs.Header.unpack(h.pack()) == h

    def test_derived_sizes(self):
        h = _header(frame_w=30, frame_excess_w=2, frame_h=14, frame_excess_h=2)
        assert h.padded_frame_w == 32 and h.padded_frame_h == 16
        assert h.blocks_per_frame == (32 // 8) * (16 // 8) == 8
        # 4 type bytes + 8*8*3 floats (apps/decoder.cpp:59-64)
        assert h.block_byte_count == 4 + 4 * 64 * 3
        assert h.frame_byte_count == 8 * h.block_byte_count

    def test_short_header_raises(self):
        with pytest.raises(ValueError):
            bs.Header.unpack(b"\x00" * 8)


class TestFrameSerialization:
    def test_hand_built_bytes_single_block(self):
        # one 2x2 transform block, one channel, known coeffs
        coeffs = np.array([[[1.0, 2.0], [3.0, 4.0]]], dtype=np.float32)
        types = np.array([[7]], dtype=np.uint32)
        raw = bs.serialize_frame(coeffs, types, 2, 2, 2, 2)
        expected = struct.pack("<I", 7) + struct.pack("<4f", 1, 2, 3, 4)
        assert raw == expected

    def test_row_major_within_block_and_channel_order(self):
        # 4x2 frame, 2x2 blocks, 2 channels: verify per-channel planes are
        # emitted block-by-block with block rows contiguous
        c0 = np.arange(8, dtype=np.float32).reshape(2, 4)
        c1 = c0 + 100
        coeffs = np.stack([c0, c1])
        types = np.array([[1, 2]], dtype=np.uint32)
        raw = bs.serialize_frame(coeffs, types, 2, 2, 2, 2)
        # block 0 covers cols 0-1: c0 rows [0,1],[4,5]; then c1
        b0 = struct.pack("<I", 1) + struct.pack(
            "<8f", 0, 1, 4, 5, 100, 101, 104, 105
        )
        b1 = struct.pack("<I", 2) + struct.pack(
            "<8f", 2, 3, 6, 7, 102, 103, 106, 107
        )
        assert raw == b0 + b1

    def test_block_type_expansion_from_mv_grid(self):
        # mv blocks 4x4, transform blocks 2x2 -> each mv type covers 2x2
        # transform blocks (libs/encoder.cpp:243-249)
        types = np.array([[5, 9]], dtype=np.uint32)  # mv grid 1x2, frame 4x8
        got = bs.block_types_for_transform_grid(types, 8, 4, 2, 2, 4, 4)
        expected = np.array([[5, 5, 9, 9], [5, 5, 9, 9]], dtype=np.uint32)
        np.testing.assert_array_equal(got, expected)

    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        h = _header(frame_w=24, frame_h=16, channel_count=3)
        coeffs = rng.normal(size=(3, 16, 24)).astype(np.float32)
        mv_types = rng.integers(0, 12, size=(1, 2)).astype(np.uint32)
        raw = bs.serialize_frame(coeffs, mv_types, 8, 8, 16, 16)
        assert len(raw) == h.frame_byte_count
        types, got = bs.deserialize_frame(raw, h)
        np.testing.assert_array_equal(
            types,
            bs.block_types_for_transform_grid(mv_types, 24, 16, 8, 8, 16, 16),
        )
        np.testing.assert_array_equal(got, coeffs)

    def test_stream_reader(self):
        h = _header(frame_count=3, frame_w=8, frame_h=8, channel_count=1)
        rng = np.random.default_rng(1)
        payloads = []
        buf = io.BytesIO()
        for _ in range(3):
            coeffs = rng.normal(size=(1, 8, 8)).astype(np.float32)
            raw = bs.serialize_frame(
                coeffs, np.zeros((1, 1), np.uint32), 8, 8, 16, 16
            )
            payloads.append(raw)
            buf.write(raw)
        buf.seek(0)
        got = list(bs.read_frames(buf, h))
        assert got == payloads

    def test_truncated_stream_raises(self):
        h = _header(frame_count=1, frame_w=8, frame_h=8, channel_count=1)
        buf = io.BytesIO(b"\x00" * (h.frame_byte_count - 1))
        with pytest.raises(ValueError, match="failed to read block"):
            list(bs.read_frames(buf, h))


class TestUntrustedStreams:
    """Adversarial bytes: the decode surface must fail with typed errors,
    never crash or accept impossible geometry (the reference trusts raw
    struct bytes, apps/decoder.cpp:106-111 — validate() is an addition)."""

    def test_header_fuzz_never_crashes(self):
        rng = np.random.default_rng(0)
        accepted = 0
        for _ in range(1000):
            raw = rng.bytes(32)
            try:
                h = bs.Header.unpack(raw)
                h.validate()
            except ValueError:
                continue
            accepted += 1
            # anything validate() lets through must have sane derived sizes
            assert h.blocks_per_frame >= 1
            assert h.block_byte_count > 0
        # random uint32s rarely satisfy the divisibility rules
        assert accepted < 100

    def test_arbitrary_payload_bytes_deserialize(self):
        # the frame payload is raw fixed-layout bytes: ANY byte string of
        # the right size must deserialize into well-shaped arrays
        h = _header()
        rng = np.random.default_rng(1)
        payload = rng.bytes(h.blocks_per_frame * h.block_byte_count)
        types, coeffs = bs.deserialize_frame_blocks(payload, h)
        nbx = h.padded_frame_w // h.transform_block_w
        nby = h.padded_frame_h // h.transform_block_h
        assert types.shape == (nby, nbx)
        assert coeffs.shape[:2] == (nby, nbx)

    def test_decoder_app_rejects_garbage_stream(self):
        import os
        import subprocess
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        rng = np.random.default_rng(2)
        proc = subprocess.run(
            [_sys.executable, "-m", "svc_tpu.apps.decoder_app",
             "--output", "/dev/null"],
            input=rng.bytes(4096), capture_output=True, env=env, cwd=repo,
        )
        assert proc.returncode != 0
        assert b"Traceback" not in proc.stderr
