"""Blockwise DCT/IDCT and quantization tests (oracle: cv2.dct/idct)."""

import numpy as np
import pytest

import jax.numpy as jnp

from svc_tpu.ops.dct import dct2_blockwise, dct_matrix, idct2_blockwise
from svc_tpu.ops.quant import block_quant_steps, quantize, round_half_away

cv2 = pytest.importorskip("cv2")


def _blockwise_cv_dct(plane, bw, bh, inverse=False):
    out = plane.copy()
    for y in range(0, plane.shape[0], bh):
        for x in range(0, plane.shape[1], bw):
            blk = plane[y : y + bh, x : x + bw]
            out[y : y + bh, x : x + bw] = (
                cv2.idct(blk) if inverse else cv2.dct(blk)
            )
    return out


class TestDct:
    def test_dct_matrix_orthonormal(self):
        d = dct_matrix(8)
        np.testing.assert_allclose(d @ d.T, np.eye(8), atol=1e-6)

    @pytest.mark.parametrize("bw,bh", [(8, 8), (4, 8), (8, 4)])
    def test_forward_matches_opencv(self, bw, bh):
        rng = np.random.default_rng(0)
        plane = rng.uniform(0, 255, (16, 24)).astype(np.float32)
        ref = _blockwise_cv_dct(plane, bw, bh)
        got = np.asarray(dct2_blockwise(jnp.asarray(plane), bw, bh))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_inverse_matches_opencv(self):
        rng = np.random.default_rng(1)
        coeffs = rng.uniform(-500, 500, (16, 16)).astype(np.float32)
        ref = _blockwise_cv_dct(coeffs, 8, 8, inverse=True)
        got = np.asarray(idct2_blockwise(jnp.asarray(coeffs), 8, 8))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_roundtrip_identity(self):
        rng = np.random.default_rng(2)
        plane = rng.uniform(0, 255, (32, 32)).astype(np.float32)
        coeffs = dct2_blockwise(jnp.asarray(plane), 8, 8)
        back = np.asarray(idct2_blockwise(coeffs, 8, 8))
        np.testing.assert_allclose(back, plane, atol=1e-3)

    def test_batched_channels(self):
        rng = np.random.default_rng(3)
        planes = rng.uniform(0, 255, (3, 16, 16)).astype(np.float32)
        got = np.asarray(dct2_blockwise(jnp.asarray(planes), 8, 8))
        for c in range(3):
            single = np.asarray(dct2_blockwise(jnp.asarray(planes[c]), 8, 8))
            np.testing.assert_array_equal(got[c], single)

    def test_dc_coefficient_is_scaled_block_mean(self):
        plane = np.full((8, 8), 100.0, np.float32)
        coeffs = np.asarray(dct2_blockwise(jnp.asarray(plane), 8, 8))
        assert abs(coeffs[0, 0] - 800.0) < 1e-3  # mean * N for orthonormal
        assert np.abs(coeffs).sum() - abs(coeffs[0, 0]) < 1e-3


class TestQuant:
    def test_round_half_away_from_zero(self):
        x = jnp.asarray([0.5, -0.5, 2.5, -2.5, 1.2, -1.2])
        np.testing.assert_array_equal(
            np.asarray(round_half_away(x)), [1, -1, 3, -3, 1, -1]
        )

    def test_quantize_matches_scalar_semantics(self):
        coeffs = jnp.asarray([637.0, -637.0, 319.9, 320.0])
        got = np.asarray(quantize(coeffs, jnp.float32(640)))
        np.testing.assert_array_equal(got, [640, -640, 0, 640])

    def test_step_one_identity_after_round(self):
        coeffs = jnp.asarray([1.4, -1.6, 0.5])
        got = np.asarray(quantize(coeffs, jnp.float32(1)))
        np.testing.assert_array_equal(got, [1, -2, 1])

    def test_block_quant_steps(self):
        types = jnp.asarray([[0, 3], [1, 0]], jnp.uint32)
        gazed = jnp.asarray([[False, False], [True, True]])
        steps = np.asarray(block_quant_steps(types, gazed, 2, 640))
        np.testing.assert_array_equal(steps, [[640, 2], [1, 1]])


class TestWireDctPallas:
    """The Pallas wire-DCT kernel (interpret mode on CPU) against the XLA
    formulation, and the row-paired MXU variant against the unpaired one
    (diag(W, W) interleaves exact zeros — results must be bit-identical)."""

    def _planes(self, shape=(3, 2, 32, 48)):
        rng = np.random.default_rng(11)
        return jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))

    def test_kernel_matches_xla_wire_layout(self):
        from svc_tpu.ops.dct import dct2_planes_to_wire
        from svc_tpu.ops.dct_pallas import dct2_planes_to_wire_pallas

        planes = self._planes()
        ref = dct2_planes_to_wire(planes, 8, 8)
        got = dct2_planes_to_wire_pallas(planes, 8, 8)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=0
        )

    def test_paired_bit_identical_to_unpaired(self):
        from svc_tpu.ops import dct_pallas

        planes = self._planes((3, 2, 32, 48))  # nby=4 -> paired (r=4)
        paired = dct_pallas.dct2_planes_to_wire_pallas(planes, 8, 8)
        assert dct_pallas._rows_per_step(4) % 2 == 0

        # force the unpaired kernel by monkeypatching the row count to an
        # odd divisor
        orig = dct_pallas._rows_per_step
        dct_pallas._rows_per_step = lambda nby, target=8: 1
        try:
            unpaired = dct_pallas.dct2_planes_to_wire_pallas(planes, 8, 8)
        finally:
            dct_pallas._rows_per_step = orig
        np.testing.assert_array_equal(np.asarray(paired), np.asarray(unpaired))

    def test_jsplit_bit_identical_to_spatial(self):
        """The j-split forward kernel (column-pitched subplane input with
        row-permuted stage-1 weights) must be BIT-identical to the spatial
        kernel: the permutation only reorders exact-zero products."""
        from svc_tpu.ops.dct_pallas import (
            dct2_jsplit_to_wire_pallas,
            dct2_planes_to_wire_pallas,
            pallas_wire_dct_jsplit_supported,
        )
        from svc_tpu.ops.interleave import deinterleave_rows_jsplit

        rng = np.random.default_rng(7)
        c, t, h, w = 3, 3, 64, 256  # nby=8 -> r=8 (paired), w%128==0
        frames = rng.integers(0, 256, (t, h, w, c), dtype=np.uint8)
        packed = jnp.asarray(frames.reshape(t, h, w * c))
        jp = deinterleave_rows_jsplit(packed, c, 8)  # (3, 8, t, h, nbx)
        # spatial planes from the same frames
        planes = jnp.asarray(frames.transpose(3, 0, 1, 2))
        assert pallas_wire_dct_jsplit_supported(c, h, w, 8, 8)
        ref = dct2_planes_to_wire_pallas(planes, 8, 8, frame_offset=1)
        got = dct2_jsplit_to_wire_pallas(jp, 8, 8, frame_offset=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_jsplit_pad_skip_bit_identical(self):
        """Unpadded input + padded_h: the kernel synthesizes the pad
        block rows' coefficients as exact zeros — bit-identical to
        running on explicitly zero-padded planes."""
        from svc_tpu.ops.dct_pallas import dct2_jsplit_to_wire_pallas
        from svc_tpu.ops.interleave import deinterleave_rows_jsplit

        rng = np.random.default_rng(8)
        c, t, h, ph, w = 3, 3, 56, 64, 256  # one 8-row pad block band
        frames = rng.integers(0, 256, (t, h, w, c), dtype=np.uint8)
        packed = jnp.asarray(frames.reshape(t, h, w * c))
        jp = deinterleave_rows_jsplit(packed, c, 8)  # (3, 8, t, h, nbx)
        ref = dct2_jsplit_to_wire_pallas(
            jnp.pad(jp, ((0, 0), (0, 0), (0, 0), (0, ph - h), (0, 0))),
            8, 8, frame_offset=1,
        )
        got = dct2_jsplit_to_wire_pallas(
            jp, 8, 8, frame_offset=1, padded_h=ph
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_encoder_jsplit_frontend_bit_identical(self):
        """End-to-end: an encoder on the j-split frontend (pitched
        de-interleave feeding the j-split DCT kernel, luma respatialized
        by a thin transpose) produces bit-identical outputs to the
        spatial-frontend encoder (keep_planes forces the classic path)."""
        from svc_tpu.config import EncoderConfig, VideoProperties
        from svc_tpu.models.encoder import Encoder

        t, h, w = 2, 64, 256
        cfg = EncoderConfig()
        props = VideoProperties(frame_w=w, frame_h=h, frame_count=t + 1)
        enc_j = Encoder(cfg, props, batch_size=t)
        enc_s = Encoder(cfg, props, batch_size=t, keep_planes=True)
        assert enc_j._use_jsplit and not enc_s._use_jsplit

        rng = np.random.default_rng(9)
        frames = rng.integers(0, 256, (t + 1, h, w, 3), dtype=np.uint8)
        out_j = enc_j.encode_batch(frames, 0)
        out_s = enc_s.encode_batch(frames, 0)
        for key in ("coeffs", "block_types", "mv_field", "cluster_labels"):
            np.testing.assert_array_equal(
                np.asarray(out_j[key]), np.asarray(out_s[key]), err_msg=key
            )


class TestWireIdctPallas:
    """The fused dequant + wire-IDCT kernel (interpret mode on CPU) must be
    bit-identical to the XLA decode path: quantize -> (C*n, C*n) stage dots
    -> pitch transpose (ops/dct.idct2_wire_to_planes_pitched)."""

    @pytest.mark.parametrize("t,nby,nbx", [(2, 16, 32), (1, 8, 24)])
    def test_bit_identical_vs_xla_path(self, t, nby, nbx):
        from svc_tpu.ops.dct import idct2_wire_to_planes_pitched
        from svc_tpu.ops.dct_pallas import (
            idct_wire_to_pitched_pallas,
            pallas_wire_idct_supported,
        )
        from svc_tpu.ops.quant import quantize

        c, bh, bw = 3, 8, 8
        rng = np.random.default_rng(nby + nbx)
        coeffs = (rng.normal(size=(t, nby, nbx, c * bh * bw)) * 120).astype(
            np.float32
        )
        steps = rng.choice([1.0, 640.0, 13.0], size=(t, nby, nbx)).astype(
            np.float32
        )
        assert pallas_wire_idct_supported(c, nby, nbx, bh, bw)
        got = idct_wire_to_pitched_pallas(
            jnp.asarray(coeffs), jnp.asarray(steps), c, bh, bw
        )
        ref = []
        for i in range(t):
            deq = quantize(
                jnp.asarray(coeffs[i]), jnp.asarray(steps[i])[:, :, None]
            )
            p, _ = idct2_wire_to_planes_pitched(deq, c, bh, bw)
            ref.append(np.asarray(p))
        np.testing.assert_array_equal(np.asarray(got), np.stack(ref))

    def test_gate(self):
        from svc_tpu.ops.dct_pallas import pallas_wire_idct_supported

        assert pallas_wire_idct_supported(3, 136, 240, 8, 8)  # 1080p
        assert pallas_wire_idct_supported(3, 272, 480, 8, 8)  # 4K
        assert not pallas_wire_idct_supported(3, 16, 4, 8, 8)  # narrow
