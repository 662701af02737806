"""Pallas kernel parity tests (interpret mode on CPU).

Two TPU kernels exist: the candidate-SAD search (ops/motion_pallas.py) and
the fused pyrDown (ops/pyramid_pallas.py). Both are verified bit-exact
against their XLA/NumPy counterparts here; on real hardware the pyramid
kernel is in the production path (the SAD kernel is gated behind the
toolchain's dynamic-addressing support — see module docstrings).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from svc_tpu.ops.motion_pallas import candidate_sads
from svc_tpu.ops.pyramid import pyr_down
from svc_tpu.ops.pyramid_pallas import pallas_pyr_supported, pyr_down_pallas


class TestPyrDownPallas:
    @pytest.mark.parametrize("t,h,w", [(2, 64, 128), (1, 96, 160), (3, 32, 64)])
    def test_bit_exact_vs_xla(self, t, h, w):
        rng = np.random.default_rng(h + w)
        imgs = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        got = np.asarray(pyr_down_pallas(jnp.asarray(imgs)))
        ref = np.asarray(pyr_down(jnp.asarray(imgs)))
        np.testing.assert_array_equal(got, ref)

    def test_supported_gate(self):
        assert pallas_pyr_supported(1088, 1920)
        assert pallas_pyr_supported(288, 352)
        assert not pallas_pyr_supported(33, 64)  # odd height


class TestStaticRefinePallas:
    def test_bit_exact_vs_reference_computation(self):
        from svc_tpu.ops.motion_pallas import refine_sads_static

        rng = np.random.default_rng(3)
        t, h, w, bw, bh, r, bound = 2, 64, 512, 16, 16, 1, 14
        tracked = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        anchor = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        mfh, mfw = h // bh, w // bw
        mv = (rng.integers(-7, 8, (t, mfh, mfw, 2)) * 2).astype(np.int32)

        out = np.asarray(
            refine_sads_static(
                jnp.asarray(tracked), jnp.asarray(anchor), jnp.asarray(mv),
                r, bw, bh, bound,
            )
        )
        pad = bound + r
        side = 2 * r + 1
        tp = np.pad(tracked, ((0, 0), (pad, pad), (pad, pad)))
        for t_ in range(t):
            for i in range(0, mfh, 3):
                for j in range(0, mfw, 7):
                    my, mx = mv[t_, i, j, 1], mv[t_, i, j, 0]
                    a = anchor[
                        t_, i * bh : (i + 1) * bh, j * bw : (j + 1) * bw
                    ].astype(np.int64)
                    for oy in range(-r, r + 1):
                        for ox in range(-r, r + 1):
                            ty = i * bh + my + oy + pad
                            tx = j * bw + mx + ox + pad
                            cand = tp[
                                t_, ty : ty + bh, tx : tx + bw
                            ].astype(np.int64)
                            ref = np.abs(cand - a).sum()
                            got = out[t_, (oy + r) * side + (ox + r), i, j]
                            assert got == ref


class TestCandidateSadsPallas:
    def test_bit_exact_vs_reference_computation(self):
        rng = np.random.default_rng(0)
        t, h, w, bw, bh, r, bound = 2, 32, 256, 16, 16, 1, 3
        tracked = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        anchor = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        mfh, mfw = h // bh, w // bw
        mv = rng.integers(-bound, bound + 1, (t, mfh, mfw, 2)).astype(np.int32)

        out = np.asarray(
            candidate_sads(
                jnp.asarray(tracked), jnp.asarray(anchor), jnp.asarray(mv),
                r, bw, bh, bound,
            )
        )

        pad = bound + r
        tp = np.pad(tracked, ((0, 0), (pad, pad), (pad, pad)))
        side = 2 * r + 1
        for t_ in range(t):
            for i in range(mfh):
                for j in range(mfw):
                    my, mx = mv[t_, i, j, 1], mv[t_, i, j, 0]
                    a = anchor[
                        t_, i * bh : (i + 1) * bh, j * bw : (j + 1) * bw
                    ].astype(np.int64)
                    for oy in range(-r, r + 1):
                        for ox in range(-r, r + 1):
                            ty = i * bh + my + oy + pad
                            tx = j * bw + mx + ox + pad
                            cand = tp[t_, ty : ty + bh, tx : tx + bw].astype(
                                np.int64
                            )
                            ref = np.abs(cand - a).sum()
                            got = out[
                                t_, (oy + r) * side + (ox + r), i, j
                            ]
                            assert got == ref
