"""Pallas kernel parity tests (interpret mode on CPU).

Production kernels (fused refine, wire-DCT, Lloyd, pyrDown) are verified
bit-exact against XLA counterparts here and in test_dct.py /
test_segmentation_ops.py; the golden suite (test_golden_reference.py)
additionally pins the refine kernels against the unmodified C++
reference. The dynamic-addressing candidate-SAD kernel stays gated off
on this toolchain (see ops/motion_pallas.py) but keeps its parity test.
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

    @pytest.mark.parametrize(
        "t,h,w", [(2, 64, 128), (1, 96, 160), (2, 136, 240)]
    )
    def test_mxu_variant_bit_exact(self, t, h, w):
        from svc_tpu.ops.pyramid_pallas import (
            pallas_pyr_mxu_supported,
            pyr_down_mxu_pallas,
        )

        assert pallas_pyr_mxu_supported(h, w)
        rng = np.random.default_rng(h + w + 1)
        imgs = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
        got = np.asarray(pyr_down_mxu_pallas(jnp.asarray(imgs)))
        ref = np.asarray(pyr_down(jnp.asarray(imgs)))
        np.testing.assert_array_equal(got, ref)

    def test_mxu_gate_vmem_bound(self):
        from svc_tpu.ops.pyramid_pallas import pallas_pyr_mxu_supported

        assert pallas_pyr_mxu_supported(1088, 1920)
        # 4K first reduction: the banded column tiling keeps the tile
        # matrices + input slab inside VMEM (the old full (3840, 1920)
        # bf16 filter matrix was 14.7 MB and forced a separate variant)
        assert pallas_pyr_mxu_supported(2176, 3840)

    def test_mxu_banded_columns_bit_exact(self):
        # a width whose half is NOT a multiple of the column tile and a
        # narrow tail tile: exercises the per-tile band matrices incl.
        # border folding on both edges
        from svc_tpu.ops.pyramid import pyr_down
        from svc_tpu.ops.pyramid_pallas import (
            pallas_pyr_mxu_supported,
            pyr_down_mxu_pallas,
        )

        rng = np.random.default_rng(11)
        imgs = rng.integers(0, 256, (2, 64, 1920)).astype(np.uint8)
        assert pallas_pyr_mxu_supported(64, 1920)
        got = np.asarray(pyr_down_mxu_pallas(jnp.asarray(imgs)))
        # CPU backend: pyr_down takes the XLA reference path
        ref = np.asarray(pyr_down(jnp.asarray(imgs)))
        np.testing.assert_array_equal(got, ref)


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


class TestTwoStageRefineKernel:
    """The two-stage coarse/fine select variant of the fused refine kernel
    must be bit-exact vs the linear-chain variant on the same inputs
    (interpret mode; both integer arithmetic throughout)."""

    @pytest.mark.parametrize("bound_in", [8, 14, 20])
    def test_two_stage_matches_linear(self, bound_in):
        import functools

        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from svc_tpu.ops import motion_pallas as mp

        assert mp._two_stage_ok(bound_in)
        r, bw, bh = 1, 8, 8
        fh, fw = 64, 1024  # mfw = 128
        rng = np.random.default_rng(bound_in)
        tracked = jnp.asarray(
            rng.integers(0, 256, (fh, fw), dtype=np.uint8)
        )
        anchor = jnp.asarray(
            rng.integers(0, 256, (fh, fw), dtype=np.uint8)
        )
        mfh, mfw = fh // bh, fw // bw
        mv = rng.integers(-bound_in // 2, bound_in // 2 + 1, (mfh, 1, mfw)) * 2
        mv_yx = jnp.asarray(
            np.stack([mv, np.roll(mv, 1, axis=0)], axis=1), jnp.int32
        )

        two = mp.refine_mads_pallas(
            tracked, anchor, mv_yx, r, bound_in, bw, bh
        )

        # force the linear kernel by monkeypatching the gate
        orig = mp._two_stage_ok
        mp._two_stage_ok = lambda b: False
        try:
            lin = mp.refine_mads_pallas(
                tracked, anchor, mv_yx, r, bound_in, bw, bh
            )
        finally:
            mp._two_stage_ok = orig
        np.testing.assert_array_equal(np.asarray(two), np.asarray(lin))


class TestResizeRowsPallas:
    """Fused row-resample kernel vs the XLA gather+lerp path. Same lerp
    expression; FMA contraction may differ, so the gate is 1e-4 absolute
    (the golden decoder gate is 2.5e-4)."""

    def test_gate_rejects_steep_downscale(self):
        from svc_tpu.ops.resize_pallas import rows_pallas_supported

        h, out_h = 136, 100  # shifts reach 36 — too deep for the unroll
        src = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        y0 = np.clip(np.floor(src).astype(np.int32), 0, h - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        f = (src - np.floor(src)).astype(np.float32)
        assert not rows_pallas_supported(y0, y1, f, h, 8 * 30)

    @pytest.mark.parametrize("out_h", [131, 126, 135])
    def test_matches_xla_rows(self, out_h):
        from svc_tpu.ops.resize_pallas import (
            resize_rows_pallas,
            rows_pallas_supported,
        )

        rng = np.random.default_rng(out_h)
        img = jnp.asarray(
            rng.normal(size=(3, 136, 8, 30)).astype(np.float32) * 60
        )
        h = img.shape[1]
        src = (np.arange(out_h) + 0.5) * h / out_h - 0.5
        y0 = np.floor(src).astype(np.int32)
        f = (src - y0).astype(np.float32)
        f = np.where(y0 < 0, 0, f)
        f = np.where(y0 >= h - 1, 0, f).astype(np.float32)
        y0 = np.clip(y0, 0, h - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        assert rows_pallas_supported(y0, y1, f, h, 8 * 30)
        got = np.asarray(resize_rows_pallas(img, y0, y1, f))
        a = np.asarray(img)
        exp = (
            a[:, y0] * (1 - f)[None, :, None, None]
            + a[:, y1] * f[None, :, None, None]
        )
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=0)
