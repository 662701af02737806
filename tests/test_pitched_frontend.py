"""Pitched-luma motion frontend (round-4 perf work) bit-identity.

The j-split encoder frontend can feed the pyramid and the base-level
refine directly from the column-pitched luma subplanes — the spatial
luma plane never materializes (ops/pyramid_pallas.py pitched pyrDown,
ops/motion_pallas.py pitched cell builder). These tests pin the claim
that the optimization changes NOTHING observable: every kernel output
and the full encoder output must be bit-identical to the spatial path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from svc_tpu.config import EncoderConfig, VideoProperties
from svc_tpu.models.encoder import Encoder


def _pitched(spatial, tbw=8):
    return np.stack([spatial[..., j::tbw] for j in range(tbw)])


def test_pitched_pyrdown_bit_exact():
    from svc_tpu.ops.pyramid_pallas import (
        pallas_pyr_mxu_pitched_supported,
        pyr_down_mxu_pallas,
        pyr_down_mxu_pitched_pallas,
    )

    rng = np.random.default_rng(0)
    bw, t, h, nbx = 8, 3, 64, 32
    assert pallas_pyr_mxu_pitched_supported(bw, h, nbx * bw)
    spatial = rng.integers(0, 256, (t, h, nbx * bw)).astype(np.uint8)
    y8 = jnp.asarray(_pitched(spatial))
    a = np.asarray(pyr_down_mxu_pallas(jnp.asarray(spatial)))
    b = np.asarray(pyr_down_mxu_pitched_pallas(y8))
    np.testing.assert_array_equal(a, b)


def test_pitched_cells_match_spatial_q():
    from svc_tpu.ops.motion_pallas import stack_cells_from_pitched

    rng = np.random.default_rng(1)
    tbw, tp1, fh, fw = 8, 3, 64, 128
    bw = bh = 16
    r, bound_in = 1, 14
    spatial = rng.integers(0, 256, (tp1, fh, fw)).astype(np.uint8)
    pad = bound_in + r
    rowpad_b = -(-pad // bh)
    halo_b = -(-pad // bw)
    padded = np.pad(
        spatial,
        ((0, 0), (rowpad_b * bh,) * 2, (halo_b * bw,) * 2),
    )
    lanes = fw // bw + 2 * halo_b
    q_ref = np.swapaxes(
        padded.reshape(tp1, fh + 2 * rowpad_b * bh, lanes, bw), -1, -2
    )
    q = np.asarray(
        stack_cells_from_pitched(
            jnp.asarray(_pitched(spatial)), bw, r, bound_in, bh
        )
    )
    np.testing.assert_array_equal(q, q_ref)


def test_pitched_refine_bit_exact():
    from svc_tpu.ops.motion_pallas import (
        pitched_refine_supported,
        refine_mads_stack_pallas,
        refine_mads_stack_pitched_pallas,
    )

    rng = np.random.default_rng(2)
    tbw, tp1, fh, fw = 8, 3, 64, 128
    bw = bh = 16
    r, bound_in = 1, 14
    mfh, mfw = fh // bh, fw // bw
    assert pitched_refine_supported(tbw, mfh, mfw, bw, bh, r, bound_in)
    spatial = rng.integers(0, 256, (tp1, fh, fw)).astype(np.uint8)
    mv = (rng.integers(-7, 8, (tp1 - 1, mfh, 2, 1, mfw)) * 2).astype(
        np.int32
    )
    a = np.asarray(
        refine_mads_stack_pallas(
            jnp.asarray(spatial), jnp.asarray(mv), r, bound_in, bw, bh
        )
    )
    b = np.asarray(
        refine_mads_stack_pitched_pallas(
            jnp.asarray(_pitched(spatial)), jnp.asarray(mv),
            r, bound_in, bw, bh,
        )
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("h,w", [(96, 256)])
def test_encoder_pitched_frontend_bit_identity(h, w):
    """The full encoder batch with the pitched frontend equals the
    spatial frontend output for output — coefficients, block types,
    motion field, masks — bit for bit."""
    t = 3
    cfg = EncoderConfig()
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (t + 1, h, w * 3)).astype(np.uint8)

    enc = Encoder(cfg, VideoProperties(w, h, t + 1), batch_size=t)
    assert enc._use_jsplit
    # the pitched frontend is off by default (measured wash on v5e —
    # see Encoder.__init__); force it on to pin its bit-identity
    enc._use_pitched_motion = True
    keys = enc._keys(0, t)
    out_p = enc._encode_batch(frames, keys)

    enc_s = Encoder(cfg, VideoProperties(w, h, t + 1), batch_size=t)
    assert not enc_s._use_pitched_motion
    out_s = enc_s._encode_batch(frames, keys)

    for key in ("coeffs", "block_types", "mv_field", "foreground_mask"):
        np.testing.assert_array_equal(
            np.asarray(out_p[key]), np.asarray(out_s[key]), err_msg=key
        )
