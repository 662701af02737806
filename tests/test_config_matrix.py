"""Cross-configuration roundtrip matrix.

The reference exposes every codec parameter on the CLI; this matrix drives
the full encode -> wire -> decode path through non-default corners:
non-square MV and transform blocks, different pyramid depths, search
ranges, 8-connectivity, multiple RANSAC subset sizes, and frame sizes that
force padding.
"""

import numpy as np
import pytest

from svc_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    KMeansParams,
    RansacParams,
    VideoProperties,
    validate_encoder_config,
)
from svc_tpu.io import bitstream as bs
from svc_tpu.metrics import psnr
from svc_tpu.models.decoder import Decoder
from svc_tpu.models.encoder import Encoder


def _video(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(20, 236, (h // 2, w // 2)).astype(np.float32)
    base = np.kron(coarse, np.ones((4, 4)))
    frames = []
    for i in range(t):
        f = base[i : i + h, 2 * i : 2 * i + w].copy()
        f[h // 4 : h // 4 + 10, w // 2 : w // 2 + 10] = 250 - 3 * i
        frames.append(np.repeat(f[..., None], 3, -1).astype(np.uint8))
    return np.stack(frames)


CONFIGS = [
    # (description, EncoderConfig kwargs, frame w, frame h)
    (
        "nonsquare-mv-blocks",
        dict(mv_block_w=16, mv_block_h=8, mv_search_range=4,
             pyr_lvl_count=2, transform_block_w=8, transform_block_h=8),
        64, 48,
    ),
    (
        "nonsquare-transform",
        dict(mv_block_w=8, mv_block_h=8, mv_search_range=4,
             pyr_lvl_count=2, transform_block_w=4, transform_block_h=8),
        64, 48,
    ),
    (
        "single-level-ebma",
        dict(mv_block_w=8, mv_block_h=8, mv_search_range=2,
             pyr_lvl_count=1, transform_block_w=8, transform_block_h=8),
        48, 48,
    ),
    (
        "deep-pyramid-8conn",
        dict(mv_block_w=16, mv_block_h=16, mv_search_range=8,
             pyr_lvl_count=3, transform_block_w=8, transform_block_h=8,
             connected_components_connectivity=8),
        96, 64,
    ),
    (
        "ransac-subset4-padding",
        dict(mv_block_w=8, mv_block_h=8, mv_search_range=4,
             pyr_lvl_count=2,
             ransac=RansacParams(subset_sz=4, inlier_thresh=3.0,
                                 success_prob=0.99, inlier_ratio=0.5),
             transform_block_w=4, transform_block_h=4),
        50, 38,  # forces frame_excess
    ),
]


@pytest.mark.parametrize(
    "name,kwargs,w,h", CONFIGS, ids=[c[0] for c in CONFIGS]
)
def test_roundtrip_matrix(name, kwargs, w, h):
    kwargs = dict(kwargs)
    kwargs.setdefault("kmeans", KMeansParams(cluster_count=3))
    cfg = EncoderConfig(**kwargs)
    assert validate_encoder_config(cfg).ok

    frames = _video(5, h, w, seed=hash(name) % 1000)
    enc = Encoder(cfg, VideoProperties(w, h, 5), batch_size=2)
    chunks = list(enc.encode_video(iter(frames)))
    header = bs.Header.unpack(chunks[0])
    assert header.frame_count == 4
    for payload in chunks[1:]:
        assert len(payload) == header.frame_byte_count

    dec = Decoder(
        DecoderConfig(background_quant_step=1), header, batch_size=2
    )
    out = np.stack(list(dec.decode_frames(iter(chunks[1:]))))
    assert out.shape == frames[1:].shape

    if header.frame_excess_w or header.frame_excess_h:
        # replicated reference quirk: the padded reconstruction (zero bands
        # included) is resized onto the original size (libs/decoder.cpp:
        # 157-210) — compare against the same squeeze of the original
        import jax.numpy as jnp

        from svc_tpu.ops.pad import pad_frame
        from svc_tpu.ops.resize import resize_bilinear

        padded = pad_frame(
            jnp.asarray(frames[1:]).astype(jnp.float32),
            header.padded_frame_w,
            header.padded_frame_h,
        )
        expected = np.clip(
            np.round(np.asarray(resize_bilinear(padded, h, w))), 0, 255
        )
        assert psnr(out, expected) > 40
    else:
        assert psnr(out, frames[1:]) > 45


def test_quant_step_sweep():
    """PSNR must be monotonically non-increasing in the background step."""
    frames = _video(4, 48, 64, seed=9)
    cfg = EncoderConfig(
        mv_block_w=8, mv_block_h=8, mv_search_range=4, pyr_lvl_count=2,
        kmeans=KMeansParams(cluster_count=3),
    )
    enc = Encoder(cfg, VideoProperties(64, 48, 4), batch_size=3)
    chunks = list(enc.encode_video(iter(frames)))
    header = bs.Header.unpack(chunks[0])
    scores = []
    for step in (1, 16, 128, 640):
        dec = Decoder(
            DecoderConfig(background_quant_step=step,
                          foreground_quant_step=step),
            header, batch_size=3,
        )
        out = np.stack(list(dec.decode_frames(iter(chunks[1:]))))
        scores.append(psnr(out, frames[1:]))
    assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 45 and scores[-1] < scores[0]
