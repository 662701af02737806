"""Visualizer tests: the seven-view composite and the dumping wrapper."""

import os

import numpy as np

from svc_tpu.config import EncoderConfig, KMeansParams, VideoProperties
from svc_tpu.models.encoder import Encoder
from svc_tpu.visualize import VisualizingEncoder, compose_views, flow_to_bgr


def test_flow_coloring_direction_sensitivity():
    mv = np.zeros((2, 2, 2), np.float32)
    mv[0, 0] = (5, 0)   # east
    mv[1, 1] = (-5, 0)  # west
    img = flow_to_bgr(mv)
    assert img.shape == (2, 2, 3)
    assert not np.array_equal(img[0, 0], img[1, 1])  # directions differ
    # zero motion renders unsaturated (white-ish)
    assert np.ptp(img[0, 1].astype(int)) <= 1


def test_compose_views_layout():
    h, w = 32, 48
    frame = np.random.default_rng(0).integers(0, 256, (h, w, 3)).astype(np.uint8)
    mv = np.zeros((4, 6, 2), np.float32)
    fg = np.zeros((4, 6), bool)
    fg[1, 2] = True
    labels = np.where(fg, 0, -1)
    btypes = np.where(fg, 2, 0).astype(np.uint32)
    views = compose_views(frame, mv, np.zeros(2), fg, fg, labels, btypes)
    assert views.shape == (3 * h, 3 * w, 3)
    # base view is the frame itself in the top-left tile (modulo the title
    # overlay on the top rows)
    np.testing.assert_array_equal(views[h // 2 : h, :w], frame[h // 2 :])
    # the FG mask tile marks block (1,2) white
    tile = views[h : 2 * h, :w]
    assert tile[12, 20, 0] == 255  # inside block (1,2)
    assert tile[28, 40, 0] == 0


def test_visualizing_encoder_dumps_per_frame(tmp_path):
    rng = np.random.default_rng(1)
    coarse = rng.integers(30, 220, (24, 28)).astype(np.float32)
    bg = np.kron(coarse, np.ones((4, 4)))
    frames = np.stack(
        [
            np.repeat(bg[8 + t : 56 + t, 4 + t : 68 + t, None], 3, -1).astype(
                np.uint8
            )
            for t in range(4)
        ]
    )
    cfg = EncoderConfig(
        mv_block_w=8, mv_block_h=8, mv_search_range=4, pyr_lvl_count=2,
        kmeans=KMeansParams(cluster_count=3),
    )
    enc = Encoder(cfg, VideoProperties(64, 48, 4), batch_size=3)
    out_dir = str(tmp_path / "views")
    wrapped = VisualizingEncoder(enc, out_dir)
    chunks = list(wrapped.encode_video(iter(frames)))
    assert len(chunks) == 4  # header + 3 payloads
    dumped = sorted(os.listdir(out_dir))
    assert len(dumped) == 3
    assert dumped[0].startswith("frame_00000")
