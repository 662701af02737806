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
    enc = Encoder(
        cfg, VideoProperties(64, 48, 4), batch_size=3, keep_planes=True
    )
    out_dir = str(tmp_path / "views")
    wrapped = VisualizingEncoder(enc, out_dir)
    chunks = list(wrapped.encode_video(iter(frames)))
    assert len(chunks) == 4  # header + 3 payloads
    dumped = sorted(os.listdir(out_dir))
    assert len(dumped) == 3
    assert dumped[0].startswith("frame_00000")


class TestArrows:
    """MV/GM arrow overlays (libs/draw.cpp:57-118 parity)."""

    def test_axis_aligned_arrow_pixels(self):
        from svc_tpu.visualize import draw_arrow

        img = np.zeros((20, 40, 3), np.uint8)
        draw_arrow(img, 2, 10, 22, 10, color=(1, 2, 3))
        # main segment
        assert (img[10, 2:23] == (1, 2, 3)).all()
        # two tip strokes leave the head both above and below the shaft
        assert img[:10, :].any() and img[11:, :].any()

    def test_zero_vector_is_a_dot(self):
        from svc_tpu.visualize import draw_arrow

        img = np.zeros((8, 8, 3), np.uint8)
        draw_arrow(img, 3, 4, 3, 4)
        hit = np.argwhere(img.any(-1))
        assert hit.shape[0] == 1 and tuple(hit[0]) == (4, 3)

    def test_motion_field_anchors_every_block(self):
        from svc_tpu.visualize import draw_motion_field

        mv = np.zeros((3, 4, 2), np.float32)
        img = np.zeros((24, 32, 3), np.uint8)
        draw_motion_field(img, mv, 8, 8)
        for fy in range(3):
            for fx in range(4):
                assert img[fy * 8, fx * 8].any()

    def test_global_motion_rounding_matches_c_round(self):
        from svc_tpu.visualize import draw_motion_vec_as_field

        # std::round(-0.5) == -1 (away from zero), unlike np.round
        img = np.zeros((8, 8, 3), np.uint8)
        draw_motion_vec_as_field(
            img, np.asarray([-0.5, 0.0], np.float32), 8, 8
        )
        assert img[0, 0].any()  # tip math ran; endpoint at x=-1 clipped

    def test_composite_has_arrow_color_in_mf_view(self):
        from svc_tpu.visualize import ARROW_COLOR, compose_views

        h = w = 32
        frame = np.zeros((h, w, 3), np.uint8)
        mv = np.full((4, 4, 2), 3.0, np.float32)
        gm = np.asarray([3.0, 1.0])
        fg = np.zeros((4, 4), bool)
        labels = np.full((4, 4), -1)
        btypes = np.zeros((4, 4), np.uint32)
        comp = compose_views(frame, mv, gm, fg, fg, labels, btypes)
        mf_view = comp[0:h, w:2 * w]
        gm_view = comp[0:h, 2 * w:3 * w]
        assert (mf_view == ARROW_COLOR).all(-1).any()
        assert (gm_view == ARROW_COLOR).all(-1).any()
