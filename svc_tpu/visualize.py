"""Encoder observability: per-stage visualization dumps.

The reference ships an ``encoder-visualizer`` build flavor that renders a
3x3 window of seven pipeline views per frame — base frame, motion field,
global motion, foreground mask, mask after morphology, foreground clusters,
foreground regions (reference: libs/encoder.cpp:383-445 and the
``#ifdef VISUALIZE`` blocks; overlays in libs/draw.cpp). There is no file
output in the reference; this visualizer is headless-first and writes one
composite image per frame (PNG when OpenCV is importable, ``.npy``
otherwise).

Overlay styling is intentionally simpler than the reference's arrow
rendering: motion is shown with flow-coloring (hue = direction,
saturation = magnitude), clusters/regions with the same 36-color visually
distinct palette idea (libs/draw.cpp:34-54).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# 36 visually distinct BGR colors (same palette family the reference uses,
# libs/draw.cpp:35-54)
_PALETTE = np.array(
    [
        (169, 169, 169), (79, 79, 47), (47, 107, 85), (34, 139, 34),
        (0, 0, 128), (0, 128, 128), (139, 61, 72), (139, 139, 0),
        (128, 0, 0), (50, 205, 154), (127, 0, 127), (143, 188, 143),
        (96, 48, 176), (0, 69, 255), (0, 165, 255), (0, 255, 255),
        (0, 255, 127), (211, 0, 148), (127, 255, 0), (60, 20, 220),
        (255, 255, 0), (255, 191, 0), (96, 164, 244), (255, 0, 0),
        (255, 0, 255), (140, 230, 240), (114, 128, 250), (237, 149, 100),
        (221, 160, 221), (144, 238, 144), (147, 20, 255), (238, 104, 123),
        (238, 238, 175), (238, 130, 238), (196, 228, 255), (193, 182, 255),
    ],
    dtype=np.uint8,
)


def flow_to_bgr(mv: np.ndarray, max_mag: Optional[float] = None) -> np.ndarray:
    """Color-code a ``(h, w, 2)`` motion field: hue=direction, sat=magnitude."""
    x, y = mv[..., 0], mv[..., 1]
    mag = np.sqrt(x * x + y * y)
    ang = (np.arctan2(y, x) + np.pi) / (2 * np.pi)  # 0..1
    m = max_mag or max(float(mag.max()), 1e-6)
    s = np.clip(mag / m, 0, 1)
    h6 = ang * 6.0
    i = np.floor(h6).astype(int) % 6
    f = h6 - np.floor(h6)
    v = np.ones_like(s)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    i = i[..., None]  # broadcast against the channel axis
    rgb = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            np.stack([v, t, p], -1), np.stack([q, v, p], -1),
            np.stack([p, v, t], -1), np.stack([p, q, v], -1),
            np.stack([t, p, v], -1), np.stack([v, p, q], -1),
        ],
    )
    return (rgb[..., ::-1] * 255).astype(np.uint8)  # BGR


def tint_labels(base_bgr: np.ndarray, labels: np.ndarray,
                first_id: int = 1) -> np.ndarray:
    """Tint labeled cells with the palette (labels at MV-grid resolution are
    upscaled by plain repetition, like the reference's per-block tint fills,
    libs/draw.cpp:118-141)."""
    h, w = base_bgr.shape[:2]
    lh, lw = labels.shape
    up = np.repeat(np.repeat(labels, h // lh, 0), w // lw, 1)
    colored = _PALETTE[(up - first_id) % len(_PALETTE)]
    mask = (up >= first_id)[..., None]
    return np.where(mask, (0.5 * base_bgr + 0.5 * colored).astype(np.uint8),
                    base_bgr)


def upscale_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    u = np.repeat(np.repeat(mask, h // mask.shape[0], 0), w // mask.shape[1], 1)
    return (u.astype(np.uint8) * 255)[..., None].repeat(3, -1)


_VIEW_TITLES = (
    "Base", "Motion Field (MF)", "Global Motion (GM)",
    "Foreground (FG) Mask", "FG Mask After Morph", "FG Clusters",
    "FG Regions",
)


def _draw_titles(views: np.ndarray, h: int, w: int) -> np.ndarray:
    """Outlined view titles like the reference's ``DrawViewTitle``
    (libs/encoder.cpp:284-293, libs/draw.cpp:143-158); needs OpenCV for
    text rasterization, silently skipped otherwise."""
    try:
        import cv2  # type: ignore
    except ImportError:
        return views
    scale = max(min(w, h) / 640.0, 0.35)
    origin_scale = 2 * scale
    for idx, title in enumerate(_VIEW_TITLES):
        oy, ox = divmod(idx, 3)
        pos = (
            ox * w + int(round(8 * origin_scale)),
            oy * h + int(round(16 * origin_scale)),
        )
        for color, thick in (((0, 0, 0), 3), ((255, 255, 255), 1)):
            cv2.putText(
                views, title, pos, cv2.FONT_HERSHEY_COMPLEX, scale, color,
                max(int(thick * scale), 1), cv2.LINE_AA,
            )
    return views


def compose_views(frame_bgr, mv, gm, fg_raw, fg, labels, btypes) -> np.ndarray:
    """Build the 3x3 composite of the reference's seven views
    (libs/encoder.cpp:398-416)."""
    h, w = frame_bgr.shape[:2]
    views = np.zeros((3 * h, 3 * w, 3), np.uint8)

    mf_color = np.repeat(
        np.repeat(flow_to_bgr(mv), h // mv.shape[0], 0), w // mv.shape[1], 1
    )
    gm_field = np.broadcast_to(np.asarray(gm, np.float32), mv.shape)
    gm_color = np.repeat(
        np.repeat(flow_to_bgr(gm_field), h // mv.shape[0], 0),
        w // mv.shape[1], 1,
    )

    views[0:h, 0:w] = frame_bgr                                   # Base
    views[0:h, w:2 * w] = (0.5 * frame_bgr + 0.5 * mf_color)      # MF
    views[0:h, 2 * w:] = (0.5 * frame_bgr + 0.5 * gm_color)       # GM
    views[h:2 * h, 0:w] = upscale_mask(fg_raw, h, w)              # FG mask
    views[h:2 * h, w:2 * w] = upscale_mask(fg, h, w)              # post-morph
    views[h:2 * h, 2 * w:] = tint_labels(frame_bgr, labels, 0)    # clusters
    views[2 * h:, 0:w] = tint_labels(frame_bgr, btypes.astype(np.int64), 1)
    return _draw_titles(views, h, w)


class VisualizingEncoder:
    """Wraps an ``Encoder`` and dumps per-frame composites to a directory —
    the TPU framework's equivalent of the encoder-visualizer flavor."""

    def __init__(self, encoder, out_dir: str):
        self.encoder = encoder
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        try:
            import cv2  # type: ignore

            self._imwrite = lambda p, img: cv2.imwrite(p + ".png", img)
        except ImportError:
            self._imwrite = lambda p, img: np.save(p + ".npy", img)

    def encode_video(self, frames, on_batch=None, **kwargs):
        def dump(first_index, out, n_valid):
            # (3, T, PH, PW) channel planes -> (T, PH, PW, 3) BGR images
            frames_np = np.moveaxis(np.asarray(out["padded_planes"]), 0, -1)
            mv = np.asarray(out["mv_field"])
            gm = np.asarray(out["global_motion"])
            fg_raw = np.asarray(out["foreground_mask_raw"])
            fg = np.asarray(out["foreground_mask"])
            labels = np.asarray(out["cluster_labels"])
            btypes = np.asarray(out["block_types"])
            for i in range(n_valid):
                composite = compose_views(
                    frames_np[i], mv[i], gm[i], fg_raw[i], fg[i],
                    labels[i], btypes[i],
                )
                self._imwrite(
                    os.path.join(
                        self.out_dir, f"frame_{first_index + i:05d}"
                    ),
                    composite,
                )
            if on_batch is not None:
                on_batch(first_index, out, n_valid)

        yield from self.encoder.encode_video(frames, on_batch=dump, **kwargs)
