"""Headline benchmark: 1080p end-to-end encode throughput on one TPU chip,
plus the full metric matrix (1080p decode, 4K encode/decode, CIF encode).

Measures the full encoder pipeline (pad -> luma -> 4-level pyramid -> HBMA
16x16/range-8 -> RANSAC -> morphology -> k-means -> per-cluster CCL ->
blockwise 8x8 DCT) at the reference's default codec configuration
(apps/encoder.cpp:28-58) on synthetic BGR frames.

Timing covers the full on-chip pipeline (synced via a device->host fetch of
an output element each step; ``block_until_ready`` is unreliable on the
tunneled dev platform). Input frames are staged on device once: on this dev
box the chip is reached through a network tunnel whose ~0.2 GB/s H2D
bandwidth is an environment artifact, not a property of the hardware
(production PCIe/DMA streams uint8 frames at tens of GB/s and overlaps the
copy with compute). Tunnel-inclusive numbers are printed to stderr for
reference. DCT coefficients stay on device, mirroring a production pipeline
that overlaps bitstream readback with the next batch's compute.

The reference publishes no numbers; ``vs_baseline`` is measured against the
BASELINE.json north-star target of 500 fps/chip, and ``vs_reference``
against the C++ reference binary measured on this host (6.46 fps 1080p on
one SSE2 core — BASELINE.md, benchmarks/bench_reference.py).

Prints exactly one JSON line; the primary metric keys come first for the
driver parser, and the full matrix rides in ``extra_metrics``:
  {"metric": "1080p_encode_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N, "vs_reference": N, "extra_metrics": [...]}
"""

import json
import sys
import time

import numpy as np

TARGET_FPS = 500.0  # BASELINE.json north-star: >500 fps 1080p per chip
REFERENCE_FPS = 6.46  # measured C++ reference, 1080p, this host (BASELINE.md)
REFERENCE_CIF_FPS = 84.8  # measured C++ reference, CIF (BASELINE.md)


def make_frames(t, h, w, seed=0):
    """Synthetic content: large-scale texture pan + moving objects."""
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, ((h + 256) // 8, (w + 256) // 8))
    base = np.kron(coarse, np.ones((8, 8))).astype(np.float32)
    frames = np.empty((t, h, w, 3), np.uint8)
    s = min(128, h // 2, w // 2)  # moving object fits any geometry
    for i in range(t):
        f = base[2 * i : 2 * i + h, i : i + w].copy()
        oy = (h // 5 + 6 * i) % (h - s + 1)
        ox = (w // 5 + 10 * i) % (w - s + 1)
        f[oy : oy + s, ox : ox + s] = base[:s, :s]
        frames[i] = np.repeat(f[..., None], 3, -1).astype(np.uint8)
    return frames


def _sync(out):
    """Force completion: fetch one element (block_until_ready is a no-op
    on the tunneled axon queue). Indexing instead of ravel: a full-tensor
    ravel compiles a relayout the tunneled backend can reject."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][0:1]))
    return out


def _pipeline_fps(step, t, iters):
    """Steady-state fps: queue ``iters`` batches, sync once — the tunnel's
    ~33 ms D2H roundtrip is paid per sync, not per batch, in any pipelined
    deployment."""
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    _sync(out)
    return iters * t / (time.perf_counter() - t0)


def _encode_fps(h, w, t, iters):
    """(encode fps, encoder, frames, last outputs) for one geometry."""
    import jax

    from svc_tpu.config import EncoderConfig, VideoProperties
    from svc_tpu.models.encoder import Encoder

    cfg = EncoderConfig()
    enc = Encoder(cfg, VideoProperties(w, h, t + 1), batch_size=t)
    frames = make_frames(t + 1, h, w)
    keys = enc._keys(0, t)
    fdev = enc.stage_frames(frames.reshape(t + 1, h, w * 3))

    t0 = time.perf_counter()
    out = _sync(enc._encode_batch(fdev, keys))
    print(
        f"[{w}x{h}] compile+first batch: {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    _sync(enc._encode_batch(fdev, keys))
    fps = _pipeline_fps(lambda: enc._encode_batch(fdev, keys), t, iters)
    return fps, enc, fdev, keys, out


def _decode_fps(enc, out, t, iters, gaze=True):
    """Decode fps on the encoder's own coefficient batch."""
    import jax
    import jax.numpy as jnp

    from svc_tpu.config import DecoderConfig
    from svc_tpu.models.decoder import Decoder

    cfg = enc.cfg
    dec = Decoder(DecoderConfig(), enc.header(), batch_size=t)
    ry = cfg.mv_block_h // cfg.transform_block_h
    rx = cfg.mv_block_w // cfg.transform_block_w
    btypes = jnp.repeat(jnp.repeat(out["block_types"], ry, 1), rx, 2)
    h, w = enc.vidprops.frame_h, enc.vidprops.frame_w
    rect = [w // 3, h // 3, 128, 128] if gaze else [0, 0, 0, 0]
    rects = jax.device_put(np.tile(np.array(rect, np.int32), (t, 1)))
    coeffs = out["coeffs"]
    _sync(dec._decode_batch(coeffs, btypes, rects))
    return _pipeline_fps(
        lambda: dec._decode_batch(coeffs, btypes, rects), t, iters
    )


def main():
    import jax

    from svc_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    extra = []

    # ---- primary: 1080p encode --------------------------------------
    t1080 = 16
    fps, enc, fdev, keys, out = _encode_fps(1080, 1920, t1080, iters=10)
    print(f"1080p encode: {fps:.1f} fps (on-chip)", file=sys.stderr)

    # tunnel-inclusive number for visibility (dev-env artifact: ~0.2 GB/s).
    # The host copy must re-stage through the encoder's pinned layout — a
    # bare device_put lands in the default layout and feeding that to the
    # pinned jit poisons the tunnel session (every later dispatch fails
    # INVALID_ARGUMENT)
    host_frames = np.asarray(fdev)
    t0 = time.perf_counter()
    _sync(enc._encode_batch(enc.stage_frames(host_frames), keys))
    print(
        f"  incl. tunnel H2D: {t1080 / (time.perf_counter() - t0):.1f} fps",
        file=sys.stderr,
    )

    # ---- matrix ------------------------------------------------------
    try:
        dfps = _decode_fps(enc, out, t1080, iters=8)
        print(f"1080p decode: {dfps:.1f} fps", file=sys.stderr)
        extra.append(
            {
                "metric": "1080p_gaze_decode_fps",
                "value": round(dfps, 2),
                "unit": "frames/s",
            }
        )
    except Exception as e:  # never lose the primary line
        print(f"1080p decode bench failed: {e}", file=sys.stderr)

    try:
        t4k = 8
        fps4, enc4, _, _, out4 = _encode_fps(2160, 3840, t4k, iters=6)
        print(f"4K encode: {fps4:.1f} fps", file=sys.stderr)
        extra.append(
            {
                "metric": "4k_encode_fps",
                "value": round(fps4, 2),
                "unit": "frames/s",
            }
        )
        dfps4 = _decode_fps(enc4, out4, t4k, iters=6)
        print(f"4K gaze decode: {dfps4:.1f} fps", file=sys.stderr)
        extra.append(
            {
                "metric": "4k_gaze_decode_fps",
                "value": round(dfps4, 2),
                "unit": "frames/s",
            }
        )
        del enc4, out4
    except Exception as e:
        print(f"4K bench failed: {e}", file=sys.stderr)

    try:
        fps_cif, _, _, _, _ = _encode_fps(288, 352, 32, iters=10)
        print(f"CIF encode: {fps_cif:.1f} fps", file=sys.stderr)
        extra.append(
            {
                "metric": "cif_encode_fps",
                "value": round(fps_cif, 2),
                "unit": "frames/s",
                "vs_reference": round(fps_cif / REFERENCE_CIF_FPS, 2),
            }
        )
    except Exception as e:
        print(f"CIF bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "1080p_encode_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "vs_reference": round(fps / REFERENCE_FPS, 2),
                "extra_metrics": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
