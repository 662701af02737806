"""Extended benchmark: 4K gaze-adaptive encode + decode on one chip.

BASELINE.json config 5 targets 4K gaze-adaptive encode/decode frame-batch
sharded over a v5e-8 slice; multi-chip hardware is not available here, so
this script measures the per-chip 4K pipeline (the sharded path is the
same per-device program — validated on the virtual CPU mesh by
tests/test_sharding.py and __graft_entry__.dryrun_multichip). Divide the
target by the measured per-chip fps to size a slice.

Run: python benchmarks/bench_4k.py   (on the TPU host)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from svc_tpu.config import DecoderConfig, EncoderConfig, VideoProperties
    from svc_tpu.models.decoder import Decoder
    from svc_tpu.models.encoder import Encoder

    t, h, w = 8, 2160, 3840
    cfg = EncoderConfig()
    enc = Encoder(cfg, VideoProperties(w, h, t + 1), batch_size=t)
    print(
        f"4K padded to {enc.padded_w}x{enc.padded_h}, "
        f"mv field {enc.mv_field_w}x{enc.mv_field_h}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    coarse = rng.integers(0, 256, ((h + 256) // 8, (w + 256) // 8))
    base = np.kron(coarse, np.ones((8, 8))).astype(np.float32)
    frames = np.stack(
        [
            np.repeat(
                base[2 * i : 2 * i + h, i : i + w, None], 3, -1
            ).astype(np.uint8)
            for i in range(t + 1)
        ]
    )

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))
        return x

    fdev = enc.stage_frames(frames.reshape(t + 1, h, w * 3))
    keys = enc._keys(0, t)

    out = sync(enc._encode_batch(fdev, keys))
    sync(enc._encode_batch(fdev, keys))
    # queued batches, ONE sync — the same pipelined-view methodology as
    # bench.py: the tunnel's ~33 ms D2H roundtrip is an environment
    # artifact paid per sync, not per batch, in any pipelined deployment
    # (syncing each batch was understating 4K throughput ~1.5x)
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc._encode_batch(fdev, keys)
    sync(out)
    enc_fps = iters * t / (time.perf_counter() - t0)

    dec = Decoder(DecoderConfig(), enc.header(), batch_size=t)
    ry = cfg.mv_block_h // cfg.transform_block_h
    rx = cfg.mv_block_w // cfg.transform_block_w
    btypes = jnp.repeat(
        jnp.repeat(out["block_types"], ry, axis=1), rx, axis=2
    )
    # gaze-adaptive: a 256x256 gaze rect wanders per frame
    rects = jax.device_put(
        np.stack(
            [
                np.array([800 + 40 * i, 600 + 20 * i, 256, 256], np.int32)
                for i in range(t)
            ]
        )
    )
    sync(dec._decode_batch(out["coeffs"], btypes, rects))
    t0 = time.perf_counter()
    for _ in range(iters):
        dout = dec._decode_batch(out["coeffs"], btypes, rects)
    sync(dout)
    dec_fps = iters * t / (time.perf_counter() - t0)

    print(
        f"4K encode: {enc_fps:.1f} fps/chip | 4K gaze decode: "
        f"{dec_fps:.1f} fps/chip | projected v5e-8 slice encode: "
        f"~{8 * enc_fps:.0f} fps"
    )


if __name__ == "__main__":
    main()
