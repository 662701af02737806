"""Profile the 1080p decode batch: per-HLO-op time attribution.

Decode counterpart of profile_encode.py: runs the jitted decoder batch
(gaze/region dequant -> wire-lane IDCT -> pitched resize -> interleave)
under ``jax.profiler.trace`` and prints the top ops by device self-time.

Usage: python benchmarks/profile_decode.py [trace_dir]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from profile_encode import report  # noqa: E402


def main():
    import jax

    from svc_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    from svc_tpu.config import DecoderConfig, EncoderConfig, VideoProperties
    from svc_tpu.models.decoder import Decoder
    from svc_tpu.models.encoder import Encoder

    import os
    geom = os.environ.get("SVC_PROFILE_GEOM", "16,1080,1920")
    t, h, w = (int(v) for v in geom.split(","))
    cfg = EncoderConfig()
    enc = Encoder(cfg, VideoProperties(w, h, t + 1), batch_size=t)
    dec = Decoder(DecoderConfig(), enc.header(), batch_size=t)

    hdr = enc.header()
    nby = hdr.padded_frame_h // cfg.transform_block_h
    nbx = hdr.padded_frame_w // cfg.transform_block_w
    payload = 3 * cfg.transform_block_h * cfg.transform_block_w
    rng = np.random.default_rng(1)
    dev = jax.devices()[0]
    # stage into the decoder's pinned layout: a bare device_put lands in
    # XLA's default (tiled) layout and every call pays a full relayout
    coeffs = dec.stage_coeffs(
        (rng.normal(size=(t, nby, nbx, payload)) * 50).astype(np.float32)
    )
    btypes = jax.device_put(
        rng.integers(0, 4, (t, nby, nbx)).astype(np.uint32), dev
    )
    rects = jax.device_put(
        np.tile(np.array([600, 400, 128, 128], np.int32), (t, 1)), dev
    )

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][0:1]))
        return out

    sync(dec._decode_batch(coeffs, btypes, rects))
    t0 = time.perf_counter()
    for _ in range(5):
        out = dec._decode_batch(coeffs, btypes, rects)
    sync(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"steady batch: {dt*1e3:.1f} ms  ({t/dt:.0f} fps)", file=sys.stderr)

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/svc_dec_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = dec._decode_batch(coeffs, btypes, rects)
        sync(out)

    meta = {}
    try:
        # the lower().compile() below is a SECOND full compile of the
        # program (several minutes under tunnel contention) — opt in
        import os

        if not os.environ.get("SVC_PROFILE_META"):
            raise RuntimeError("set SVC_PROFILE_META=1 for source mapping")
        import re

        txt = (
            getattr(dec, "_decode_jit", dec._decode_batch)
            .lower(
                jax.ShapeDtypeStruct(coeffs.shape, np.float32),
                jax.ShapeDtypeStruct(btypes.shape, np.uint32),
                jax.ShapeDtypeStruct(rects.shape, np.int32),
            )
            .compile()
            .as_text()
        )
        for m in re.finditer(
            r"%([\w.\-]+) = .*?op_name=\"([^\"]*)\""
            r"(?: source_file=\"([^\"]*)\" source_line=(\d+))?",
            txt,
        ):
            src = ""
            if m.group(3):
                src = f"{m.group(3).split('/')[-1]}:{m.group(4)}"
            meta[m.group(1)] = f"{m.group(2)} {src}"
    except Exception as e:
        print(f"(no HLO metadata: {e})", file=sys.stderr)

    report(trace_dir, meta)


if __name__ == "__main__":
    main()
