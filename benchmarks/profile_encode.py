"""Profile the 1080p encode batch: per-HLO-op time attribution.

Runs the jitted encoder batch under ``jax.profiler.trace`` and prints the
top ops by self-time from the trace's op-profile, so perf work targets the
measured bottlenecks rather than wall-clock guesses (the shared dev chip
varies 1.5x run to run; HLO self-times are stable).

Usage: python benchmarks/profile_encode.py [trace_dir]
"""

import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from svc_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    from svc_tpu.config import EncoderConfig, VideoProperties
    from svc_tpu.models.encoder import Encoder

    sys.path.insert(0, "/root/repo")
    from bench import make_frames

    import os

    # geometry override: SVC_PROFILE_GEOM=T,H,W (e.g. 8,2160,3840 for 4K)
    geom = os.environ.get("SVC_PROFILE_GEOM", "16,1080,1920")
    t, h, w = (int(v) for v in geom.split(","))
    cfg = EncoderConfig()
    props = VideoProperties(frame_w=w, frame_h=h, frame_count=t + 1)
    enc = Encoder(cfg, props, batch_size=t)

    frames = make_frames(t + 1, h, w)
    keys = enc._keys(0, t)
    packed = jnp_packed = np.ascontiguousarray(frames).reshape(t + 1, h, w * 3)
    x = enc.stage_frames(jnp_packed)  # pinned layout, no per-call relayout

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))
        return out

    # warm up / compile
    sync(enc._encode_batch(x, keys))
    t0 = time.perf_counter()
    for _ in range(5):
        out = enc._encode_batch(x, keys)
    sync(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"steady batch: {dt*1e3:.1f} ms  ({t/dt:.0f} fps)", file=sys.stderr)

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/svc_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = enc._encode_batch(x, keys)
        sync(out)

    # op-name -> source metadata from the same compiled executable
    meta = {}
    try:
        # the lower().compile() below is a SECOND full compile of the
        # program (several minutes under tunnel contention) — opt in
        import os

        if not os.environ.get("SVC_PROFILE_META"):
            raise RuntimeError("set SVC_PROFILE_META=1 for source mapping")
        # reuse the Encoder's already-compiled jit (a fresh jax.jit here
        # would retrace and recompile the whole encode program)
        txt = (
            getattr(enc, "_encode_jit", enc._encode_batch)
            .lower(jax.ShapeDtypeStruct(packed.shape, np.uint8), keys)
            .compile()
            .as_text()
        )
        import re

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


def report(trace_dir, meta=None):
    """Summarize device op self-times from the .trace.json.gz event dump."""
    paths = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace files found under", trace_dir, file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid names containing "TPU" / XLA Ops
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_time = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in lane:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        op_time[name] = op_time.get(name, 0.0) + dur
        total += dur
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:40]
    print(f"total device op time: {total:.1f} ms over trace")
    meta = meta or {}
    for name, ms in top:
        extra = meta.get(name, "")
        print(f"{ms:8.2f} ms  {100*ms/total:5.1f}%  {name}  {extra}")


if __name__ == "__main__":
    main()
