"""Wall-clock CLI benchmark on CIF: the full host-inclusive path.

bench.py measures on-chip pipeline throughput (its H2D leg rides a dev
tunnel that is an environment artifact); this bench instead times the
PRODUCT surfaces end to end — encoder CLI (container read, device encode,
native serialize, file write) and decoder CLI (reader thread, parse,
device decode, D2H fetch, file write) — with `time.perf_counter` around
the subprocesses, minus their measured startup/compile time (reported
separately). CIF frames are small enough that the tunnel H2D cost is
tolerable; on production hardware the same path runs without the tunnel.

Usage: python benchmarks/bench_cif_cli.py [n_frames]
Prints one JSON line with encode/decode wall fps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

from svc_tpu.io.video import write_raw_avi  # noqa: E402


def make_clip(n: int, w: int = 352, h: int = 288, seed: int = 0):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, ((h + 128) // 4, (w + 128) // 4))
    base = np.kron(coarse, np.ones((4, 4))).astype(np.uint8)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        p = i % 64  # pan loops inside the oversized base texture
        f = base[p : p + h, 2 * p : 2 * p + w].copy()
        x = 80 + 5 * (i % 40)  # bounce inside the frame
        f[60 : 60 + 48, x : x + 48] = base[:48, :48]
        frames[i] = np.repeat(f[..., None], 3, -1)
    return frames


def _run(cmd, **kw):
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, cwd=_REPO, **kw)
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_dir = "/tmp/svc_cif_cli"
    os.makedirs(out_dir, exist_ok=True)
    avi = os.path.join(out_dir, "cif.avi")
    svc = os.path.join(out_dir, "cif.svc")
    npy = os.path.join(out_dir, "cif_dec.npy")
    write_raw_avi(avi, make_clip(n))

    env = dict(os.environ)
    quiet = {"stderr": subprocess.DEVNULL}

    def encode():
        with open(svc, "wb") as f:
            return _run(
                [sys.executable, "-m", "svc_tpu.apps.encoder_app",
                 "--batch-size", "16", avi],
                stdout=f, env=env, **quiet,
            )

    def decode():
        return _run(
            [sys.executable, "-m", "svc_tpu.apps.decoder_app",
             "--batch-size", "16", "--input", svc, "--output", npy],
            env=env, **quiet,
        )

    # first run pays interpreter startup + compile; report steady wall
    enc_cold, dec_cold = encode(), decode()
    enc_warm, dec_warm = encode(), decode()

    payloads = n - 1
    print(
        json.dumps(
            {
                "clip": f"CIF 352x288, {n} frames",
                "encode_wall_fps": round(payloads / enc_warm, 1),
                "decode_wall_fps": round(payloads / dec_warm, 1),
                "encode_cold_s": round(enc_cold, 1),
                "decode_cold_s": round(dec_cold, 1),
                "stream_mb": round(os.path.getsize(svc) / 2**20, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
