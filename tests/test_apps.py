"""CLI app tests: flag surface, error paths, end-to-end pipe, pipeline
cancellation — exercised in-process through ``main(argv)``."""

import io
import sys
import threading
import time

import numpy as np
import pytest

from svc_tpu.apps import decoder_app, encoder_app
from svc_tpu.io import bitstream as bs
from svc_tpu.metrics import psnr
from svc_tpu.runtime.pipeline import (
    BoundedQueue,
    CancelledError,
    CancelToken,
    pipeline_threads,
)

ENC_FLAGS = [
    "--mv-block-w", "8", "--mv-block-h", "8", "--mv-search-range", "4",
    "--pyr-lvl-count", "2", "--kmeans-cluster-count", "3",
    "--batch-size", "3", "--verbose", "0",
]


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    rng = np.random.default_rng(2)
    coarse = rng.integers(30, 220, (24, 28)).astype(np.float32)
    bg = np.kron(coarse, np.ones((4, 4)))
    frames = []
    for t in range(6):
        f = bg[8 + t : 56 + t, 4 + t : 68 + t].copy()
        f[10:22, 40:52] = 240
        frames.append(np.repeat(f[..., None], 3, -1).astype(np.uint8))
    path = tmp_path_factory.mktemp("clips") / "clip.npy"
    np.save(path, np.stack(frames))
    return str(path)


class TestEncoderApp:
    def test_unknown_flag(self, capsys):
        rc = encoder_app.main(["enc", "--bogus", "1", "x.npy"])
        assert rc == 1
        assert "unexpected option name" in capsys.readouterr().err

    def test_missing_video_path(self, capsys):
        rc = encoder_app.main(["enc"])
        assert rc == 1
        assert "missing video path" in capsys.readouterr().err

    def test_invalid_config_rejected(self, capsys, clip_path):
        rc = encoder_app.main(
            ["enc", "--mv-search-range", "4", clip_path]  # 4 // 8 == 0
        )
        assert rc == 1
        assert "validating configuration" in capsys.readouterr().err

    def test_missing_file(self, capsys):
        rc = encoder_app.main(["enc", "/nonexistent/clip.npy"])
        assert rc == 1

    def test_end_to_end_pipe(self, clip_path, tmp_path, capsys):
        svc = str(tmp_path / "out.svc")
        rc = encoder_app.main(["enc", *ENC_FLAGS, "--output", svc, clip_path])
        assert rc == 0

        out_npy = str(tmp_path / "dec.npy")
        rc = decoder_app.main(
            ["dec", "--background-quant-step", "1", "--input", svc,
             "--output", out_npy]
        )
        assert rc == 0
        orig = np.load(clip_path)[1:]
        dec = np.load(out_npy)
        assert psnr(orig, dec) > 45

    def test_resume_produces_identical_stream(self, clip_path, tmp_path):
        full = str(tmp_path / "full.svc")
        tail = str(tmp_path / "tail.svc")
        assert encoder_app.main(
            ["enc", *ENC_FLAGS, "--output", full, clip_path]) == 0
        assert encoder_app.main(
            ["enc", *ENC_FLAGS, "--start-frame", "2", "--no-header", "1",
             "--output", tail, clip_path]) == 0
        full_bytes = open(full, "rb").read()
        header = bs.Header.unpack(full_bytes)
        stitched = (
            full_bytes[: bs.frame_offset(header, 2)]
            + open(tail, "rb").read()
        )
        assert stitched == full_bytes

    def test_trace_output(self, clip_path, tmp_path):
        import json

        svc = str(tmp_path / "t.svc")
        tr = str(tmp_path / "trace.json")
        rc = encoder_app.main(
            ["enc", *ENC_FLAGS, "--trace", tr, "--output", svc, clip_path]
        )
        assert rc == 0
        stats = json.load(open(tr))["stats"]
        assert "device_dispatch" in stats and "serialize" in stats


class TestDecoderApp:
    def test_garbage_header(self, capsys, monkeypatch, tmp_path):
        bad = tmp_path / "bad.svc"
        bad.write_bytes(b"\xff" * 64)
        rc = decoder_app.main(["dec", "--input", str(bad)])
        assert rc == 1
        assert "invalid header" in capsys.readouterr().err

    def test_truncated_header(self, capsys, tmp_path):
        bad = tmp_path / "short.svc"
        bad.write_bytes(b"\x00" * 8)
        rc = decoder_app.main(["dec", "--input", str(bad)])
        assert rc == 1
        assert "failed to read header" in capsys.readouterr().err

    def test_unknown_flag(self, capsys):
        rc = decoder_app.main(["dec", "--nope", "1"])
        assert rc == 1
        assert "unexpected option name" in capsys.readouterr().err

    def test_start_and_max_frames(self, clip_path, tmp_path):
        svc = str(tmp_path / "s.svc")
        assert encoder_app.main(
            ["enc", *ENC_FLAGS, "--output", svc, clip_path]) == 0
        out = str(tmp_path / "mid.npy")
        rc = decoder_app.main(
            ["dec", "--background-quant-step", "1", "--input", svc,
             "--start-frame", "1", "--max-frames", "2", "--output", out]
        )
        assert rc == 0
        dec = np.load(out)
        assert dec.shape[0] == 2
        orig = np.load(clip_path)[2:4]
        assert psnr(orig, dec) > 45


class TestCancellation:
    def test_cancel_unblocks_producer(self):
        token = CancelToken()
        produced = []

        def producer(q: BoundedQueue):
            for i in range(1000):
                token.check()
                q.push(i)
                produced.append(i)

        def consumer(q: BoundedQueue):
            assert q.pop() == 0
            raise CancelledError()

        t0 = time.time()
        pipeline_threads(producer, consumer, capacity=2, cancel=token)
        assert time.time() - t0 < 5
        assert len(produced) < 1000  # stopped early
        assert token.cancelled

    def test_normal_completion_without_token(self):
        def producer(q):
            for i in range(5):
                q.push(i)

        seen = []

        def consumer(q):
            for item in q:
                seen.append(item)

        pipeline_threads(producer, consumer, capacity=2)
        assert seen == [0, 1, 2, 3, 4]

    def test_interruptible_wait(self):
        token = CancelToken()
        threading.Timer(0.05, token.cancel).start()
        assert token.wait(5.0)
        with pytest.raises(CancelledError):
            token.check()


def test_decoder_app_bad_gaze_is_clean_error(tmp_path):
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # a syntactically valid header so the app reaches gaze parsing
    from svc_tpu.io import bitstream

    hdr = bitstream.Header(
        frame_count=1, frame_w=32, frame_h=16, frame_excess_w=0,
        frame_excess_h=0, transform_block_w=8, transform_block_h=8,
        channel_count=3,
    )
    stream = hdr.pack() + b"\x00" * (hdr.blocks_per_frame * hdr.block_byte_count)
    proc = subprocess.run(
        [_sys.executable, "-m", "svc_tpu.apps.decoder_app",
         "--gaze", "100", "--output", str(tmp_path / "o.npy")],
        input=stream, capture_output=True, env=env, cwd=repo,
    )
    assert proc.returncode == 1
    assert b"bad --gaze" in proc.stderr
    assert b"Traceback" not in proc.stderr
