"""Video container IO (svc_tpu/io/video.py).

The raw BI_RGB AVI path is the lossless interchange format with the
reference binary (its cv::VideoCapture, apps/encoder.cpp:192, decodes
BI_RGB without colorspace conversion), so its round trip must be bit-exact
both through our own reader and through OpenCV/FFmpeg.
"""

import os

import numpy as np
import pytest

from svc_tpu.io.video import (
    VideoReader,
    write_npy_video,
    write_raw_avi,
    write_y4m_video,
)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


@pytest.fixture
def frames():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, (5, 48, 64, 3), dtype=np.uint8)


class TestRawAvi:
    def test_roundtrip_bit_exact(self, frames, tmp_path):
        path = str(tmp_path / "clip.avi")
        write_raw_avi(path, frames)
        rd = VideoReader(path)
        assert rd.props.frame_w == 64
        assert rd.props.frame_h == 48
        assert rd.props.frame_count == 5
        assert np.array_equal(np.stack(list(rd)), frames)

    def test_odd_width_row_padding(self, tmp_path):
        rng = np.random.default_rng(3)
        fr = rng.integers(0, 256, (2, 7, 10, 3), dtype=np.uint8)
        path = str(tmp_path / "odd.avi")
        write_raw_avi(path, fr)  # stride 30 -> padded to 32
        assert np.array_equal(np.stack(list(VideoReader(path))), fr)

    @pytest.mark.skipif(not _HAS_CV2, reason="cv2 unavailable")
    def test_opencv_decodes_bit_exact(self, frames, tmp_path):
        path = str(tmp_path / "clip.avi")
        write_raw_avi(path, frames)
        vc = cv2.VideoCapture(path)
        got = []
        while True:
            ok, f = vc.read()
            if not ok:
                break
            got.append(f)
        vc.release()
        assert np.array_equal(np.stack(got), frames)


class TestOtherContainers:
    def test_npy_roundtrip(self, frames, tmp_path):
        path = str(tmp_path / "clip.npy")
        write_npy_video(path, frames)
        assert np.array_equal(np.stack(list(VideoReader(path))), frames)

    def test_y4m_roundtrip_tight(self, frames, tmp_path):
        path = str(tmp_path / "clip.y4m")
        write_y4m_video(path, frames)
        got = np.stack(list(VideoReader(path)))
        # writer and reader use exact-inverse full-range BT.601 YCbCr
        # scales, so the round trip loses only quantization (two float
        # roundings per sample); saturated corners may clip a bit more
        assert got.shape == frames.shape
        err = np.abs(got.astype(int) - frames.astype(int))
        assert err.mean() < 1.5
        assert err.max() <= 4


class TestFfmpegPipeReader:
    """The OpenCV-free arbitrary-container path: VideoReader falls back
    to an ffmpeg rawvideo pipe when cv2 is unavailable. The real binary
    is absent on this box, so the pipe protocol is exercised against
    stub ffmpeg/ffprobe executables that speak the same contract
    (ffprobe JSON geometry + bgr24 rawvideo on stdout)."""

    def _stub_tools(self, tmp_path, frames):
        raw = tmp_path / "frames.raw"
        raw.write_bytes(frames.tobytes())
        t, h, w, _ = frames.shape
        ffprobe = tmp_path / "ffprobe"
        ffprobe.write_text(
            "#!/bin/sh\n"
            f"echo '{{\"streams\": [{{\"width\": {w}, \"height\": {h}, "
            f"\"nb_read_packets\": \"{t}\"}}]}}'\n"
        )
        ffmpeg = tmp_path / "ffmpeg"
        ffmpeg.write_text(f"#!/bin/sh\ncat {raw}\n")
        for p in (ffprobe, ffmpeg):
            p.chmod(0o755)
        return str(tmp_path)

    def test_pipe_reader_streams_frames(self, frames, tmp_path, monkeypatch):
        import svc_tpu.io.video as video

        monkeypatch.setenv(
            "PATH", self._stub_tools(tmp_path, frames)
            + os.pathsep + os.environ["PATH"]
        )
        monkeypatch.setattr(video, "_HAS_CV2", False)
        assert video.ffmpeg_available()
        reader = video.VideoReader(str(tmp_path / "clip.mkv"))
        assert reader.props.frame_w == frames.shape[2]
        assert reader.props.frame_h == frames.shape[1]
        assert reader.props.frame_count == frames.shape[0]
        got = np.stack(list(reader))
        reader.close()
        np.testing.assert_array_equal(got, frames)

    def test_no_cv2_no_ffmpeg_error(self, tmp_path, monkeypatch):
        import svc_tpu.io.video as video

        monkeypatch.setattr(video, "_HAS_CV2", False)
        monkeypatch.setattr(video, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="neither OpenCV"):
            video.VideoReader(str(tmp_path / "clip.mkv"))

    def test_midstream_decode_failure_raises(
        self, frames, tmp_path, monkeypatch
    ):
        """A corrupt container (ffmpeg exits nonzero mid-stream) must
        raise, not silently truncate the encode (a decode failure used to
        be indistinguishable from normal EOS)."""
        import svc_tpu.io.video as video

        path = self._stub_tools(tmp_path, frames)
        t, h, w, _ = frames.shape
        nbytes = (t - 1) * h * w * 3  # one frame short, then die
        (tmp_path / "ffmpeg").write_text(
            "#!/bin/sh\n"
            f"head -c {nbytes} {tmp_path}/frames.raw\n"
            "echo 'moov atom not found' >&2\n"
            "exit 1\n"
        )
        monkeypatch.setenv("PATH", path + os.pathsep + os.environ["PATH"])
        monkeypatch.setattr(video, "_HAS_CV2", False)
        reader = video.VideoReader(str(tmp_path / "clip.mkv"))
        with pytest.raises(RuntimeError, match="moov atom"):
            list(reader)
        reader.close()

    def test_short_clean_stream_warns(self, frames, tmp_path, monkeypatch):
        """ffmpeg exiting 0 after fewer frames than the container
        advertises is a warning (header reconciliation handles it), not
        an error."""
        import svc_tpu.io.video as video

        path = self._stub_tools(tmp_path, frames)
        t, h, w, _ = frames.shape
        nbytes = (t - 1) * h * w * 3
        (tmp_path / "ffmpeg").write_text(
            f"#!/bin/sh\nhead -c {nbytes} {tmp_path}/frames.raw\n"
        )
        monkeypatch.setenv("PATH", path + os.pathsep + os.environ["PATH"])
        monkeypatch.setattr(video, "_HAS_CV2", False)
        reader = video.VideoReader(str(tmp_path / "clip.mkv"))
        with pytest.warns(RuntimeWarning, match="advertised"):
            got = list(reader)
        assert len(got) == t - 1
        reader.close()
