"""Layout-pin / persistent-cache poisoning regression tests.

The round-3 driver bench lost 3 of 4 matrix legs to one failure mode: a
layout-pinned executable loaded from a STALE persistent-cache entry (or
fed a device array with a different concrete tiling) fails every later
dispatch with ``INVALID_ARGUMENT: TPU backend error``. Two structural
defenses exist now, each pinned by a test here:

* ``runtime.cache`` versions the cache directory by (svc_tpu version,
  jax version) so an executable cached by a different build can never be
  loaded, and ``purge_cache`` recovers a live session;
* ``runtime.layouts.PinnedDispatch`` compiles ahead-of-time, reads the
  canonical input format from the executable itself, and normalizes any
  device-resident argument to it before dispatch.

On the CPU test platform concrete tilings are trivial, so the layout
tests exercise the full code path (AOT compile, canonical capture,
normalize, major-to-minor mismatch) rather than TPU tiling specifically;
the TPU-tiling variant of the same scenario is exercised manually on
hardware (see bench.py legs).
"""

import os

import jax
import numpy as np
import pytest

from svc_tpu.config import EncoderConfig, VideoProperties
from svc_tpu.models.encoder import Encoder
from svc_tpu.runtime import cache as cache_mod
from svc_tpu.runtime.layouts import PinnedDispatch, row_major_format


def test_cache_dir_is_versioned(tmp_path, monkeypatch):
    monkeypatch.delenv("SVC_TPU_COMPILE_CACHE", raising=False)
    import svc_tpu

    d = cache_mod.cache_dir()
    assert svc_tpu.__version__ in d
    assert jax.__version__ in d
    # a different build version can never resolve to the same directory
    monkeypatch.setattr(svc_tpu, "__version__", "999.0.0")
    assert cache_mod.cache_dir() != d


def test_purge_cache_removes_stale_entries(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    d.mkdir()
    (d / "stale_executable").write_bytes(b"poisoned")
    monkeypatch.setenv("SVC_TPU_COMPILE_CACHE", str(d))
    assert cache_mod.cache_dir() == str(d)
    cache_mod.purge_cache()
    assert os.path.isdir(d) and os.listdir(d) == []


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("SVC_TPU_COMPILE_CACHE", str(tmp_path))
    assert cache_mod.cache_dir() == str(tmp_path)


class TestPinnedDispatch:
    def _encoder(self):
        t, h, w = 2, 48, 64
        enc = Encoder(
            EncoderConfig(), VideoProperties(w, h, t + 1), batch_size=t
        )
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (t + 1, h, w * 3)).astype(np.uint8)
        return enc, frames, enc._keys(0, t)

    def test_every_input_source_dispatches(self):
        """Host array, staged array, and a wrong-layout device array all
        complete — and keep completing afterwards (no session poisoning).
        """
        enc, frames, keys = self._encoder()
        if not isinstance(enc._encode_batch, PinnedDispatch):
            pytest.skip("backend without layout pin support")

        ref = np.asarray(enc._encode_batch(frames, keys)["block_types"])

        staged = enc.stage_frames(frames)
        out = enc._encode_batch(staged, keys)
        np.testing.assert_array_equal(
            np.asarray(out["block_types"]), ref
        )

        # a device array committed with a DIFFERENT major-to-minor order
        # — the poisoning trigger — must be normalized, not dispatched raw
        try:
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            bad_fmt = Format(
                Layout(major_to_minor=(2, 1, 0)),
                SingleDeviceSharding(jax.devices()[0]),
            )
            bad = jax.device_put(frames, bad_fmt)
        except Exception:
            pytest.skip("backend cannot commit a non-default layout")
        out = enc._encode_batch(bad, keys)
        np.testing.assert_array_equal(
            np.asarray(out["block_types"]), ref
        )

        # the session still serves dispatches after the hazard inputs
        out = enc._encode_batch(staged, keys)
        np.testing.assert_array_equal(
            np.asarray(out["block_types"]), ref
        )

    def test_canonical_comes_from_executable(self):
        """The canonical format is read off the compiled executable, and
        staging matches it exactly (the copy-skip invariant)."""
        enc, frames, keys = self._encoder()
        if not isinstance(enc._encode_batch, PinnedDispatch):
            pytest.skip("backend without layout pin support")
        enc._encode_batch(frames, keys)
        canon = enc._encode_batch.canonical_format(0)
        assert canon is not None
        staged = enc.stage_frames(frames)
        assert staged.format == canon

    def test_stale_cache_dir_then_dispatch(self, tmp_path, monkeypatch):
        """A cache directory seeded with garbage entries must not break
        compilation or dispatch (JAX treats unreadable entries as
        misses; the versioned dir keeps real stale executables out)."""
        d = tmp_path / "jaxcache"
        d.mkdir()
        (d / "jit_encode_batch-deadbeef").write_bytes(b"\x00" * 64)
        monkeypatch.setenv("SVC_TPU_COMPILE_CACHE", str(d))
        cache_mod.enable_persistent_cache()
        try:
            enc, frames, keys = self._encoder()
            out = enc._encode_batch(frames, keys)
            assert np.asarray(out["block_types"]).shape[0] == 2
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
