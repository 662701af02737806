"""Frame-parallel sharded encoding over a device mesh.

Scale-out design (SURVEY.md §2.2/§2.3, BASELINE.json config 5): frames are
embarrassingly parallel given the previous frame — frame ``t`` depends on
``t-1`` only through the *input* pyramid (reference: libs/encoder.cpp:
661-663, the encoder just swaps pyramids). So a video shards across a TPU
slice as (tracked, anchor) pair stacks along a ``frames`` mesh axis with no
cross-device dependency in the hot path; the host materializes the one
overlap frame per chunk by building both views. Collectives (``psum`` over
ICI) are used only for stream-level statistics, never per block.

This replaces what a CUDA/MPI design would do with NCCL ranks: one
``shard_map`` over a ``Mesh``, XLA inserts the communication.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svc_tpu.config import EncoderConfig, VideoProperties
from svc_tpu.models.encoder import Encoder

FRAME_AXIS = "frames"


def make_frame_mesh(n_devices: Optional[int] = None,
                    devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the frame-batch axis.

    On a real slice the axis rides ICI; in tests it spans virtual CPU
    devices (``xla_force_host_platform_device_count``).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (FRAME_AXIS,))


class ShardedEncoder:
    """Encoder whose batch dimension is sharded across a mesh.

    The per-device program is exactly the single-chip pipeline on a local
    chunk of ``batch_per_device`` frame pairs; ``psum`` aggregates stream
    statistics (foreground block count, mean RANSAC RMSE) across the slice.
    """

    def __init__(
        self,
        cfg: EncoderConfig,
        vidprops: VideoProperties,
        mesh: Mesh,
        batch_per_device: int = 4,
    ):
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.batch_per_device = batch_per_device
        self.batch_size = self.n_devices * batch_per_device
        self.inner = Encoder(cfg, vidprops, batch_size=self.batch_size)

        pairs_fn = self.inner.encode_pairs

        def local_encode(tracked_pyr, anchor_planes, anchor_pyr, keys):
            out = pairs_fn(tracked_pyr, anchor_planes, anchor_pyr, keys)
            # cross-device stream statistics over ICI
            fg_count = jnp.sum(out["foreground_mask"])
            out["total_foreground_blocks"] = jax.lax.psum(
                fg_count, FRAME_AXIS
            )
            out["mean_ransac_rmse"] = jax.lax.pmean(
                jnp.mean(out["ransac_rmse"]), FRAME_AXIS
            )
            return out

        n_levels = cfg.pyr_lvl_count
        shard = P(FRAME_AXIS)
        plane_shard = P(None, FRAME_AXIS)  # (3, T, PH, PW): T is axis 1
        in_specs = (
            tuple([shard] * n_levels),  # tracked pyramid levels
            plane_shard,  # anchor channel planes
            tuple([shard] * n_levels),  # anchor pyramid levels
            shard,  # keys
        )
        out_specs = {
            "coeffs": shard,
            "block_types": shard,
            "mv_field": shard,
            "foreground_mask_raw": shard,
            "foreground_mask": shard,
            "cluster_labels": shard,
            "global_motion": shard,
            "ransac_rmse": shard,
            "padded_planes": plane_shard,
            "total_foreground_blocks": P(),  # replicated after psum
            "mean_ransac_rmse": P(),
        }

        self._sharded = jax.jit(
            jax.shard_map(
                local_encode,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )

    @property
    def cfg(self):
        return self.inner.cfg

    def header(self, frame_count=None):
        return self.inner.header(frame_count)

    def encode_video(self, frames, **kwargs):
        """Stream shard-encode a video: the single-chip streaming loop
        (models.encoder.stream_encode) over mesh-sharded batches. The
        bitstream is byte-identical to the single-chip encoder's — frames
        are data-parallel given the overlap frame, and the ordered host
        gather preserves the sequential wire contract
        (tests/test_sharding.py asserts CLI-level byte identity)."""
        from svc_tpu.models.encoder import stream_encode

        return stream_encode(self, frames, **kwargs)

    def encode_batch(self, frames_bgr: np.ndarray, first_anchor_index: int):
        """Encode ``(T+1, H, W, 3)`` uint8 frames, ``T = batch_size``.

        The tracked/anchor pair views duplicate each interior frame once —
        the per-chunk overlap frame of the sharding design.
        """
        t = frames_bgr.shape[0] - 1
        if t != self.batch_size:
            raise ValueError(
                f"sharded batch needs {self.batch_size}+1 frames, got {t}+1"
            )
        n, h, w, c = frames_bgr.shape
        packed = jnp.asarray(
            np.ascontiguousarray(frames_bgr).reshape(n, h, w * c)
        )
        planes, pyr = self.inner.preprocess(packed)
        tracked_pyr = tuple(lvl[:-1] for lvl in pyr)
        anchor_pyr = tuple(lvl[1:] for lvl in pyr)
        keys = self.inner._keys(first_anchor_index, t)

        sharding = NamedSharding(self.mesh, P(FRAME_AXIS))
        plane_sharding = NamedSharding(self.mesh, P(None, FRAME_AXIS))
        put = functools.partial(jax.device_put)
        tracked_pyr = tuple(put(x, sharding) for x in tracked_pyr)
        anchor_pyr = tuple(put(x, sharding) for x in anchor_pyr)
        anchors = put(planes[:, 1:], plane_sharding)
        keys = put(keys, sharding)

        return self._sharded(tracked_pyr, anchors, anchor_pyr, keys)
