"""Connected-component labeling on the MV grid, on-device.

Replaces the encoder's per-cluster ``cv::connectedComponents`` call
(reference: libs/encoder.cpp:597-623) with iterative min-label propagation —
a good fit for the MV grid's size (<= a few thousand cells at 1080p/16px;
libs/encoder.cpp:174-177).

Algorithm: every masked cell starts with its linear raster index; each sweep
replaces a cell's label by the minimum over itself and its masked neighbors
(4- or 8-connectivity, libs/encoder.cpp:96-101 validates connectivity in
{4, 8}). Pointer-jumping (``label = label[label]``) after each sweep gives
logarithmic convergence. Labels are then canonicalized to 1..n in raster
order of each component's first pixel — the numbering OpenCV's default
algorithms produce — with 0 = background, so downstream block-type IDs
match the reference's layout (libs/encoder.cpp:608-622).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("connectivity",))
def connected_components_batched(
    masks: jnp.ndarray, connectivity: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label connected regions of a bool ``(B, H, W)`` mask batch.

    All masks propagate under ONE ``while_loop`` (min-label propagation with
    pointer jumping, so path lengths halve each sweep) — the batch dimension
    is how this stays TPU-shaped: the encoder labels every k-means cluster
    of every frame in a batch at once instead of looping small grids.

    Returns ``(labels, counts)``: labels int32, 0 = background, 1..n per
    mask in raster order of each component's first pixel; ``counts = n + 1``
    including the background label, matching ``cv::connectedComponents``'s
    return value (the encoder advances its block-type offset by it,
    libs/encoder.cpp:609-622).
    """
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    b, h, w = masks.shape
    n = h * w
    # int16 labels halve propagation traffic on codec-scale grids
    # (1080p/16px = 8160 cells); int32 for anything larger
    ldtype = jnp.int16 if n < 32767 else jnp.int32
    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=ldtype).reshape(1, h, w), (b, h, w)
    )
    big = jnp.array(n, ldtype)  # sentinel for background / out of mask
    labels = jnp.where(masks, idx, big)

    # propagation runs on the flattened (B, n) layout: the grid's width is
    # narrower than a vector register, so flat rows pack the lanes fully;
    # grid neighbors become fixed lane offsets with row-boundary masks
    labels = labels.reshape(b, n)
    masks_flat = masks.reshape(b, n)
    col = jnp.arange(n, dtype=jnp.int32) % w
    not_left = (col != 0)[None, :]
    not_right = (col != w - 1)[None, :]

    if connectivity == 4:
        shifts = ((w, None), (-w, None),
                  (1, not_left), (-1, not_right))
    else:
        shifts = (
            (w, None), (-w, None), (1, not_left), (-1, not_right),
            (w + 1, not_left), (w - 1, not_right),
            (-w + 1, not_left), (-w - 1, not_right),
        )

    margin = w + 1  # covers the largest (diagonal) lane offset

    def neighbor_min(lab):
        padded = jnp.concatenate(
            [
                jnp.full((b, margin), big, ldtype),
                lab,
                jnp.full((b, margin), big, ldtype),
            ],
            axis=1,
        )
        m = lab
        for off, ok in shifts:
            sh = jax.lax.slice(
                padded, (0, margin - off), (b, margin - off + n)
            )
            if ok is not None:
                sh = jnp.where(ok, sh, big)
            m = jnp.minimum(m, sh)
        return jnp.where(masks_flat, m, big)

    def sweep_block(lab):
        new = lab
        for _ in range(12):
            new = neighbor_min(new)
        return new

    # phase 1: pure dense sweeps — gather-free, and enough for any mask
    # whose components' path lengths fit the iteration budget (the sweep
    # budget comfortably covers the grid diameter)
    sweep_limit = max(2, (h + w) // 10)

    def body1(state):
        lab, _, it = state
        new = sweep_block(lab)
        return new, jnp.any(new != lab), it + 1

    labels, changed, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < sweep_limit),
        body1,
        (labels, jnp.bool_(True), jnp.int32(0)),
    )

    # phase 2: pointer jumping for adversarial stragglers (long snaking
    # components) — zero iterations when phase 1 already converged
    def body2(state):
        lab, _ = state
        new = sweep_block(lab)
        flat_ext = jnp.concatenate(
            [new, jnp.full((b, 1), big, ldtype)], axis=1
        )
        jumped = jnp.take_along_axis(flat_ext, new.astype(jnp.int32), axis=1)
        new = jnp.where(masks_flat, jnp.minimum(jumped, new), big)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body2, (labels, changed))
    labels = labels.reshape(b, h, w)

    # canonicalize: components numbered in raster order of their root pixel
    is_root = masks & (labels == idx)
    rank = jnp.cumsum(is_root.reshape(b, n).astype(jnp.int32), axis=1)
    rank_ext = jnp.concatenate([rank, jnp.zeros((b, 1), jnp.int32)], axis=1)
    canon = jnp.where(
        masks,
        jnp.take_along_axis(
            rank_ext, labels.reshape(b, n).astype(jnp.int32), axis=1
        ).reshape(b, h, w),
        0,
    )
    counts = rank[:, -1] + 1
    return canon.astype(jnp.int32), counts


def connected_components(
    mask: jnp.ndarray, connectivity: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-mask convenience wrapper over the batched kernel."""
    labels, counts = connected_components_batched(
        mask[None], connectivity
    )
    return labels[0], counts[0]
