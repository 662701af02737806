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
def connected_components(
    mask: jnp.ndarray, connectivity: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label connected regions of a bool ``(H, W)`` mask.

    Returns ``(labels, count)`` where labels are int32 with 0 for
    background and 1..n for components, and ``count = n + 1`` — the same
    "number of labels including background" that
    ``cv::connectedComponents`` returns (the encoder advances its
    block-type offset by this value per cluster, libs/encoder.cpp:609-622).
    """
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    h, w = mask.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)  # sentinel for background / out of mask
    labels = jnp.where(mask, idx, big)

    if connectivity == 4:
        shifts = ((0, 1), (0, -1), (1, 0), (-1, 0))
    else:
        shifts = (
            (0, 1), (0, -1), (1, 0), (-1, 0),
            (1, 1), (1, -1), (-1, 1), (-1, -1),
        )

    def neighbor_min(lab):
        m = lab
        for dy, dx in shifts:
            shifted = jnp.roll(lab, (dy, dx), axis=(0, 1))
            # cells rolled across the border are invalid
            yy = jnp.arange(h)[:, None]
            xx = jnp.arange(w)[None, :]
            valid = (
                (yy - dy >= 0) & (yy - dy < h) & (xx - dx >= 0) & (xx - dx < w)
            )
            m = jnp.minimum(m, jnp.where(valid, shifted, big))
        return jnp.where(mask, m, big)

    def body(state):
        lab, _ = state
        new = neighbor_min(lab)
        # pointer jumping: follow the label chain two hops at a time
        flat = new.ravel()
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        new = flat_ext[flat].reshape(h, w)
        new = jnp.where(mask, jnp.minimum(new, lab), big)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True))
    )

    # canonicalize: components numbered in raster order of their root pixel
    is_root = mask & (labels == idx)
    rank = jnp.cumsum(is_root.ravel().astype(jnp.int32))
    rank_ext = jnp.concatenate([rank, jnp.array([0], jnp.int32)])
    canon = jnp.where(mask, rank_ext[labels.ravel()].reshape(h, w), 0)
    count = rank[-1] + 1
    return canon.astype(jnp.int32), count
