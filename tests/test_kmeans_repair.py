"""Empty-cluster repair rules (ops/kmeans.py).

The production rule (global farthest point) is covered by
test_segmentation_ops.py's compactness bound; these tests pin the
``repair="opencv_split"`` reference-compat rule against cv::kmeans
ITSELF: cv2 with ``KMEANS_USE_INITIAL_LABELS`` and an initial labeling
that leaves clusters empty fires OpenCV's repair deterministically (no
RNG on that path).

Validation is through the CENTERS chain: cv::kmeans clamps maxCount to
>= 2 and alternates center-update(+repair) / assignment, returning the
centers of its final update. Matching those centers across chain depths
1..3 transitively validates every intermediate labeling and repair
decision (any divergence anywhere would change all later centers).
Empirically the python binding returns the INITIAL labels unchanged on
the USE_INITIAL_LABELS path, so labels are asserted through the chain
rather than cv2's return value. cv quirks replicated: biggest cluster
by count with FIRST-wins ties (strict ``<`` scan), farthest member by
squared L2 with LAST-wins ties (``max_dist <= dist``), and
reciprocal-multiply center normalization (``*= 1.f/count``).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svc_tpu.ops.kmeans import _assign, _opencv_split_repair, kmeans_t

cv2 = pytest.importorskip("cv2")


def _case(seed, n=24, k=4, d=2, used=2):
    rng = np.random.default_rng(seed)
    pts = rng.integers(-20, 21, (n, d)).astype(np.float32)
    labels0 = rng.integers(0, used, n).astype(np.int32)  # used..k-1 empty
    return pts, labels0, k


@functools.partial(jax.jit, static_argnames=("k", "updates"))
def _emulate(xt, mask, labels0, k, updates):
    """cv::kmeans' internal chain: ``updates`` x (center update with
    opencv_split repair, reciprocal-multiply normalization, then
    assignment except after the last update). Returns the final centers.
    """
    labels = labels0
    centers = None
    for u in range(updates):
        onehot = (
            labels[None, :] == jnp.arange(k, dtype=jnp.int32)[:, None]
        ).astype(jnp.float32) * mask.astype(jnp.float32)[None, :]
        sums = jax.lax.dot_general(
            onehot, xt.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (k, D)
        counts = jnp.sum(onehot, axis=1)
        labels, sums, counts = _opencv_split_repair(
            xt, mask, labels, sums, counts, k
        )
        centers = sums * (1.0 / jnp.maximum(counts, 1.0))[:, None]
        if u + 1 < updates:
            labels, _ = _assign(xt, centers, mask)
    return centers


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("max_count", [1, 2, 3])
def test_opencv_split_matches_cv2_center_chain(seed, max_count):
    pts, labels0, k = _case(seed)
    n, d = pts.shape

    crit = (cv2.TERM_CRITERIA_MAX_ITER, max_count, 0.0)
    _, _, cv_centers = cv2.kmeans(
        pts, k, labels0.copy(), crit, 1, cv2.KMEANS_USE_INITIAL_LABELS
    )

    xt = jnp.asarray(pts.T)  # (D, N)
    mask = jnp.ones((n,), bool)
    updates = max(max_count, 2)  # cv clamps maxCount to >= 2
    ours = np.asarray(
        _emulate(xt, mask, jnp.asarray(labels0), k, updates)
    )
    # exact: sums/counts are integer-valued f32 (exact), repair and
    # normalization replicate cv's ops (incl. reciprocal-multiply), and
    # the d=2 distance sum has a single evaluation order in f32
    np.testing.assert_array_equal(ours, cv_centers)


def test_opencv_split_fills_every_cluster():
    pts, labels0, k = _case(7, n=40, k=6, used=2)
    n, d = pts.shape
    xt = jnp.asarray(pts.T)
    mask = jnp.ones((n,), bool)
    onehot = (labels0[None, :] == np.arange(k)[:, None]).astype(np.float32)
    labels, sums, counts = _opencv_split_repair(
        xt, mask, jnp.asarray(labels0),
        jnp.asarray(onehot @ pts), jnp.asarray(onehot.sum(1)), k,
    )
    counts = np.asarray(counts)
    assert (counts >= 1).all(), counts
    assert counts.sum() == n


def test_kmeans_t_opencv_repair_partitions():
    """End-to-end: the opencv_split mode produces a valid labeling with
    k-means++ seeding (rule active whenever a seeded center captures no
    points)."""
    rng = np.random.default_rng(5)
    n, d, k = 64, 4, 8
    xt = jnp.asarray(rng.normal(size=(d, n)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.6)
    labels, centers, compact = kmeans_t(
        xt, mask, k, jax.random.key(0), repair="opencv_split"
    )
    labels = np.asarray(labels)
    valid = np.asarray(mask)
    assert (labels[valid] >= 0).all() and (labels[valid] < k).all()
    assert (labels[~valid] == -1).all()
    assert np.isfinite(float(compact))
