"""RANSAC tests: hypothesis count, inlier/outlier separation, determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svc_tpu.config import RansacParams
from svc_tpu.ops.ransac import (
    estimate_global_motion_ransac,
    hypothesis_cap,
    iter_count,
)


def _field_with_outliers(n=200, gm=(3.0, -1.0), n_out=30, seed=0):
    rng = np.random.default_rng(seed)
    field = np.tile(np.array(gm, np.float32), (n, 1))
    field += rng.normal(0, 0.5, (n, 2)).astype(np.float32)
    out_idx = rng.choice(n, n_out, replace=False)
    field[out_idx] += rng.uniform(20, 40, (n_out, 2)).astype(np.float32)
    truth = np.ones(n, bool)
    truth[out_idx] = False
    return field, truth


class TestIterCount:
    def test_default_params_give_seven(self):
        # k = ceil(log(.01)/log(.5)) = ceil(6.64) = 7
        assert iter_count(RansacParams()) == 7

    def test_larger_subset(self):
        p = RansacParams(subset_sz=4, inlier_ratio=0.5, success_prob=0.99)
        # log(.01)/log(1-.5^4) = 71.36 -> 72
        assert iter_count(p) == 72

    def test_degenerate_params_clamped(self):
        assert iter_count(RansacParams(inlier_ratio=0.0)) == 65536
        assert iter_count(RansacParams(success_prob=1.0)) == 65536

    def test_certain_success_zero_iters(self):
        # p=0 -> log(1)=0 -> k=0
        assert iter_count(RansacParams(success_prob=0.0)) == 0


class TestRansac:
    def test_separates_background_from_foreground(self):
        field, truth = _field_with_outliers()
        gm, rmse, mask = estimate_global_motion_ransac(
            jnp.asarray(field), RansacParams(), jax.random.key(0)
        )
        np.testing.assert_array_equal(np.asarray(mask), truth)
        np.testing.assert_allclose(np.asarray(gm), [3.0, -1.0], atol=0.2)
        assert float(rmse) < 1.5

    def test_grid_shaped_field(self):
        field, truth = _field_with_outliers(n=96)
        grid = field.reshape(8, 12, 2)
        _, _, mask = estimate_global_motion_ransac(
            jnp.asarray(grid), RansacParams(), jax.random.key(1)
        )
        assert mask.shape == (8, 12)
        np.testing.assert_array_equal(
            np.asarray(mask).ravel(), truth
        )

    def test_deterministic_under_same_key(self):
        field, _ = _field_with_outliers(seed=3)
        r1 = estimate_global_motion_ransac(
            jnp.asarray(field), RansacParams(), jax.random.key(7)
        )
        r2 = estimate_global_motion_ransac(
            jnp.asarray(field), RansacParams(), jax.random.key(7)
        )
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_subset_sz_greater_than_one(self):
        field, truth = _field_with_outliers(seed=4)
        p = RansacParams(subset_sz=3)
        gm, _, mask = estimate_global_motion_ransac(
            jnp.asarray(field), p, jax.random.key(2)
        )
        # with 85% inliers the fit should still nail the background
        np.testing.assert_array_equal(np.asarray(mask), truth)

    def test_field_smaller_than_subset_raises(self):
        with pytest.raises(ValueError):
            estimate_global_motion_ransac(
                jnp.zeros((2, 2), jnp.float32),
                RansacParams(subset_sz=5),
                jax.random.key(0),
            )

    def test_degenerate_params_capped_by_field_size(self, capsys):
        # legal-but-degenerate CLI params (validation only requires w >= 0)
        # would demand 65536 hypotheses; on a 1080p-sized MV field (8160
        # blocks) the capped scoring tensors must stay under 100 MB
        n = 8160
        params = RansacParams(inlier_ratio=0.0, success_prob=0.9999)
        assert iter_count(params) == 65536
        cap = hypothesis_cap(n)
        assert cap * n * 5 < 100 << 20
        field, truth = _field_with_outliers(n=n, seed=9)
        gm, _, mask = estimate_global_motion_ransac(
            jnp.asarray(field), params, jax.random.key(3)
        )
        assert "capping" in capsys.readouterr().err
        np.testing.assert_array_equal(np.asarray(mask), truth)
        np.testing.assert_allclose(np.asarray(gm), [3.0, -1.0], atol=0.2)

    def test_normal_params_not_capped(self, capsys):
        field, _ = _field_with_outliers()
        estimate_global_motion_ransac(
            jnp.asarray(field), RansacParams(), jax.random.key(0)
        )
        assert "capping" not in capsys.readouterr().err

    def test_all_identical_vectors_all_inliers(self):
        field = jnp.ones((50, 2), jnp.float32) * 4.0
        gm, rmse, mask = estimate_global_motion_ransac(
            field, RansacParams(), jax.random.key(0)
        )
        assert bool(jnp.all(mask))
        np.testing.assert_allclose(np.asarray(gm), [4.0, 4.0])
        assert float(rmse) == 0.0
