"""Microbenchmark: wire-DCT Pallas kernel variants at bench shapes.

The production kernel pairs two block rows per dot (diag(W, W) stage
weights, K = N = 128 — shipped after this benchmark showed 1.36x). The
remaining variant here merges all pairs of a grid step into ONE dot
chain; measured ~4% SLOWER than the shipped per-pair loop, kept as the
recorded negative result.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from svc_tpu.ops.dct_pallas import (  # noqa: E402
    _pair_stage_weights,
    _rows_per_step,
    dct2_planes_to_wire_pallas,
)


def _make_merged_kernel(channels, pairs, n, nbx):
    """All pairs of the grid step in ONE stage-1/stage-2 dot chain."""

    def kernel(*refs):
        m1_refs = refs[0:3]
        m2_ref = refs[3]
        plane_refs = refs[4 : 4 + channels]
        o_ref = refs[4 + channels]
        m1_terms = [r_[...] for r_ in m1_refs]
        m2 = m2_ref[...]
        x = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        jnp.concatenate(
                            [
                                ref[0, 0, 2 * u + v].reshape(n, nbx)
                                for ref in plane_refs
                            ],
                            axis=1,
                        )
                        for v in (0, 1)
                    ],
                    axis=0,
                )
                for u in range(pairs)
            ],
            axis=1,
        )  # (2n, pairs*C*nbx)
        xb = x.astype(jnp.int32).astype(jnp.bfloat16)
        a = None
        for m in m1_terms:
            p = jax.lax.dot_general(
                xb, m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a = p if a is None else a + p
        z = jax.lax.dot_general(
            a, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (pairs*C*nbx, 2n)
        zc = z.reshape(pairs, channels, nbx, 2 * n)
        for u in range(pairs):
            for v in (0, 1):
                o_ref[0, 2 * u + v] = jnp.concatenate(
                    [
                        zc[u, c, :, v * n : (v + 1) * n]
                        for c in range(channels)
                    ],
                    axis=1,
                )

    return kernel


def dct2_merged_pallas(planes, block_w, block_h):
    c, t, h, w = planes.shape
    nby, nbx = h // block_h, w // block_w
    n = block_h * block_w
    r = _rows_per_step(nby)
    assert r % 2 == 0

    p = planes.reshape(c, t, h, nbx, block_w)
    p = jnp.swapaxes(p, -1, -2)
    p5 = p.reshape(c, t, nby, block_h, block_w, nbx)

    t1p, w2p = _pair_stage_weights(block_w, block_h)
    mspec = pl.BlockSpec(
        (2 * n, 2 * n), lambda ti, yi: (0, 0), memory_space=pltpu.VMEM
    )
    pspecs = [
        pl.BlockSpec(
            (1, 1, r, block_h, block_w, nbx),
            functools.partial(lambda ci, ti, yi: (ci, ti, yi, 0, 0, 0), ci),
            memory_space=pltpu.VMEM,
        )
        for ci in range(c)
    ]
    return pl.pallas_call(
        _make_merged_kernel(c, r // 2, n, nbx),
        grid=(t, nby // r),
        in_specs=[mspec] * 4 + pspecs,
        out_specs=pl.BlockSpec(
            (1, r, nbx, c * n), lambda ti, yi: (ti, yi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, nby, nbx, c * n), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )(*[jnp.asarray(m) for m in t1p], jnp.asarray(w2p), *([p5] * c))


def bench(name, fn, planes, iters=30):
    f = jax.jit(functools.partial(fn, block_w=8, block_h=8))
    out = f(planes)
    jax.block_until_ready(out)
    np.asarray(out[0, 0, 0, :1])  # force D2H sync on axon
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(planes)
    np.asarray(out[0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:24s} {dt:7.3f} ms/batch")
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.integers(0, 256, (3, 16, 1088, 1920), dtype=np.uint8)
    )
    ref = bench("prod wire-DCT (paired)", dct2_planes_to_wire_pallas, planes)
    got = bench("merged one-dot step", dct2_merged_pallas, planes)
    same = bool(jnp.array_equal(ref, got))
    print("bit-identical:", same)
    if not same:
        d = np.abs(np.asarray(ref) - np.asarray(got))
        print("max abs diff:", d.max())


if __name__ == "__main__":
    main()
