"""Fused Pallas TPU kernel for the k-means Lloyd iterations.

Replaces the XLA Lloyd loop of ``ops.kmeans`` (the per-frame clustering of
foreground motion features, reference: ``cv::kmeans`` at
libs/encoder.cpp:557-578) with one VMEM-resident kernel per frame: all
``attempts x max_iter`` iterations — assignment, centers update,
empty-cluster repair, convergence freeze — run without touching HBM, where
the XLA formulation materializes the (k, N) distance/one-hot tensors every
iteration (measured ~5-6 ms of a 16-frame 1080p batch; the kernel runs the
same math in well under 1 ms).

Structure per attempt (static Python loops; this toolchain's Mosaic
rejects most dynamic control flow):

* distances: ``(16, N)`` = sum_d (centers[:, d:d+1] - x[d:d+1, :])^2 —
  k rides sublanes, points ride lanes; rows >= k are masked with +inf.
* assignment: first-wins argmin via min + iota-min over sublanes.
* centers update: ONE MXU ``dot_general`` contracting the lane axis:
  onehot (16, N) x x_aug (8, N) -> (16, 8), where x_aug row 4 is the
  validity mask so column 4 of the product is the cluster count.
  HIGHEST precision keeps f32 operands exact.
* empty-cluster repair: k sequential masked argmax picks build a
  farthest-point one-hot in a scratch ref; a second dot extracts the
  points' coordinates; rank selection is a tiny triangular matmul.
* convergence: the freeze select uses the PREVIOUS done flag, exactly like
  the XLA loop (ops/kmeans.py), so results match the early-exit semantics.

Seeding (k-means++ inverse-CDF, ops/kmeans.py) stays in XLA — it is one
pass, and cumsum is not expressible in this Mosaic build.

Backend split: the kernel runs only on TPU; CPU (tests) uses the XLA path.
Both compute the same algorithm; the centers-update dot may associate
float additions differently, so labels can differ on exact distance ties —
the same class of divergence already documented for cv::kmeans (Q7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_KPAD = 16  # sublane-padded cluster capacity
_CHUNK = 8192  # lane-chunk size for large point sets


def _make_lloyd_kernel(
    k: int, d: int, attempts: int, max_iter: int, epsilon: float, n: int,
    cs: int,
):
    """Kernel factory. Points are processed in ``n // cs`` lane chunks so
    large fields (4K: 32400 MV blocks) stay inside VMEM: the per-chunk
    (16, cs) distance/one-hot values are the only big live tensors, while
    the centers update accumulates one (16, 8) MXU dot per chunk. With a
    single chunk (``cs == n``) the op sequence is exactly the historical
    unchunked kernel."""
    nc = n // cs

    def kernel(x_ref, m_ref, c0_ref, tril_ref, lab_ref, cen_ref, cmp_ref, fo_ref, cand_ref, pd2_ref, work_ref, done_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        row16 = jax.lax.broadcasted_iota(jnp.int32, (_KPAD, 1), 0)
        rowCS = jax.lax.broadcasted_iota(jnp.int32, (_KPAD, cs), 0)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (_KPAD, 128), 1)
        fake_row = (row16 >= k).astype(jnp.float32) * _BIG  # (16,1)
        real_row = (row16 < k).astype(jnp.float32)
        dim_cols = (col128 < d).astype(jnp.float32)
        tril_c = tril_ref[...]

        def assign_chunk(cen, ch):
            xs = x_ref[:, ch * cs : (ch + 1) * cs]  # (8, cs)
            mv = m_ref[:, ch * cs : (ch + 1) * cs]  # (1, cs)
            # per-dimension broadcast subtract-square: measured FASTER
            # than the |c-x|^2 MXU-dot expansion here (the feature axis is
            # tiny, so sequential M=16/K=d dots are latency-bound and cost
            # ~0.4 ms/batch more than these VPU passes)
            d2 = None
            for dd in range(d):
                t = (cen[:, dd : dd + 1] - xs[dd : dd + 1, :]) ** 2
                d2 = t if d2 is None else d2 + t
            d2 = d2 + fake_row  # exclude padding rows
            best = jnp.min(d2, axis=0, keepdims=True)  # (1, cs)
            lab = jnp.min(
                jnp.where(d2 <= best, rowCS, _KPAD), axis=0, keepdims=True
            )  # first-wins ties
            pd2 = jnp.where(mv > 0, jnp.maximum(best, 0.0), 0.0)
            return xs, mv, lab, pd2

        for a in range(attempts):
            work_ref[...] = c0_ref[0, a]  # (16, 128) f32, cols >= d zero
            done_ref[0, 0] = jnp.float32(0.0)
            for _ in range(max_iter):
                # TRUE early exit: a converged attempt skips the whole
                # iteration body (the XLA loop only freezes the selects,
                # so it still pays every pass; measured on real content
                # most attempts converge in < max_iter iterations)
                @pl.when(done_ref[0, 0] == 0.0)
                def _iteration():
                    cen = work_ref[...]
                    sums = None
                    for ch in range(nc):
                        xs, mv, lab, pd2 = assign_chunk(cen, ch)
                        onehot = (
                            (rowCS == lab).astype(jnp.float32) * mv
                        )  # (16, cs)
                        p = jax.lax.dot_general(
                            onehot, xs, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (16, 8): cols 0..d-1 sums, col d counts
                        sums = p if sums is None else sums + p
                        # parked for the repair pass: recomputing these
                        # inside the predicated branch was measured SLOWER
                        # in context (+0.5 ms/batch: empty clusters are
                        # common enough that the recompute fires most
                        # iterations while the parking costs ~3 passes)
                        pd2_ref[:, ch * cs : (ch + 1) * cs] = pd2
                    counts = sums[:, d : d + 1]  # (16, 1)
                    newc = sums / jnp.maximum(counts, 1.0)
                    newc = jnp.pad(
                        newc, ((0, 0), (0, 128 - newc.shape[1]))
                    )
                    newc = newc * dim_cols  # zero count/padding columns

                    empty = ((counts == 0.0).astype(jnp.float32)) * real_row
                    cand_ref[...] = newc

                    @pl.when(jnp.sum(empty) > 0.0)
                    def _repair():
                        # farthest-point one-hot rows (sequential masked
                        # argmax, same picks as ops/kmeans.py's take_far
                        # for used ranks) — predicated out entirely on the
                        # common no-empty-cluster iteration
                        maskv = m_ref[...]
                        d2left = jnp.where(maskv > 0, pd2_ref[...], -1.0)
                        for m in range(k):
                            mx = jnp.max(d2left)
                            fi = jnp.min(jnp.where(d2left >= mx, lane, n))
                            fo_ref[m : m + 1, :] = (lane == fi).astype(
                                jnp.float32
                            )
                            d2left = jnp.where(lane == fi, -1.0, d2left)
                        for m in range(k, _KPAD):
                            fo_ref[m : m + 1, :] = jnp.zeros(
                                (1, n), jnp.float32
                            )
                        farv = jax.lax.dot_general(
                            fo_ref[...], x_ref[...],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (16, 8); row m = m-th farthest point coords
                        farv = jnp.pad(
                            farv, ((0, 0), (0, 128 - farv.shape[1]))
                        )
                        farv = farv * dim_cols

                        # empty_rank = cumsum(empty) - 1 (triangular dot)
                        er = (
                            jax.lax.dot_general(
                                tril_c, empty, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )
                            - 1.0
                        )  # (16, 1)
                        rep_sel = (
                            er
                            == jax.lax.broadcasted_iota(
                                jnp.int32, (_KPAD, _KPAD), 1
                            ).astype(jnp.float32)
                        ).astype(jnp.float32)
                        rep = jax.lax.dot_general(
                            rep_sel, farv, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (16, 128): row j = farv[empty_rank_j]
                        cand_ref[...] = jnp.where(empty > 0, rep, newc)

                    cand = cand_ref[...]

                    shift2 = jnp.max(
                        jnp.sum((cand - cen) ** 2, axis=1, keepdims=True)
                        * real_row
                    )
                    # the update that sets done still applies (the XLA
                    # loop's freeze uses the PREVIOUS done flag)
                    work_ref[...] = cand
                    done_ref[0, 0] = (
                        shift2 <= jnp.float32(epsilon) ** 2
                    ).astype(jnp.float32)

            cen = work_ref[...]
            total = None
            for ch in range(nc):
                _, _, lab, pd2 = assign_chunk(cen, ch)
                lab_ref[0, a : a + 1, ch * cs : (ch + 1) * cs] = lab
                t = jnp.sum(pd2)
                total = t if total is None else total + t
            cen_ref[0, a] = cen
            cmp_ref[0, a : a + 1, :] = total * jnp.ones(
                (1, 128), jnp.float32
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "d", "max_iter", "epsilon", "interpret"),
)
def lloyd_pallas(
    x_aug: jnp.ndarray,
    mask_f: jnp.ndarray,
    init_centers: jnp.ndarray,
    k: int,
    d: int,
    max_iter: int,
    epsilon: float,
    interpret: bool = False,
):
    """Run all Lloyd attempts for one frame in one kernel.

    Args:
      x_aug: ``(8, N)`` f32 — rows 0..d-1 features, row d all-ones
        (the count column of the update dot), rest zero.
      mask_f: ``(1, N)`` f32 validity.
      init_centers: ``(A, 16, 128)`` f32 seeded centers (cols >= d zero).

    Returns ``(labels (A, N) int32, centers (A, 16, 128), compactness
    (A,))``.
    """
    attempts = init_centers.shape[0]
    n_in = x_aug.shape[1]
    cs = min(n_in, _CHUNK)
    n = -(-n_in // cs) * cs
    if n != n_in:
        # pad to a whole number of chunks; mask zeros keep the pad lanes
        # out of every sum/pick, and the label tail is sliced off below
        x_aug = jnp.pad(x_aug, ((0, 0), (0, n - n_in)))
        mask_f = jnp.pad(mask_f, ((0, 0), (0, n - n_in)))
    kernel = _make_lloyd_kernel(k, d, attempts, max_iter, epsilon, n, cs)
    lab, cen, cmp_ = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, attempts, _KPAD, 128),
                lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_KPAD, _KPAD), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, attempts, n), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, attempts, _KPAD, 128),
                lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, attempts, 128), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, attempts, n), jnp.int32),
            jax.ShapeDtypeStruct((1, attempts, _KPAD, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, attempts, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_KPAD, n), jnp.float32),
            pltpu.VMEM((_KPAD, 128), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((_KPAD, 128), jnp.float32),  # working centers
            pltpu.SMEM((1, 1), jnp.float32),  # per-attempt done flag
        ],
        interpret=interpret,
    )(
        x_aug,
        mask_f,
        init_centers[None],
        jnp.asarray(np.tril(np.ones((_KPAD, _KPAD), np.float32))),
    )
    return lab[0, :, :n_in], cen[0], cmp_[0, :, 0]


def _make_lloyd_batched_kernel(
    k: int, d: int, attempts: int, max_iter: int, epsilon: float,
    f: int, n: int, cs: int,
):
    """Frame-batched kernel factory: ALL frames of the encode batch run
    one attempt-iteration TOGETHER, frames stacked on the leading axis of
    every tensor ((F, 16, cs) distances, one BATCHED centers-update
    ``dot_general`` per chunk). The per-frame kernel's grid serialized
    ``frames x attempts x max_iter`` tiny iteration bodies (480 at the
    1080p defaults) whose per-step overheads dominated; here the
    sequential depth is ``attempts x max_iter`` (30) of F-wide bodies.
    Per-frame convergence freezes via the previous done flag exactly like
    the XLA loop; a whole iteration is skipped only when EVERY frame of
    the attempt has converged."""
    nc = n // cs

    def kernel(
        x_ref, m_ref, c0_ref, tril_ref,
        lab_ref, cen_ref, cmp_ref,
        work_ref, cand_ref, farv_ref, pd2_ref, done_ref, alldone_ref,
    ):
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        row3 = jax.lax.broadcasted_iota(jnp.int32, (1, _KPAD, 1), 1)
        rowCS = jax.lax.broadcasted_iota(jnp.int32, (1, _KPAD, cs), 1)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        iotaK = jax.lax.broadcasted_iota(jnp.int32, (1, _KPAD, _KPAD), 2)
        fake_row = (row3 >= k).astype(jnp.float32) * _BIG  # (1,16,1)
        real_row = (row3 < k).astype(jnp.float32)
        dim_cols = (col3 < d).astype(jnp.float32)  # (1,1,128)
        eps2 = jnp.float32(epsilon) ** 2

        def assign_chunk(cen, ch):
            xs = x_ref[:, :, ch * cs : (ch + 1) * cs]  # (F, 8, cs)
            mv = m_ref[:, :, ch * cs : (ch + 1) * cs]  # (F, 1, cs)
            d2 = None
            for dd in range(d):
                t = (cen[:, :, dd : dd + 1] - xs[:, dd : dd + 1, :]) ** 2
                d2 = t if d2 is None else d2 + t  # (F, 16, cs)
            d2 = d2 + fake_row
            best = jnp.min(d2, axis=1, keepdims=True)  # (F, 1, cs)
            lab = jnp.min(
                jnp.where(d2 <= best, rowCS, _KPAD), axis=1, keepdims=True
            )  # first-wins ties, (F, 1, cs)
            pd2 = jnp.where(mv > 0, jnp.maximum(best, 0.0), 0.0)
            return xs, mv, lab, pd2

        # one grid step per attempt: per-attempt blocks keep the c0/lab/
        # cen/cmp VMEM residency 1/attempts of the full tensors (the
        # single-program form exceeded the 16 MB scoped budget at the
        # 1080p batch size)
        work_ref[...] = c0_ref[0]  # (F, 16, 128)
        done_ref[...] = jnp.zeros_like(done_ref)
        alldone_ref[0, 0] = jnp.float32(0.0)

        # fori_loop (unroll=1) keeps the traced graph ONE iteration
        # deep: a static max_iter unroll of this F-wide body made
        # Mosaic compile times pathological (>20 min at the 1080p
        # batch). All loop state lives in the scratch refs.
        def _iter_step(_, carry):
            @pl.when(alldone_ref[0, 0] == 0.0)
            def _iteration():
                cen = work_ref[...]
                sums = None
                for ch in range(nc):
                    xs, mv, lab, pd2 = assign_chunk(cen, ch)
                    onehot = (
                        (rowCS == lab).astype(jnp.float32) * mv
                    )  # (F, 16, cs)
                    p = jax.lax.dot_general(
                        onehot, xs,
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (F, 16, 8)
                    sums = p if sums is None else sums + p
                    pd2_ref[:, :, ch * cs : (ch + 1) * cs] = pd2
                counts = sums[:, :, d : d + 1]  # (F, 16, 1)
                newc = sums / jnp.maximum(counts, 1.0)
                newc = jnp.pad(
                    newc, ((0, 0), (0, 0), (0, 128 - newc.shape[2]))
                )
                newc = newc * dim_cols

                empty = (
                    (counts == 0.0).astype(jnp.float32) * real_row
                )  # (F, 16, 1)
                cand_ref[...] = newc

                @pl.when(jnp.sum(empty) > 0.0)
                def _repair():
                    # farthest-point repairs for EVERY frame at once
                    # (frames without empties discard theirs in the
                    # final where); picks are per frame — the max and
                    # the coordinate-extraction dot batch over F
                    farv_ref[...] = jnp.zeros_like(farv_ref)
                    d2left = jnp.where(
                        m_ref[...] > 0, pd2_ref[...], -1.0
                    )  # (F, 1, N)
                    for m in range(k):
                        mx = jnp.max(d2left, axis=2, keepdims=True)
                        fi = jnp.min(
                            jnp.where(d2left >= mx, lane3, n),
                            axis=2, keepdims=True,
                        )  # (F, 1, 1)
                        oh = (lane3 == fi).astype(jnp.float32)
                        # coordinate extraction in lane chunks: a
                        # full-x_ref operand would put a second
                        # (F, 8, N) value on the VMEM stack (OOM at
                        # the 1080p batch size)
                        coords = None
                        for ch in range(nc):
                            sl = slice(ch * cs, (ch + 1) * cs)
                            p = jax.lax.dot_general(
                                oh[:, :, sl], x_ref[:, :, sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            )  # (F, 1, 8)
                            coords = (
                                p if coords is None else coords + p
                            )
                        farv_ref[:, m : m + 1, 0:8] = coords
                        d2left = jnp.where(lane3 == fi, -1.0, d2left)
                    farv = farv_ref[...] * dim_cols

                    # empty_rank = cumsum(empty) - 1, batched
                    # triangular dot (tril pre-tiled per frame)
                    er = (
                        jax.lax.dot_general(
                            tril_ref[...], empty,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        - 1.0
                    )  # (F, 16, 1)
                    rep_sel = (er == iotaK.astype(jnp.float32)).astype(
                        jnp.float32
                    )  # (F, 16, 16)
                    rep = jax.lax.dot_general(
                        rep_sel, farv,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (F, 16, 128)
                    cand_ref[...] = jnp.where(empty > 0, rep, newc)

                cand = cand_ref[...]
                shift2 = jnp.max(
                    jnp.sum((cand - cen) ** 2, axis=2, keepdims=True)
                    * real_row,
                    axis=1, keepdims=True,
                )  # (F, 1, 1)
                prev = done_ref[:, :, 0:1]  # (F, 1, 1)
                # frozen frames keep their centers; the update that
                # sets done still applies (previous-done semantics,
                # same as the XLA loop and the per-frame kernel)
                work_ref[...] = jnp.where(prev > 0, cen, cand)
                newdone = jnp.maximum(
                    prev, (shift2 <= eps2).astype(jnp.float32)
                )
                done_ref[:, :, 0:1] = newdone
                alldone_ref[0, 0] = jnp.min(newdone)

            return carry

        jax.lax.fori_loop(0, max_iter, _iter_step, 0, unroll=1)

        cen = work_ref[...]
        total = None
        for ch in range(nc):
            _, _, lab, pd2 = assign_chunk(cen, ch)
            lab_ref[0, :, ch * cs : (ch + 1) * cs] = lab[:, 0, :]
            t = jnp.sum(pd2, axis=2, keepdims=True)  # (F, 1, 1)
            total = t if total is None else total + t
        cen_ref[0] = cen
        cmp_ref[0] = jnp.broadcast_to(total[:, 0, :], (f, 128))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "d", "max_iter", "epsilon", "interpret"),
)
def lloyd_pallas_batched(
    x_aug: jnp.ndarray,
    mask_f: jnp.ndarray,
    init_centers: jnp.ndarray,
    k: int,
    d: int,
    max_iter: int,
    epsilon: float,
    interpret: bool = False,
):
    """Run all Lloyd attempts for a FRAME BATCH in one kernel.

    Args:
      x_aug: ``(F, 8, N)`` f32 — rows 0..d-1 features, row d all-ones.
      mask_f: ``(F, 1, N)`` f32 validity.
      init_centers: ``(A, F, 16, 128)`` f32 seeded centers.

    Returns ``(labels (A, F, N) int32, centers (A, F, 16, 128),
    compactness (A, F))``. Same algorithm as :func:`lloyd_pallas` run
    per frame (identical chunk order and dot shapes per frame, so
    results match the per-frame kernel bit for bit).
    """
    attempts, f = init_centers.shape[0], x_aug.shape[0]
    n_in = x_aug.shape[2]
    cs = _batched_chunk(f, n_in)
    n = -(-n_in // cs) * cs
    if n != n_in:
        x_aug = jnp.pad(x_aug, ((0, 0), (0, 0), (0, n - n_in)))
        mask_f = jnp.pad(mask_f, ((0, 0), (0, 0), (0, n - n_in)))
    kernel = _make_lloyd_batched_kernel(
        k, d, attempts, max_iter, epsilon, f, n, cs
    )
    tril = np.tile(
        np.tril(np.ones((_KPAD, _KPAD), np.float32))[None], (f, 1, 1)
    )
    lab, cen, cmp_ = pl.pallas_call(
        kernel,
        grid=(attempts,),
        in_specs=[
            pl.BlockSpec(
                (f, 8, n), lambda a: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f, 1, n), lambda a: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, f, _KPAD, 128),
                lambda a: (a, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f, _KPAD, _KPAD),
                lambda a: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, f, n), lambda a: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, _KPAD, 128),
                lambda a: (a, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, 128), lambda a: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((attempts, f, n), jnp.int32),
            jax.ShapeDtypeStruct((attempts, f, _KPAD, 128), jnp.float32),
            jax.ShapeDtypeStruct((attempts, f, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, _KPAD, 128), jnp.float32),  # working centers
            pltpu.VMEM((f, _KPAD, 128), jnp.float32),  # candidates
            pltpu.VMEM((f, _KPAD, 128), jnp.float32),  # farthest points
            pltpu.VMEM((f, 1, n), jnp.float32),  # parked distances
            pltpu.VMEM((f, 1, 128), jnp.float32),  # per-frame done
            pltpu.SMEM((1, 1), jnp.float32),  # all-done flag
        ],
        # the F-wide 3-D bodies put more live vregs on Mosaic's VMEM
        # stack than the default 16 MB scoped budget; v5e has 128 MB of
        # VMEM and this kernel's resident refs are ~9 MB, so raising the
        # scoped limit is safe headroom, not oversubscription
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_aug, mask_f, init_centers, jnp.asarray(tril))
    return lab[:, :, :n_in], cen, cmp_[:, :, 0]


def _batched_chunk(f: int, n: int) -> int:
    """Lane-chunk size keeping the (F, 16, cs) iteration tensors inside
    a conservative VMEM budget (the caller pads N to whole chunks)."""
    cs = 4096
    while cs > 256 and f * _KPAD * cs * 4 * 6 > 3 * 1024 * 1024:
        cs //= 2
    return min(cs, n)


def lloyd_batched_supported(f: int, n: int, k: int, d: int) -> bool:
    """TPU-only; bounded VMEM across the full-group resident tensors
    (x_aug + labels + parked distances + chunk intermediates). Callers
    split larger frame batches into groups of :func:`lloyd_frame_group`
    frames (kmeans.kmeans_t_frames)."""
    if jax.default_backend() in ("cpu",) or k > _KPAD or d > 7:
        return False
    if n < 128 or f < 2:
        return False
    resident = f * n * (8 * 4 + 4 + 4 + 3 * 4 + 4)  # x, m, pd2, lab, misc
    # 6 MB keeps groups at 8 frames for the 1080p batch — measured FASTER
    # than one 16-frame group (2.25 vs 2.8 ms: the bigger group halves
    # the lane chunk, and chunk-loop overhead outweighs the saved
    # invocation)
    return resident <= 6 * 1024 * 1024


def lloyd_frame_group(f: int, n: int, k: int, d: int) -> int:
    """Largest group size (<= f) passing the VMEM gate — NOT restricted
    to divisors of ``f``: awkward frame counts (primes, 2^k + 1) run
    floor(f/g) full groups plus one smaller tail group (a 1-frame tail
    uses the per-frame kernel; kmeans.kmeans_t_frames). Returns 0 when
    even a 2-frame group does not fit."""
    for g in range(f, 1, -1):
        if lloyd_batched_supported(g, n, k, d):
            return g
    return 0


def lloyd_pallas_supported(n: int, k: int, d: int) -> bool:
    """TPU-only (CPU tests use the XLA path), modest sizes, k <= 16.

    Points beyond one chunk (8192 lanes) are processed in chunks inside
    the kernel; the cap keeps the full-row scratches (labels, pd2,
    farthest-point one-hots — ~70 B/point) plus per-chunk values inside
    the ~16 MB scoped-VMEM budget. 4K's 32400-block MV field fits.
    """
    return (
        jax.default_backend() not in ("cpu",)
        and k <= _KPAD
        and d <= 7
        and 128 <= n <= 8 * _CHUNK
    )
