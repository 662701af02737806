"""Microbenchmark: fused refine kernel variants at the 1080p bench shapes.

Times the production ``refine_mads_pallas`` against candidate
restructurings on the real TPU, checking bit-exactness first. Variants
explored during round 2 (results in the commit log / ARCHITECTURE.md):

* binary-decomposed select chains — no win (select work shrinks only
  ~1.3x at the production bound of 14 and Mosaic scratch round-trips eat
  the rest); superseded by the two-stage coarse/fine decomposition that
  now ships in ops/motion_pallas.py (bit-exact, 2.96 -> 1.85 ms/batch).
* two block rows per grid program — bit-exact but identical runtime
  (the kernel is compute-bound, not program-launch-bound).
* block-transposed pure-XLA path (kept below) — wins at no level: the
  duplicated halo layout costs ~5x the kernel's HBM traffic at the base
  level, and the small levels are already cheap in the fused kernel.

Wall-clock numbers here are pipelined-dispatch throughput; use
device-time traces (benchmarks/profile_encode.py style) for attribution
— wall numbers lie by 3-8x on the tunneled dev chip.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from svc_tpu.ops.motion_pallas import refine_mads_pallas  # noqa: E402

# ---------------------------------------------------------------------------
# Block-transposed pure-XLA path — cells (ch, cw, mfh, mfw) put
# the BLOCK indices on the vreg dims, so every masked select and SAD touches
# fat (mfh x mfw) tiles instead of per-program (ch x cw) slivers.
# ---------------------------------------------------------------------------


def _spread_cells_bt(plane, block_w, block_h, pad):
    """(ch, cw, mfh, mfw) block-transposed spread cells."""
    ph, pw = plane.shape
    fh, fw = ph - 2 * pad, pw - 2 * pad
    mfh, mfw = fh // block_h, fw // block_w
    ch, cw = block_h + 2 * pad, block_w + 2 * pad

    needed = ((cw - 1) // block_w) * block_w + mfw * block_w
    if needed > pw:
        plane = jnp.pad(plane, ((0, 0), (0, needed - pw)))
    needed_r = ((ch - 1) // block_h) * block_h + mfh * block_h
    if needed_r > ph:
        plane = jnp.pad(plane, ((0, needed_r - ph), (0, 0)))

    # rows: ceil(ch/bh) block-aligned contiguous reshapes, concat on the
    # within-cell axis; cols likewise — ONE transpose at the end
    rparts = []
    for r0 in range(0, ch, block_h):
        seg = plane[r0 : r0 + mfh * block_h, :]
        rparts.append(seg.reshape(mfh, block_h, plane.shape[1]))
    rows = jnp.concatenate(rparts, axis=1)  # (mfh, ~ch, pw)

    cparts = []
    for c0 in range(0, cw, block_w):
        seg = rows[:, :, c0 : c0 + mfw * block_w]
        cparts.append(seg.reshape(mfh, rows.shape[1], mfw, block_w))
    stacked = jnp.concatenate(cparts, axis=-1)  # (mfh, ch', mfw, ~cw)
    out = jnp.transpose(stacked, (1, 3, 0, 2))  # (ch', ~cw, mfh, mfw)
    return out[:ch, :cw]


def refine_sads_bt(tracked, anchor, mv_yx, r, bound_in, block_w, block_h):
    """Block-transposed SADs, same output contract as refine_mads_pallas."""
    fh, fw = tracked.shape
    mfh, mfw = fh // block_h, fw // block_w
    pad = bound_in + r
    wh, ww = block_h + 2 * r, block_w + 2 * r
    ncand = (2 * r + 1) ** 2
    rows_out = ((ncand + 7) // 8) * 8

    tp = jnp.pad(tracked, ((pad, pad), (pad, pad)))
    cells = _spread_cells_bt(tp, block_w, block_h, pad)  # (ch, cw, mfh, mfw)

    mvy = mv_yx[:, 0, 0, :][None, None]  # (1, 1, mfh, mfw)
    mvx = mv_yx[:, 1, 0, :][None, None]
    shifts = list(range(-bound_in, bound_in + 1, 2)) or [0]

    win = None
    for s in shifts:
        sl = cells[pad + s - r : pad + s - r + wh]
        win = sl if win is None else jnp.where(mvy == s, sl, win)
    out = None
    for s in shifts:
        sl = win[:, pad + s - r : pad + s - r + ww]
        out = sl if out is None else jnp.where(mvx == s, sl, out)

    anchor_bt = jnp.transpose(
        anchor.reshape(mfh, block_h, mfw, block_w), (1, 3, 0, 2)
    )  # (bh, bw, mfh, mfw)
    sads = []
    for oy in range(2 * r + 1):
        for ox in range(2 * r + 1):
            cand = out[oy : oy + block_h, ox : ox + block_w]
            diff = jnp.maximum(cand, anchor_bt) - jnp.minimum(
                cand, anchor_bt
            )
            sads.append(jnp.sum(diff.astype(jnp.int32), axis=(0, 1)))
    z = jnp.zeros((rows_out - ncand, mfh, mfw), jnp.int32)
    out32 = jnp.concatenate([jnp.stack(sads), z])  # (rows_out, mfh, mfw)
    return jnp.moveaxis(out32, 1, 0)  # (mfh, rows_out, mfw)


def bench_one(name, fn, *args, iters=30):
    f = jax.jit(fn, static_argnums=(3, 4, 5, 6))
    vf = jax.vmap(f, in_axes=(0, 0, 0, None, None, None, None))
    out = vf(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = vf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:7.3f} ms/batch")
    return out, dt


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    t = 16
    levels = [
        ("lvl0 1088x1920 b16 bound14", 1088, 1920, 16, 16, 1, 14),
        ("lvl1 544x960  b8  bound6", 544, 960, 8, 8, 1, 6),
        ("lvl2 272x480  b4  bound2", 272, 480, 4, 4, 1, 2),
    ]
    total = {"prod": 0.0, "bt": 0.0}
    for name, fh, fw, bw, bh, r, bound in levels:
        mfh, mfw = fh // bh, fw // bw
        tracked = jnp.asarray(
            rng.integers(0, 256, (t, fh, fw), dtype=np.uint8)
        )
        anchor = jnp.asarray(
            rng.integers(0, 256, (t, fh, fw), dtype=np.uint8)
        )
        mv = rng.integers(-bound // 2, bound // 2 + 1, (t, mfh, 1, mfw)) * 2
        mv_yx = jnp.asarray(
            np.stack([mv, np.roll(mv, 1, axis=0)], axis=2), jnp.int32
        )  # (t, mfh, 2, 1, mfw)

        print(f"-- {name} (mfh={mfh}, mfw={mfw})")
        ref, dt0 = bench_one(
            "prod refine_mads_pallas", refine_mads_pallas,
            tracked, anchor, mv_yx, r, bound, bw, bh,
        )
        got, dt1 = bench_one(
            "block-transposed XLA", refine_sads_bt,
            tracked, anchor, mv_yx, r, bound, bw, bh,
        )
        # compare only the real candidate rows; pad rows differ (prod
        # zeroes the whole out_ref, both pad with zeros — still compare)
        ok = bool(jnp.array_equal(ref, got))
        print(f"bit-exact vs prod: {ok}")
        if not ok:
            d = np.asarray(ref) != np.asarray(got)
            print("mismatch frac:", d.mean(), "first:", np.argwhere(d)[:3])
        total["prod"] += dt0
        total["bt"] += dt1
    print("totals:", {k: round(v, 3) for k, v in total.items()})


if __name__ == "__main__":
    main()
