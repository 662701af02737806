"""Micro-bench: decode display-tail variants (un-pitch + interleave).

The fused decode kernel can emit its uint8 output in several layouts;
each implies a different XLA tail to reach packed display rows
(T, H, W*C). The pitched (..., bw=8, nbx) uint8 layout tile-pads
4.27x physically ((32, 128) int8 tiles), so the layout choice dominates
the tail cost. This prints measured ms/batch for each candidate on the
real chip (1080p/16 geometry).

Usage: python benchmarks/micro_decode_tail.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out[(0,) * (out.ndim - 1)][0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * (out.ndim - 1)][0:1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from svc_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    t, c, hgt, bw, nbx = 16, 3, 1080, 8, 240
    w = bw * nbx
    rng = np.random.default_rng(0)

    # spatial->storage maps (x_ident geometry)
    xs = np.arange(w, dtype=np.int32)
    j_of = xs % bw
    x_of = xs // bw
    cidx = np.repeat(np.arange(c, dtype=np.int32)[None, :], w, 0).ravel()
    jidx = np.repeat(j_of, c)
    xidx = np.repeat(x_of, c)

    dev = jax.devices()[0]
    put = lambda a: jax.device_put(a, dev)

    # A) channel-major padded pitched u8 -> unpitch gather + interleave
    a_in = put(rng.integers(0, 256, (t, c, hgt, bw, nbx), np.uint8))

    from svc_tpu.ops import interleave

    @jax.jit
    def tail_a(p):
        planes = p[..., j_of, x_of]
        return interleave.interleave_rows(planes)

    # B) channel-minor padded pitched u8 -> one 3-axis gather
    b_in = put(rng.integers(0, 256, (t, hgt, c, bw, nbx), np.uint8))

    @jax.jit
    def tail_b(p):
        return p[:, :, cidx, jidx, xidx]

    # C/D) dense 32-sublane grouped u8 (4 display rows per tile)
    h4 = hgt // 4
    cd_in = put(rng.integers(0, 256, (t, c, h4, 32, nbx), np.uint8))

    @jax.jit
    def tail_c(p):
        qs = [
            p[:, :, :, 8 * q : 8 * (q + 1)][:, cidx, :, jidx, xidx]
            for q in range(4)
        ]  # each (WC, T, H4) -> fix axes
        qs = [jnp.transpose(q, (1, 2, 0)) for q in qs]  # (T, H4, WC)
        return jnp.stack(qs, 2).reshape(t, hgt, w * c)

    sub2d = (np.arange(hgt, dtype=np.int32)[:, None] % 4) * 8 + jidx[None, :]
    y4 = np.arange(hgt, dtype=np.int32) // 4

    @jax.jit
    def tail_d(p):
        # outer-product advanced indexing: rows pick (y//4, (y%4)*8+j)
        return p[
            :,
            cidx[None, :],
            y4[:, None],
            sub2d,
            xidx[None, :],
        ]

    # E) dense spatial planes u8 -> pure interleave gather
    e_in = put(rng.integers(0, 256, (t, c, hgt, w), np.uint8))
    lane_src = np.arange(w * c, dtype=np.int32) // c

    @jax.jit
    def tail_e(p):
        return p[:, cidx, :, np.repeat(np.arange(w, dtype=np.int32), c)]

    @jax.jit
    def tail_e2(p):
        return interleave.interleave_rows(p)

    # F) floor probe: dense u8 -> identity lane gather
    f_in = put(rng.integers(0, 256, (t, hgt, w * c), np.uint8))
    ident = np.arange(w * c, dtype=np.int32)

    @jax.jit
    def tail_f(p):
        return p[..., ident]

    # G) combined unpitch+interleave as a block-local selection einsum:
    # output 128-pixel group m reads x-lanes [16m, 16m+16) of every
    # (c, j) subplane — same local structure that makes interleave_rows
    # cheap, so K = C*bw*16 = 384 per 384-lane output group
    gpx = 128
    xin = gpx // bw  # source x lanes per output group
    sel = np.zeros((c, bw, xin, c * gpx), np.float32)
    for cc in range(c):
        for j in range(bw):
            for b in range(xin):
                sel[cc, j, b, (b * bw + j) * c + cc] = 1.0
    sel_bf = jnp.asarray(sel, jnp.bfloat16)
    ng = nbx // xin

    @jax.jit
    def tail_g(p):  # p: (T, H, C, bw, nbx) u8
        x = p.reshape(t, hgt, c, bw, ng, xin)
        out = jnp.einsum(
            "thcjgi,cjio->thgo",
            x.astype(jnp.bfloat16),
            sel_bf,
            preferred_element_type=jnp.float32,
        ).astype(jnp.uint8)
        return out.reshape(t, hgt, w * c)

    # H) f32 channel-minor pitched input (DENSE (8,128)-tiled, unlike
    # the 4.27x-padded u8) -> 3-axis gather with the display round/clip
    # fused into the consumer
    h_in = put(
        rng.standard_normal((t, hgt, c, bw, nbx)).astype(np.float32) * 60
        + 128
    )

    @jax.jit
    def tail_h(p):
        g = p[:, :, cidx, jidx, xidx]
        return jnp.clip(jnp.round(g), 0, 255).astype(jnp.uint8)

    # I) merged-minor u8 (T, H, s=C*bw, nbx) with s = j*C + c (j-major):
    # packed rows are then EXACTLY swapaxes(s, x) + minor flatten — one
    # XLA transpose/relayout instead of a gather lowering
    i_in = put(rng.integers(0, 256, (t, hgt, c * bw, nbx), np.uint8))

    @jax.jit
    def tail_i(p):
        return jnp.swapaxes(p, 2, 3).reshape(t, hgt, w * c)

    # J) merged-minor u8, s = c*bw + j (channel-major, what the fused
    # kernel emits naturally) -> one 2-axis gather
    sidx = cidx * bw + jidx

    @jax.jit
    def tail_j(p):
        return p[:, :, sidx, xidx]

    # I3) j-major merged minor -> ONE lax.reshape with a dimensions
    # permutation (transpose + flatten expressed as a single HLO op —
    # the swapaxes+reshape pair lowers as TWO copies, 0.42 + 0.29)
    @jax.jit
    def tail_i3(p):
        return jax.lax.reshape(
            p, (t, hgt, w * c), dimensions=(0, 1, 3, 2)
        )

    # I2) c-major merged minor -> split + 3-d minor transpose + flatten
    # (does XLA fuse the double permutation into one relayout?)
    @jax.jit
    def tail_i2(p):
        return (
            p.reshape(t, hgt, c, bw, nbx)
            .transpose(0, 1, 4, 3, 2)
            .reshape(t, hgt, w * c)
        )

    # K) transposed-minor u8 (T, H, nbx, s) — what an in-kernel MXU
    # identity-dot transpose would emit (lane axis 24 pads 5.3x) -> the
    # tail is only the minor-pair flatten
    k_in = put(rng.integers(0, 256, (t, hgt, nbx, c * bw), np.uint8))

    @jax.jit
    def tail_k(p):
        return p.reshape(t, hgt, w * c)

    # L) int32-packed j-major merged minor (T, H, s/4=6, nbx): each lane
    # holds 4 consecutive packed bytes (in-kernel arithmetic pack) ->
    # the swapaxes relayout moves 4x fewer ELEMENTS for the same bytes;
    # host views the (T, H, W*C/4) int32 result as packed u8 for free
    l_in = put(
        rng.integers(-(2**31), 2**31, (t, hgt, c * bw // 4, nbx),
                     np.int64).astype(np.int32)
    )

    @jax.jit
    def tail_l(p):
        return jnp.swapaxes(p, 2, 3).reshape(t, hgt, w * c // 4)

    variants = [
        ("A unpitch+interleave (padded in)", tail_a, a_in),
        ("I swapaxes+reshape (j-major merged in)", tail_i, i_in),
        ("J 2-axis gather (merged-minor in)", tail_j, i_in),
        ("I2 3d-transpose+flatten (c-major in)", tail_i2, i_in),
        ("I3 lax.reshape dims perm (j-major in)", tail_i3, i_in),
        ("K minor flatten (transposed-minor in)", tail_k, k_in),
        ("L int32-packed swapaxes+reshape", tail_l, l_in),
        ("H f32 gather + fused clip (dense in)", tail_h, h_in),
        ("B single 3-axis gather (padded in)", tail_b, b_in),
        ("C 4 gathers + merge (dense in)", tail_c, cd_in),
        ("E interleave gather (dense spatial)", tail_e, e_in),
        ("E2 interleave matmul (dense spatial)", tail_e2, e_in),
        ("F identity lane gather (floor)", tail_f, f_in),
        ("G unpitch+interleave einsum (padded in)", tail_g, b_in),
    ]
    # wall numbers swing with the tunnel; the HLO-profile per-variant
    # device totals (3 iterations each, /3) are the comparable signal
    import glob
    import gzip
    import json
    import tempfile

    for name, fn, arg in variants:
        try:
            jax.block_until_ready(fn(arg))
            td = tempfile.mkdtemp()
            with jax.profiler.trace(td):
                for _ in range(3):
                    out = fn(arg)
                jax.block_until_ready(out)
            paths = sorted(
                glob.glob(td + "/**/*.trace.json.gz", recursive=True)
            )
            with gzip.open(paths[-1], "rt") as f:
                data = json.load(f)
            events = data.get("traceEvents", [])
            tid_names = {
                (e["pid"], e["tid"]): e["args"].get("name", "")
                for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"
            }
            total = sum(
                e.get("dur", 0) / 1e3
                for e in events
                if e.get("ph") == "X"
                and "XLA Ops"
                in tid_names.get((e.get("pid"), e.get("tid")), "")
            )
            print(f"{name:42s} {total / 3:7.3f} ms/batch (device)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
