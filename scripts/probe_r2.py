"""Round-2 design probes — measure the primitives the new march/backward will
be built from, ON THE REAL CHIP. Short, batched, watchdogged (tunnel hygiene
per CLAUDE.md: vary inputs per call, materialize results, reduce in-graph).

Usage: python scripts/probe_r2.py [pallas|xla|all]
"""

import signal
import sys
import time

import numpy as np


def _watchdog(seconds=420):
    def _fire(signum, frame):
        print("WATCHDOG: device unresponsive", flush=True)
        sys.exit(2)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def bench(name, fn, make_args, iters=3):
    """fn is jitted; make_args(k) varies inputs per call; result reduced+materialized."""
    import jax.numpy as jnp

    try:
        fn(*make_args(999))  # warmup/compile
        _ = [float(np.asarray(x).ravel()[0]) for x in _leaves(fn(*make_args(998)))]
        t0 = time.perf_counter()
        for k in range(iters):
            r = fn(*make_args(k))
            _ = [float(np.asarray(x).ravel()[0]) for x in _leaves(r)]
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def _leaves(r):
    import jax

    return jax.tree_util.tree_leaves(r)


def probe_pallas():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== pallas legality/perf ==", flush=True)

    # -- P0: trivial kernel compiles (tunnel probe)
    def k0(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def f0(x):
        return pl.pallas_call(k0, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x).sum()

    bench("P0 trivial kernel", jax.jit(f0), lambda k: (jnp.full((8, 128), float(k)),))

    # -- P1: MXU one-hot word lookup inside a kernel, 3D dot_general variant
    # table: byte-planes (128, 128*4) bf16 (= 16384 words); idx plane (8,128)
    def k1(idx_ref, tab_ref, o_ref):
        idx = idx_ref[:]
        hi = idx >> 7
        lo = idx & 127
        ar = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
        oh_hi = (hi[:, :, None] == ar).astype(jnp.bfloat16)
        tab = tab_ref[:]
        m1 = jax.lax.dot_general(
            oh_hi, tab, (((2,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
        )  # (8, 128, 512)
        m1 = m1.reshape(8, 128, 128, 4)
        oh_lo = (lo[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)).astype(jnp.bfloat16)
        b = (m1 * oh_lo[:, :, :, None]).sum(axis=2).astype(jnp.int32)
        o_ref[:] = b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)

    T = np.arange(16384, dtype=np.uint32)
    tabb = np.zeros((128, 512), np.float32)
    for b in range(4):
        tabb[:, b::4].flat[:] = 0  # fill below
    tb = np.zeros((16384, 4), np.float32)
    for b in range(4):
        tb[:, b] = (T >> (8 * b)) & 0xFF
    tabb = tb.reshape(128, 128 * 4)
    tab_j = jnp.asarray(tabb, jnp.bfloat16)

    def f1(idx, tab):
        out = pl.pallas_call(
            k1,
            grid=(idx.shape[0] // 8,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0)),
                pl.BlockSpec(tab.shape, lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        )(idx, tab)
        return out.sum()

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, 16384, size=(8192, 128), dtype=np.int32)  # 1M lookups
    ok = bench(
        "P1 in-kernel MXU word lookup 1M (16384-word table)",
        jax.jit(f1),
        lambda k: (jnp.asarray((idx_np + k) % 16384), tab_j),
    )

    # -- P2: in-kernel take_along_axis axis=-1 on (1024, 64) rows (fine step)
    def k2(rows_ref, idx_ref, o_ref):
        rows = rows_ref[:]
        idx = idx_ref[:]
        o_ref[:] = jnp.take_along_axis(rows, idx, axis=-1)

    def f2(rows, idx):
        out = pl.pallas_call(
            k2,
            grid=(rows.shape[0] // 1024,),
            in_specs=[
                pl.BlockSpec((1024, 64), lambda i: (i, 0)),
                pl.BlockSpec((1024, 1), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1024, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows.shape[0], 1), jnp.int32),
        )(rows, idx)
        return out.sum()

    rows_np = rng.integers(0, 255, size=(1 << 20, 64), dtype=np.int32)
    idx2 = rng.integers(0, 64, size=(1 << 20, 1), dtype=np.int32)
    bench(
        "P2 in-kernel take_along_axis (1M,64) rows",
        jax.jit(f2),
        lambda k: (jnp.asarray(rows_np), jnp.asarray((idx2 + k) % 64)),
    )

    # -- P3: in-kernel one-hot select over 64 lanes (VPU fine step, rays on sublanes)
    def k3(rows_ref, idx_ref, o_ref):
        rows = rows_ref[:].astype(jnp.float32)
        idx = idx_ref[:]
        ar = jax.lax.broadcasted_iota(jnp.int32, (1024, 64), 1)
        oh = (idx == ar).astype(jnp.float32)
        o_ref[:] = (rows * oh).sum(axis=-1, keepdims=True).astype(jnp.int32)

    def f3(rows, idx):
        out = pl.pallas_call(
            k3,
            grid=(rows.shape[0] // 1024,),
            in_specs=[
                pl.BlockSpec((1024, 64), lambda i: (i, 0)),
                pl.BlockSpec((1024, 1), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1024, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows.shape[0], 1), jnp.int32),
        )(rows, idx)
        return out.sum()

    bench(
        "P3 in-kernel onehot-select (1M,64) rows",
        jax.jit(f3),
        lambda k: (jnp.asarray(rows_np), jnp.asarray((idx2 + k) % 64)),
    )

    # -- P4: full-march-shaped kernel: while_loop with MXU lookup body
    def k4(idx_ref, tab_ref, o_ref):
        def body(c):
            idx, it = c
            hi = idx >> 7
            lo = idx & 127
            ar = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
            oh_hi = (hi[:, :, None] == ar).astype(jnp.bfloat16)
            m1 = jax.lax.dot_general(
                oh_hi, tab_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            ).reshape(8, 128, 128, 4)
            oh_lo = (lo[:, :, None] == ar).astype(jnp.bfloat16)
            b = (m1 * oh_lo[:, :, :, None]).sum(axis=2).astype(jnp.int32)
            w = b[:, :, 0] | (b[:, :, 1] << 8)
            return (idx + w) & 16383, it + 1

        def cond(c):
            return c[1] < 20

        idx, _ = jax.lax.while_loop(cond, body, (idx_ref[:], jnp.zeros((), jnp.int32)))
        o_ref[:] = idx

    def f4(idx, tab):
        out = pl.pallas_call(
            k4,
            grid=(idx.shape[0] // 8,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0)),
                pl.BlockSpec(tab.shape, lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        )(idx, tab)
        return out.sum()

    bench(
        "P4 in-kernel 20-iter while+MXU lookup, 1M rays",
        jax.jit(f4),
        lambda k: (jnp.asarray((idx_np + k) % 16384), tab_j),
    )


def probe_xla():
    import jax
    import jax.numpy as jnp

    print("== xla primitive costs ==", flush=True)
    rng = np.random.default_rng(1)
    N = 1 << 20

    # row gather u8 (131072, 64)
    pool64 = jnp.asarray(rng.integers(0, 255, size=(131072, 64), dtype=np.uint8))
    idxN = rng.integers(0, 131072, size=N, dtype=np.int32)

    def rg(pool, idx):
        return jnp.take(pool, idx, axis=0).astype(jnp.int32).sum()

    bench("X1 row gather u8 (1M x 64B)", jax.jit(rg), lambda k: (pool64, jnp.asarray((idxN + k) % 131072)))

    pool16 = jnp.asarray(rng.integers(0, 255, size=(131072, 16), dtype=np.uint8))
    bench("X2 row gather u8 (1M x 16B)", jax.jit(rg), lambda k: (pool16, jnp.asarray((idxN + k) % 131072)))

    # per-lane u8 gather (current march cost anchor)
    flat = jnp.asarray(rng.integers(0, 255, size=(1 << 23,), dtype=np.uint8))
    idxF = rng.integers(0, 1 << 23, size=N, dtype=np.int32)

    def lg(t, idx):
        return jnp.take(t, idx).astype(jnp.int32).sum()

    bench("X3 lane gather u8 1M (8M table)", jax.jit(lg), lambda k: (flat, jnp.asarray((idxF + k) % (1 << 23))))

    # mxu nibble lookup 1M
    from raytracing_test_tpu.ops import mxu_lookup as mx

    words = rng.integers(0, 2**32, size=16384, dtype=np.uint64).astype(np.uint32)
    tb = jnp.asarray(mx.pack_words_to_bytes_f32(words, 16384))
    nibN = rng.integers(0, 16384 * 8, size=N, dtype=np.int32)

    def nl(tb, idx):
        return mx.mxu_nibble_lookup(tb, idx).sum()

    bench("X4 mxu nibble lookup 1M (16384-word)", jax.jit(nl), lambda k: (tb, jnp.asarray((nibN + k) % (16384 * 8))))

    # sort keys + 4 payloads
    for M, tag in ((1 << 20, "1M"), (1 << 23, "8M")):
        keys = rng.integers(0, 1 << 23, size=M, dtype=np.int32)
        pays = [rng.normal(size=M).astype(np.float32) for _ in range(4)]

        def srt(k_, *ps):
            out = jax.lax.sort([k_] + list(ps), num_keys=1)
            return sum(o.sum() for o in out[1:]) + out[0].sum()

        bench(
            f"X5 sort {tag} keys+4payloads",
            jax.jit(srt),
            lambda k: tuple([jnp.asarray((keys + k) % (1 << 23))] + [jnp.asarray(p) for p in pays]),
        )

    # scatter-add rows
    for M, tag in ((1 << 17, "128K"), (1 << 20, "1M")):
        zidx = rng.integers(0, 1 << 23, size=M, dtype=np.int32)
        upd = rng.normal(size=(M, 4)).astype(np.float32)

        def sc(idx, u):
            z = jnp.zeros((1 << 23, 4), jnp.float32)
            return z.at[idx].add(u).sum()

        bench(
            f"X6 scatter-add {tag} rows -> 8M x4",
            jax.jit(sc),
            lambda k: (jnp.asarray((zidx + k) % (1 << 23)), jnp.asarray(upd)),
        )

    # dynamic-slice box add: 1024 sequential 32^3x4 boxes into 256^3 grid
    def boxadd(grid, offs, boxes):
        def body(i, g):
            o = offs[i]
            return jax.lax.dynamic_update_slice(
                g,
                jax.lax.dynamic_slice(g, (o[0], o[1], o[2], 0), (32, 32, 32, 4)) + boxes[i],
                (o[0], o[1], o[2], 0),
            )

        return jax.lax.fori_loop(0, offs.shape[0], body, grid).sum()

    g0 = jnp.zeros((256, 128, 256, 4), jnp.float32)
    offs = np.stack(
        [rng.integers(0, 224, 256), rng.integers(0, 96, 256), rng.integers(0, 224, 256)], 1
    ).astype(np.int32)
    boxes = rng.normal(size=(256, 32, 32, 32, 4)).astype(np.float32)
    bench(
        "X7 256 sequential 32^3x4 box adds (DUS)",
        jax.jit(boxadd),
        lambda k: (g0, jnp.asarray((offs + k) % 96), jnp.asarray(boxes)),
    )

    # XLA take_along_axis (1M, 64) -> (1M, 1)
    rows = jnp.asarray(rng.integers(0, 255, size=(N, 64), dtype=np.uint8))
    li = rng.integers(0, 64, size=(N, 1), dtype=np.int32)

    def ta(rows, idx):
        return jnp.take_along_axis(rows, idx, axis=-1).astype(jnp.int32).sum()

    bench("X8 XLA take_along_axis (1M,64)", jax.jit(ta), lambda k: (rows, jnp.asarray((li + k) % 64)))

    # one-hot select over 64 (VPU)
    def ohsel(rows, idx):
        oh = (idx == jnp.arange(64, dtype=jnp.int32)[None, :])
        return jnp.where(oh, rows.astype(jnp.int32), 0).sum()

    bench("X9 XLA onehot-select (1M,64)", jax.jit(ohsel), lambda k: (rows, jnp.asarray((li + k) % 64)))

    # MXU splat: per-1024-row subtile factorized box accumulation (bwd design)
    # rows: idx (1024,3) in 32^3 box, g (1024, 4) -> box (32, 32*32, 4) via matmuls
    def splat(ix, iy, iz, g):
        ar = jnp.arange(32, dtype=jnp.int32)
        ohy = (iy[:, None] == ar[None, :]).astype(jnp.bfloat16)
        ohz = (iz[:, None] == ar[None, :]).astype(jnp.bfloat16)
        W = (ohy[:, :, None] * ohz[:, None, :]).reshape(-1, 1024)  # (1024, 1024)
        ohx = (ix[:, None] == ar[None, :]).astype(jnp.bfloat16)
        outs = []
        for c in range(4):
            lhs = ohx * g[:, c : c + 1].astype(jnp.bfloat16)  # (1024, 32)
            outs.append(
                jax.lax.dot_general(
                    lhs, W, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )  # (32, 1024)
        return jnp.stack(outs, -1).sum()

    def splat_many(ixs, iys, izs, gs):
        return jax.vmap(splat)(ixs, iys, izs, gs).sum()

    T_ = 1 << 20  # 1M rows => 1024 subtiles
    ii = rng.integers(0, 32, size=(3, 1024, 1024), dtype=np.int32)
    gg = rng.normal(size=(1024, 1024, 4)).astype(np.float32)
    bench(
        "X10 MXU splat 1M rows (1024 subtiles, 32^3 boxes)",
        jax.jit(splat_many),
        lambda k: (jnp.asarray((ii[0] + k) % 32), jnp.asarray(ii[1]), jnp.asarray(ii[2]), jnp.asarray(gg)),
    )

    # scan overhead: 24-step pure-VPU body at 1M lanes
    def scan24(x):
        def body(c, _):
            return c * 1.000001 + 0.5, None

        y, _ = jax.lax.scan(body, x, None, length=24)
        return y.sum()

    xs = rng.normal(size=(N,)).astype(np.float32)
    bench("X11 24-step scan pure VPU 1M lanes", jax.jit(scan24), lambda k: (jnp.asarray(xs + k),))


if __name__ == "__main__":
    _watchdog()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("pallas", "all"):
        probe_pallas()
    if which in ("xla", "all"):
        probe_xla()
    print("probes done", flush=True)
