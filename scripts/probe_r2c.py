"""Round-2 probes, take 3: inputs vary ON-DEVICE via a scalar k (the tunnel
memoizes identical-input executions AND charges host->device transfer per call,
so big fresh arrays per call measure the tunnel, not the op)."""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _watchdog(seconds=560):
    def _fire(signum, frame):
        print("WATCHDOG: device unresponsive", flush=True)
        sys.exit(2)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def bench(name, fn, args, iters=3):
    """fn(k, *args) jitted; k is the per-call variation scalar."""
    import jax
    import jax.numpy as jnp

    try:
        r = fn(jnp.int32(999), *args)
        _ = [float(np.asarray(x).ravel()[0]) for x in jax.tree_util.tree_leaves(r)]
        t0 = time.perf_counter()
        for k in range(iters):
            r = fn(jnp.int32(k), *args)
            _ = [float(np.asarray(x).ravel()[0]) for x in jax.tree_util.tree_leaves(r)]
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N = 1 << 20

    def x0(k, x):
        return (x + k).sum()

    bench("X0 call floor", jax.jit(x0), (jnp.zeros((8, 128)),))

    # row gathers
    pool64 = jnp.asarray(rng.integers(0, 255, size=(131072, 64), dtype=np.uint8))
    pool16 = jnp.asarray(rng.integers(0, 255, size=(131072, 16), dtype=np.uint8))
    idxN = jnp.asarray(rng.integers(0, 131072, size=N, dtype=np.int32))

    def rg(k, pool, idx):
        return jnp.take(pool, (idx + k) % pool.shape[0], axis=0).astype(jnp.int32).sum()

    bench("X1 row gather u8 1M x 64B", jax.jit(rg), (pool64, idxN))
    bench("X2 row gather u8 1M x 16B", jax.jit(rg), (pool16, idxN))

    # lane gather
    flat = jnp.asarray(rng.integers(0, 255, size=(1 << 23,), dtype=np.uint8))
    idxF = jnp.asarray(rng.integers(0, 1 << 23, size=N, dtype=np.int32))

    def lg(k, t, idx):
        return jnp.take(t, (idx + k) % t.shape[0]).astype(jnp.int32).sum()

    bench("X3 lane gather u8 1M (8M table)", jax.jit(lg), (flat, idxF))

    # mxu nibble lookup
    from raytracing_test_tpu.ops import mxu_lookup as mx

    words = rng.integers(0, 2**32, size=16384, dtype=np.uint64).astype(np.uint32)
    tb = jnp.asarray(mx.pack_words_to_bytes_f32(words, 16384))
    nibN = jnp.asarray(rng.integers(0, 16384 * 8, size=N, dtype=np.int32))

    def nl(k, tb, idx):
        return mx.mxu_nibble_lookup(tb, (idx + k) % (16384 * 8)).sum()

    bench("X4 mxu nibble lookup 1M (16K-word)", jax.jit(nl), (tb, nibN))

    # sorts
    for M, tag in ((1 << 20, "1M"), (1 << 23, "8M")):
        keys = jnp.asarray(rng.integers(0, 1 << 23, size=M, dtype=np.int32))
        pays = [jnp.asarray(rng.normal(size=M).astype(np.float32)) for _ in range(4)]

        def srt(k, k_, p0, p1, p2, p3):
            out = jax.lax.sort([(k_ + k) % (1 << 23), p0, p1, p2, p3], num_keys=1)
            return out[0].sum() + out[1].sum()

        bench(f"X5 sort {tag} keys+4payloads", jax.jit(srt), (keys, *pays))

    # scatter-add
    for M, tag in ((1 << 17, "128K"), (1 << 20, "1M")):
        zidx = jnp.asarray(rng.integers(0, 1 << 23, size=M, dtype=np.int32))
        upd = jnp.asarray(rng.normal(size=(M, 4)).astype(np.float32))

        def sc(k, idx, u):
            z = jnp.zeros((1 << 23, 4), jnp.float32)
            return z.at[(idx + k) % (1 << 23)].add(u).sum()

        bench(f"X6 scatter-add {tag} rows -> 8Mx4", jax.jit(sc), (zidx, upd))

    # box adds (bwd merge candidate): 1024 sequential 32^3x4 dynamic-slice adds
    offs = jnp.asarray(
        np.stack([rng.integers(0, 224, 1024), rng.integers(0, 96, 1024), rng.integers(0, 224, 1024)], 1
                 ).astype(np.int32))
    boxes = jnp.asarray(rng.normal(size=(64, 32, 32, 32, 4)).astype(np.float32))

    def boxadd(k, offs, boxes):
        g = jnp.zeros((256, 128, 256, 4), jnp.float32)

        def body(i, g):
            o = (offs[i] + k) % 96
            b = boxes[i % 64]
            cur = jax.lax.dynamic_slice(g, (o[0], o[1], o[2], 0), (32, 32, 32, 4))
            return jax.lax.dynamic_update_slice(g, cur + b, (o[0], o[1], o[2], 0))

        return jax.lax.fori_loop(0, offs.shape[0], body, g).sum()

    bench("X7 1024 sequential 32^3x4 box adds", jax.jit(boxadd), (offs, boxes))

    # take_along_axis + onehot select at (1M, 64)
    rows = jnp.asarray(rng.integers(0, 255, size=(N, 64), dtype=np.uint8))
    li = jnp.asarray(rng.integers(0, 64, size=(N, 1), dtype=np.int32))

    def ta(k, rows, idx):
        return jnp.take_along_axis(rows, (idx + k) % 64, axis=-1).astype(jnp.int32).sum()

    bench("X8 take_along_axis (1M,64)", jax.jit(ta), (rows, li))

    def ohsel(k, rows, idx):
        oh = ((idx + k) % 64) == jnp.arange(64, dtype=jnp.int32)[None, :]
        return jnp.where(oh, rows.astype(jnp.int32), 0).sum()

    bench("X9 onehot-select (1M,64)", jax.jit(ohsel), (rows, li))

    # MXU splat (bwd candidate): 1024 subtiles of 1024 rows -> 32^3 boxes
    ii = jnp.asarray(rng.integers(0, 32, size=(3, 1024, 1024), dtype=np.int32))
    gg = jnp.asarray(rng.normal(size=(1024, 1024, 4)).astype(np.float32))

    def splat_many(k, ii, gg):
        ar = jnp.arange(32, dtype=jnp.int32)

        def one(ix, iy, iz, g):
            ohy = ((iy[:, None] + k) % 32 == ar[None, :]).astype(jnp.bfloat16)
            ohz = (iz[:, None] == ar[None, :]).astype(jnp.bfloat16)
            W = (ohy[:, :, None] * ohz[:, None, :]).reshape(-1, 1024)
            ohx = (ix[:, None] == ar[None, :]).astype(jnp.bfloat16)
            outs = []
            for c in range(4):
                lhs = ohx * g[:, c : c + 1].astype(jnp.bfloat16)
                outs.append(jax.lax.dot_general(
                    lhs, W, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
            return jnp.stack(outs, -1)

        return jax.vmap(one)(ii[0], ii[1], ii[2], gg).sum()

    bench("X10 MXU splat 1M rows (1024x 32^3 boxes)", jax.jit(splat_many), (ii, gg))

    # scan overhead, 24 steps pure VPU at 1M lanes
    xs = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def scan24(k, x):
        def body(c, _):
            return c * 1.000001 + 0.5, None

        y, _ = jax.lax.scan(body, x + k, None, length=24)
        return y.sum()

    bench("X11 24-step scan pure VPU 1M lanes", jax.jit(scan24), (xs,))

    # while_loop iteration overhead at 1M lanes (march-shaped: 14 carries)
    def wl(k, x):
        carats = tuple(x + i for i in range(8))

        def body(c):
            return tuple(v * 1.000001 + 0.1 for v in c[:-1]) + (c[-1] + 1,)

        def cond(c):
            return c[-1] < 50

        out = jax.lax.while_loop(cond, body, carats + (jnp.zeros((), jnp.int32),))
        return out[0].sum()

    bench("X12 50-iter while, 8x 1M-lane carries", jax.jit(wl), (xs,))

    print("probes-c done", flush=True)


if __name__ == "__main__":
    _watchdog()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
