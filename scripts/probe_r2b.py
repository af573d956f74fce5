"""Round-2 probes, take 2: fixed matmul acc dtype, lane-friendly layouts,
call-overhead baseline."""

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
    import jax

    try:
        r = fn(*make_args(999))
        _ = [float(np.asarray(x).ravel()[0]) for x in jax.tree_util.tree_leaves(r)]
        t0 = time.perf_counter()
        for k in range(iters):
            r = fn(*make_args(k))
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
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)

    # -- X0: trivial XLA call (tunnel round-trip floor)
    def x0(x):
        return x.sum()

    bench("X0 trivial XLA call floor", jax.jit(x0), lambda k: (jnp.full((8, 128), float(k)),))

    # -- P1b: in-kernel byte lookup via one-hot dot, f32 acc
    # table (128, 128) f32 byte values; idx (8,128) in [0, 16384)
    def k1(idx_ref, tab_ref, o_ref):
        idx = idx_ref[:]
        hi = idx >> 7
        lo = idx & 127
        ar = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
        oh_hi = (hi[:, :, None] == ar).astype(jnp.bfloat16)
        m1 = jax.lax.dot_general(
            oh_hi, tab_ref[:].astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8,128,128) f32
        oh_lo = (lo[:, :, None] == ar)
        o_ref[:] = jnp.where(oh_lo, m1, 0.0).sum(axis=2).astype(jnp.int32)

    tab_np = rng.integers(0, 255, size=(128, 128)).astype(np.float32)
    tab_j = jnp.asarray(tab_np)

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

    idx_np = rng.integers(0, 16384, size=(8192, 128), dtype=np.int32)
    bench("P1b in-kernel byte lookup 1M (16K table)", jax.jit(f1),
          lambda k: (jnp.asarray((idx_np + k) % 16384), tab_j))

    # -- P4b: 20-iteration in-kernel march-shaped loop with the byte lookup
    def k4(idx_ref, tab_ref, o_ref):
        tab = tab_ref[:].astype(jnp.bfloat16)
        ar = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)

        def body(c):
            idx, it = c
            oh_hi = ((idx >> 7)[:, :, None] == ar).astype(jnp.bfloat16)
            m1 = jax.lax.dot_general(
                oh_hi, tab, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            v = jnp.where((idx & 127)[:, :, None] == ar, m1, 0.0).sum(axis=2).astype(jnp.int32)
            return (idx + v + 1) & 16383, it + 1

        idx, _ = jax.lax.while_loop(lambda c: c[1] < 20, body, (idx_ref[:], jnp.zeros((), jnp.int32)))
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

    bench("P4b in-kernel 20-iter while+byte lookup 1M", jax.jit(f4),
          lambda k: (jnp.asarray((idx_np + k) % 16384), tab_j))

    # bigger ray blocks per grid step: (64,128) = 8K rays/tile
    def k4w(idx_ref, tab_ref, o_ref):
        tab = tab_ref[:].astype(jnp.bfloat16)
        R = 64
        ar = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)

        def body(c):
            idx, it = c
            oh_hi = ((idx >> 7)[:, :, None] == ar).astype(jnp.bfloat16)
            m1 = jax.lax.dot_general(
                oh_hi, tab, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            v = jnp.where((idx & 127)[:, :, None] == ar, m1, 0.0).sum(axis=2).astype(jnp.int32)
            return (idx + v + 1) & 16383, it + 1

        idx, _ = jax.lax.while_loop(lambda c: c[1] < 20, body, (idx_ref[:], jnp.zeros((), jnp.int32)))
        o_ref[:] = idx

    def f4w(idx, tab):
        out = pl.pallas_call(
            k4w,
            grid=(idx.shape[0] // 64,),
            in_specs=[
                pl.BlockSpec((64, 128), lambda i: (i, 0)),
                pl.BlockSpec(tab.shape, lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        )(idx, tab)
        return out.sum()

    bench("P4w same, (64,128) ray tiles", jax.jit(f4w),
          lambda k: (jnp.asarray((idx_np + k) % 16384), tab_j))

    # -- P2b: in-kernel take_along_axis (8,128) rows, idx per sublane, out (8,128)
    def k2(rows_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(rows_ref[:], idx_ref[:], axis=-1)

    def f2(rows, idx):
        out = pl.pallas_call(
            k2,
            grid=(rows.shape[0] // 256,),
            in_specs=[
                pl.BlockSpec((256, 128), lambda i: (i, 0)),
                pl.BlockSpec((256, 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(rows.shape, jnp.int32),
        )(rows, idx)
        return out.sum()

    rows_np = rng.integers(0, 255, size=(1 << 20, 128), dtype=np.int32)
    idx2 = rng.integers(0, 128, size=(1 << 20, 1), dtype=np.int32)
    idx2b = np.broadcast_to(idx2, (1 << 20, 128)).copy()
    bench("P2b in-kernel take_along_axis (1M,128) rows", jax.jit(f2),
          lambda k: (jnp.asarray(rows_np), jnp.asarray((idx2b + k) % 128)))

    print("probes-b done", flush=True)


if __name__ == "__main__":
    _watchdog()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    main()
