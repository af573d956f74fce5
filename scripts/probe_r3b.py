"""Fused-kernel lookup-variant microbenchmarks (round 3). Appends PROBE_r03.txt.
Run one stage at a time: python scripts/probe_r3b.py <stage>

  1: per-iteration cost of the meta-style lookup (K=128 one-hot row fetch +
     2 byte selects) at RF=4 / RF=8 / RF=32 row chunks.
  2: multi-pool row fetch (1152x256 B): bank-loop (9 x K=128 matmuls) vs one
     big-K matmul (K=1152), at RF=4 and RF=8.
  3: in-loop lax.cond overhead: big-K lookup under a scalar cond that is
     False every iteration vs True every iteration vs unconditioned.
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PROBE_r03.txt")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def alarm(sec):
    def fire(s, f):
        log(f"WATCHDOG after {sec}s — stage abandoned")
        sys.exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(sec)


def bench(name, fn, iters=3):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(np.asarray(fn(jnp.float32(99))))
    log(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s")
    ts = []
    for k in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(jnp.float32(k))))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log(f"{name}: {dt*1e3:.1f} ms")
    return dt


LANES = 128
N = 1 << 20  # 1M lanes


def _mk_lookup(RF, A, bigk, n_sel, cond_mode=None):
    """Dependent-chain lookup loop kernel builder. Returns make(K) -> jitted fn.

    cond_mode: None = uncond; 'false'/'true' = lax.cond with that predicate."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    tab = jnp.asarray(
        np.random.randint(0, 255, (A, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    TILE = 32 * LANES  # fixed 4096-lane tiles like the fused kernel

    def row_m1(tab, row_idx):
        if bigk:
            ar = jax.lax.broadcasted_iota(jnp.int32, (RF, LANES, A), 2)
            oh = (row_idx[:, :, None] == ar).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh.reshape(RF * LANES, A), tab, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(RF, LANES, 256)
        ar = jax.lax.broadcasted_iota(jnp.int32, (RF, LANES, 128), 2)
        m1 = jnp.zeros((RF, LANES, 256), jnp.float32)
        for k in range(A // 128):
            oh = ((row_idx - k * 128)[:, :, None] == ar).astype(jnp.bfloat16)
            m1 = m1 + jax.lax.dot_general(
                oh.reshape(RF * LANES, 128), tab[k * 128:(k + 1) * 128],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(RF, LANES, 256)
        return m1

    def chunk(tab, idx):
        ar256 = jax.lax.broadcasted_iota(jnp.int32, (RF, LANES, 256), 2)
        byte = idx  # byte index in [0, A*256)

        def do(_):
            m1 = row_m1(tab, byte >> 8)
            b = 0
            for s in range(n_sel):
                col = (byte + s) & 255
                b = b + (jnp.where(col[:, :, None] == ar256, m1, 0.0)
                         .sum(axis=2, dtype=jnp.float32).astype(jnp.int32))
            return b

        if cond_mode is None:
            return do(0)
        pred = jnp.any(idx < 0) if cond_mode == "false" else jnp.any(idx >= 0)
        return jax.lax.cond(pred, do, lambda _: jnp.zeros((RF, LANES), jnp.int32), 0)

    def kern(tab_ref, idx_ref, out_ref, *, K):
        def body(i, idx):
            outs = []
            for c in range(32 // RF):
                sl = slice(c * RF, (c + 1) * RF)
                outs.append(chunk(tab_ref[:], idx[sl]))
            b = jnp.concatenate(outs, axis=0)
            return (idx * 3 + b + i) % (A * 256)

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx_ref[:])

    def make(K):
        return jax.jit(lambda idx: pl.pallas_call(
            functools.partial(kern, K=K),
            grid=(N // TILE,),
            in_specs=[pl.BlockSpec(tab.shape, lambda i: (0, 0)),
                      pl.BlockSpec((32, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((32, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
        )(tab, idx).sum())

    idx0 = jnp.asarray(
        np.random.randint(0, A * 256, (N // LANES, LANES)).astype(np.int32))
    return make, idx0


def run_pair(name, RF, A, bigk, n_sel, K0, K1, cond_mode=None):
    import jax.numpy as jnp

    make, idx0 = _mk_lookup(RF, A, bigk, n_sel, cond_mode)
    f0, f1 = make(K0), make(K1)
    d0 = bench(f"{name} K={K0}", lambda t: f0(idx0 + t.astype(jnp.int32) % 3))
    d1 = bench(f"{name} K={K1}", lambda t: f1(idx0 + t.astype(jnp.int32) % 3))
    per = (d1 - d0) / (K1 - K0)
    log(f"{name}: {per*1e3:.2f} ms/iter/M-lanes (intercept {1e3*(d0-per*K0):.1f})")
    return per


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1]
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"== probe_r3b {time.strftime('%F %T')} stages={stages} "
        f"device={jax.devices()[0]}")

    if 1 in stages:
        alarm(560)
        try:
            run_pair("p1 meta RF=4 (K128, 2sel)", 4, 128, False, 2, 1, 9)
            run_pair("p1 meta RF=8 (K128, 2sel)", 8, 128, False, 2, 1, 9)
            run_pair("p1 meta RF=32 (K128, 2sel)", 32, 128, False, 2, 1, 9)
        except SystemExit:
            raise
        except Exception as e:
            log(f"p1 FAILED: {type(e).__name__}: {str(e)[:250]}")

    if 2 in stages:
        alarm(560)
        try:
            run_pair("p2 multi RF=4 banks (9xK128)", 4, 1152, False, 1, 1, 5)
            run_pair("p2 multi RF=4 bigK (K1152)", 4, 1152, True, 1, 1, 5)
            run_pair("p2 multi RF=8 bigK (K1152)", 8, 1152, True, 1, 1, 5)
        except SystemExit:
            raise
        except Exception as e:
            log(f"p2 FAILED: {type(e).__name__}: {str(e)[:250]}")

    if 3 in stages:
        alarm(560)
        try:
            run_pair("p3 bigK cond=False", 4, 1152, True, 1, 1, 9, "false")
            run_pair("p3 bigK cond=True", 4, 1152, True, 1, 1, 9, "true")
        except SystemExit:
            raise
        except Exception as e:
            log(f"p3 FAILED: {type(e).__name__}: {str(e)[:250]}")

    log("== probe_r3b done")


if __name__ == "__main__":
    main()
