"""Round-4 Mosaic-legality micro-probes for the fused window kernel's
constructs. Each probe is tiny and independent so a tunnel compile failure
pinpoints the illegal construct. Appends to PROBE_r04.txt.

  python scripts/probe_r4.py <probe> [<probe> ...]

  1: VMEM+DMA-sem scratch; DMA from an ANY input at STATIC offsets.
  2: DMA offsets computed from an in-kernel scalar reduction (jnp.min) of a
     VMEM input, aligned with & ~7 and clipped.
  3: probe 2 wrapped in @pl.when on a data-dependent scalar bool.
  4: (8,128,1024) one-hot build -> reshape (1024,1024) -> bf16 matmul against
     a VMEM-scratch-derived (1024,128) table (the fetch shape).
  5: lax.cond returning a 4-tuple of (8,128) f32 (the conditional fetch).
  6: input_output_aliases on an ANY output + DMA read-modify-write into it
     at dynamic offsets (the gradient merge).
  7: value reshapes (32,32,128)<->(1024,128) through VMEM scratch.
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PROBE_r04.txt")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def alarm(sec):
    def fire(s, f):
        log(f"WATCHDOG after {sec}s — probe abandoned")
        sys.exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(sec)


def run(name, fn):
    alarm(400)
    t0 = time.perf_counter()
    try:
        v = fn()
        log(f"{name}: OK in {time.perf_counter()-t0:.1f}s (val {v:.4f})")
    except SystemExit:
        raise
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}")
    finally:
        signal.alarm(0)


def main():
    probes = [int(a) for a in sys.argv[1:]] or [1]
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"== probe_r4 {time.strftime('%F %T')} probes={probes} "
        f"device={jax.devices()[0]}")

    F = jnp.arange(64 * 64 * 128, dtype=jnp.float32).reshape(64, 64, 128)
    X = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) % 23)

    if 1 in probes:
        def k(x, f3, o, box, sem):
            dma = pltpu.make_async_copy(
                f3.at[pl.ds(8, 32), pl.ds(16, 32), pl.ds(0, 128)], box, sem)
            dma.start()
            dma.wait()
            o[:] = x[:].astype(jnp.float32) + box[0, 0, 0]

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )(X, F)
            return float(np.asarray(out).sum())

        run("p1 static-offset DMA from ANY", go)

    if 2 in probes:
        def k(x, f3, o, box, sem):
            mn = jnp.min(x[:])
            ox = jnp.clip(mn & ~7, 0, 32)
            dma = pltpu.make_async_copy(
                f3.at[pl.ds(ox, 32), pl.ds(ox, 32), pl.ds(0, 128)], box, sem)
            dma.start()
            dma.wait()
            o[:] = x[:].astype(jnp.float32) + box[0, 0, 0]

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )(X, F)
            return float(np.asarray(out).sum())

        run("p2 scalar-reduction dynamic-offset DMA", go)

    if 3 in probes:
        def k(x, f3, o, box, sem):
            mn = jnp.min(x[:])
            ox = jnp.clip(mn & ~7, 0, 32)
            has = mn < 1000

            @pl.when(has)
            def _():
                dma = pltpu.make_async_copy(
                    f3.at[pl.ds(ox, 32), pl.ds(ox, 32), pl.ds(0, 128)],
                    box, sem)
                dma.start()
                dma.wait()

            o[:] = x[:].astype(jnp.float32) + box[0, 0, 0]

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )(X, F)
            return float(np.asarray(out).sum())

        run("p3 pl.when-guarded DMA", go)

    if 4 in probes:
        def k(x, o, box, sem):
            box2 = box[:].reshape(32 * 32, 128)
            hi = box2.astype(jnp.bfloat16)
            idx = x[:] * 41 % 1024
            ar = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 1024), 2)
            oh = (idx[:, :, None] == ar).astype(jnp.bfloat16).reshape(
                8 * 128, 1024)
            lines = jax.lax.dot_general(
                oh, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(8, 128, 128)
            o[:] = lines.sum(axis=2)

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )(X)
            return float(np.asarray(out).sum())

        run("p4 one-hot reshape matmul vs scratch table", go)

    if 5 in probes:
        def k(x, o):
            has = jnp.min(x[:]) < 1000

            def a(_):
                z = x[:].astype(jnp.float32)
                return z, z + 1, z + 2, z + 3

            def b(_):
                z = jnp.zeros((8, 128), jnp.float32)
                return z, z, z, z

            v0, v1, v2, v3 = jax.lax.cond(has, a, b, 0)
            o[:] = v0 + v1 + v2 + v3

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(X)
            return float(np.asarray(out).sum())

        run("p5 lax.cond 4-tuple", go)

    if 6 in probes:
        def k(x, gin, gout, box, gbox, sem):
            del gin
            mn = jnp.min(x[:])
            ox = jnp.clip(mn & ~7, 0, 32)
            gbox[:] = jnp.float32(1.0) + jnp.zeros((32 * 32, 128), jnp.float32)
            rd = pltpu.make_async_copy(
                gout.at[pl.ds(ox, 32), pl.ds(ox, 32), pl.ds(0, 128)],
                box, sem)
            rd.start()
            rd.wait()
            box[:] = box[:] + gbox[:].reshape(32, 32, 128)
            wr = pltpu.make_async_copy(
                box,
                gout.at[pl.ds(ox, 32), pl.ds(ox, 32), pl.ds(0, 128)],
                sem)
            wr.start()
            wr.wait()

        def go():
            zeros = jnp.zeros((64, 64, 128), jnp.float32)
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct((64, 64, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32),
                                pltpu.VMEM((32 * 32, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA],
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(X, zeros)
            return float(np.asarray(out).sum())

        run("p6 aliased ANY output r/m/w DMA", go)

    if 7 in probes:
        def k(x, o, box):
            box[:] = jnp.zeros((32, 32, 128), jnp.float32) + x[0, 0].astype(
                jnp.float32)
            b2 = box[:].reshape(32 * 32, 128)
            o[:] = b2[: 8, :] + b2.reshape(32, 32, 128)[0, :8, :]

        def go():
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((32, 32, 128), jnp.float32)],
            )(X)
            return float(np.asarray(out).sum())

        run("p7 scratch value reshapes", go)

    log("== probe_r4 done")


if __name__ == "__main__":
    main()
