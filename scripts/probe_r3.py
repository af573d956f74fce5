"""Round-3 design probes — STAGED, short, watchdogged (tunnel wedges under
sustained load; see CLAUDE.md). Appends to PROBE_r03.txt. Run stages one at a
time: python scripts/probe_r3.py <stage>

  1: XLA phase split at 1024^2 — hard fwd (materials off / full+progressive),
     window fwd-only, window fwd+bwd [scatter, dedup]  (VERDICT item 5 pt.1)
  2: window fwd+bwd [splat] 1024^2                      (VERDICT item 5 pt.2)
  3: in-kernel Pallas microbenchmarks for the fused-march design:
     one-hot byte lookup at 8KB/64KB tables, u16 meta fetch (16K x 2B),
     row fetch (4096 rows x 128B, ray-subchunked), fine-step VPU cost,
     bulk-advance step cost, pallas_call fixed overhead.
  4: current-path diagnosis: bricks-pallas fwd 512^2 with materials OFF
     (isolates the per-water-voxel glue cost theory).
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


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1]
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.render import diff, fast, progressive
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    log(f"== probe_r3 {time.strftime('%F %T')} stages={stages} "
        f"device={jax.devices()[0]}")

    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    H = W = 1024
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )
    dirs = ray_directions(cam, W, H)
    NUM_STEPS = 24

    if 1 in stages:
        alarm(560)
        try:
            rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                                   enable_shadows=False)
            dt = bench("s1 fast fwd 1024^2 materials/shadows OFF",
                       jax.jit(lambda t: fast.render_rays_fast(
                           scene, cam.pos, dirs * (1 + 1e-6 * t), rcfg_nm)[0].sum()))
            log(f"s1 -> {H*W/dt:.3e} rays/s (the guided hard-seed cost)")

            rcfg = RenderConfig(width=W, height=H)

            def fwd_full(t):
                depth = progressive.coarse_depth(scene, cam, rcfg, 4)
                seeds = progressive.seed_from_depth(depth, 4, H, W)
                col, _ = fast.render_rays_fast(
                    scene, cam.pos, dirs * (1 + 1e-6 * t), rcfg, start_t=seeds)
                return col.sum()

            dt = bench("s1 fast+progressive fwd 1024^2 FULL", jax.jit(fwd_full))
            log(f"s1 -> {H*W/dt:.3e} rays/s (r01 secondary metric path)")

            # precomputed seed isolates the window cost from the hard pass
            _, aux = jax.jit(lambda: fast.render_rays_fast(
                scene, cam.pos, dirs, rcfg_nm))()
            t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
            seed = np.asarray(jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6))
            seed_j = jnp.asarray(seed)

            dt = bench("s1 window fwd-only (scatter) 1024^2x24",
                       jax.jit(lambda t: diff.render_rays_diff_window(
                           dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=NUM_STEPS,
                           sky=False, start_t=seed_j, accum="scatter").sum()))
            log(f"s1 -> {H*W/dt:.3e} rays/s window-forward alone")

            for accum in ("scatter", "dedup"):
                def loss(ds, t, _a=accum):
                    rgb = diff.render_rays_diff_window(
                        ds, cam.pos, dirs * (1 + 1e-6 * t), num_steps=NUM_STEPS,
                        sky=False, start_t=seed_j, accum=_a)
                    return jnp.mean(rgb)

                fb = jax.jit(lambda t, _l=loss: jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), jax.grad(_l)(dscene, t), 0.0))
                dt = bench(f"s1 window fwd+bwd [{accum}] 1024^2x24", fb)
                log(f"s1 -> {H*W/dt:.3e} rays/s fwd+bwd[{accum}] (window only)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s1 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 2 in stages:
        alarm(560)
        try:
            rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                                   enable_shadows=False)
            _, aux = jax.jit(lambda: fast.render_rays_fast(
                scene, cam.pos, dirs, rcfg_nm))()
            t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
            seed_j = jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)

            def loss(ds, t):
                rgb = diff.render_rays_diff_window(
                    ds, cam.pos, dirs * (1 + 1e-6 * t), num_steps=NUM_STEPS,
                    sky=False, start_t=seed_j, accum="splat")
                return jnp.mean(rgb)

            fb = jax.jit(lambda t: jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), jax.grad(loss)(dscene, t), 0.0))
            dt = bench("s2 window fwd+bwd [splat] 1024^2x24", fb)
            log(f"s2 -> {H*W/dt:.3e} rays/s fwd+bwd[splat] (window only)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 3 in stages:
        alarm(560)
        try:
            _stage3(log, bench)
        except SystemExit:
            raise
        except Exception as e:
            log(f"s3 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 5 in stages:
        alarm(560)
        try:
            _stage3(log, bench, skip_l1=True)
        except SystemExit:
            raise
        except Exception as e:
            log(f"s5 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 6 in stages:
        # tile-size scaling of the lookup iteration (intercept amortization)
        alarm(560)
        try:
            _stage6(log, bench)
        except SystemExit:
            raise
        except Exception as e:
            log(f"s6 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 4 in stages:
        alarm(560)
        try:
            from raytracing_test_tpu.kernels import brick_kernels as bk

            R = 512
            d512 = ray_directions(cam, R, R)
            rcfg_nm = RenderConfig(width=R, height=R, enable_materials=False,
                                   enable_shadows=False)
            dt = bench("s4 bricks-pallas fwd 512^2 materials/shadows OFF",
                       jax.jit(lambda t: bk.render_rays_bricks_pallas(
                           scene, cam.pos, d512 * (1 + 1e-6 * t), rcfg_nm)[0].sum()))
            log(f"s4 -> {R*R/dt:.3e} rays/s (vs 4.51e5 full-feature r02: if much "
                f"faster, the water-voxel glue is the killer)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s4 FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("== probe_r3 done")


def _stage3(log, bench, skip_l1=False):
    """In-kernel microbenchmarks: each kernel runs K dependent iterations of
    one primitive over 1M lanes; cost/iter = (t(K1) - t(K0)) / (K1 - K0)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ROWS, LANES = 32, 128
    TILE = ROWS * LANES
    N = 1 << 20  # 1M lanes

    def run_lookup(name, a_dim, b_dim, K0, K1):
        """one-hot byte lookup from an (A, B) table, dependent chain."""
        tab = jnp.asarray(
            np.random.randint(0, 255, (a_dim, b_dim)).astype(np.float32))

        def kern(tab_ref, idx_ref, out_ref, *, K):
            t = tab_ref[:].astype(jnp.bfloat16)
            ar_a = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, a_dim), 2)
            ar_b = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, b_dim), 2)

            def body(i, idx):
                hi = idx // b_dim
                lo = idx % b_dim
                oh = (hi[:, :, None] == ar_a).astype(jnp.bfloat16)
                m1 = jax.lax.dot_general(
                    oh.reshape(ROWS * LANES, a_dim), t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(ROWS, LANES, b_dim)
                byte = jnp.where(lo[:, :, None] == ar_b, m1, 0.0).sum(
                    axis=2, dtype=jnp.float32).astype(jnp.int32)
                return (idx * 3 + byte + i) % (a_dim * b_dim)

            out_ref[:] = jax.lax.fori_loop(0, K, body, idx_ref[:])

        def make(K):
            import functools
            return jax.jit(lambda idx: pl.pallas_call(
                functools.partial(kern, K=K),
                grid=(N // TILE,),
                in_specs=[pl.BlockSpec(tab.shape, lambda i: (0, 0)),
                          pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
            )(tab, idx).sum())

        idx0 = jnp.asarray(
            np.random.randint(0, a_dim * b_dim, (N // LANES, LANES)).astype(np.int32))
        f0, f1 = make(K0), make(K1)
        d0 = bench(f"s3 {name} K={K0}", lambda t: f0(idx0 + t.astype(jnp.int32) % 3))
        d1 = bench(f"s3 {name} K={K1}", lambda t: f1(idx0 + t.astype(jnp.int32) % 3))
        per = (d1 - d0) / (K1 - K0)
        log(f"s3 {name}: {per*1e3:.2f} ms/iter/M-lanes ({a_dim}x{b_dim} table)")
        return per

    if not skip_l1:
        # L1: coarse distance-nibble lookup candidates
        run_lookup("byte-lookup 8KB (64x128)", 64, 128, 1, 9)
        run_lookup("byte-lookup 64KB (256x256)", 256, 256, 1, 9)
        # L3: u16 meta fetch: 16384 entries x 2 bytes = (128 x 256) byte table
        run_lookup("meta-u16 32KB (128x256)", 128, 256, 1, 9)

    # L2: row fetch — 4096 rows x 128 bytes. Decomposed one-hot (A=512,
    # BB=8) + a second "column-gather" matmul (G[j, w] = [j%W == w]) instead of
    # a 4D-reshape select (Mosaic cannot shape-cast (8,128)->(1024,1) or 4D).
    # 8-row tiles keep every intermediate under ~4 MB.
    def run_fetch(K0, K1):
        RT, WB = 4096, 128
        A2, BB = 512, 8
        RF = 8
        TF = RF * LANES
        tab = jnp.asarray(
            np.random.randint(0, 255, (A2, BB * WB)).astype(np.float32))
        g_np = np.zeros((BB * WB, WB), np.float32)
        for j in range(BB * WB):
            g_np[j, j % WB] = 1.0
        G = jnp.asarray(g_np)

        def kern(tab_ref, g_ref, idx_ref, out_ref, *, K):
            t = tab_ref[:].astype(jnp.bfloat16)
            g = g_ref[:].astype(jnp.bfloat16)
            ar_a = jax.lax.broadcasted_iota(jnp.int32, (RF, LANES, A2), 2)
            ar_j = jax.lax.broadcasted_iota(jnp.int32, (RF, LANES, BB * WB), 2)
            bsel = ar_j >> 7  # j // WB

            def body(i, carry):
                idx, acc = carry
                hi = idx // BB
                lo = idx % BB
                oh = (hi[:, :, None] == ar_a).astype(jnp.bfloat16)
                m1 = jax.lax.dot_general(
                    oh.reshape(RF * LANES, A2), t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(RF, LANES, BB * WB)
                masked = jnp.where(
                    lo[:, :, None] == bsel, m1, 0.0).astype(jnp.bfloat16)
                row = jax.lax.dot_general(
                    masked.reshape(RF * LANES, BB * WB), g,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(RF, LANES, WB)
                s = row.sum(axis=2).astype(jnp.int32)
                acc = acc + s
                idx = (idx * 5 + s + i) % RT
                return idx, acc

            idx, acc = jax.lax.fori_loop(
                0, K, body, (idx_ref[:], jnp.zeros((RF, LANES), jnp.int32)))
            out_ref[:] = acc

        def make(K):
            import functools
            return jax.jit(lambda idx: pl.pallas_call(
                functools.partial(kern, K=K),
                grid=(N // TF,),
                in_specs=[pl.BlockSpec(tab.shape, lambda i: (0, 0)),
                          pl.BlockSpec(G.shape, lambda i: (0, 0)),
                          pl.BlockSpec((RF, LANES), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((RF, LANES), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
            )(tab, G, idx).sum())

        idx0 = jnp.asarray(
            np.random.randint(0, RT, (N // LANES, LANES)).astype(np.int32))
        f0, f1 = make(K0), make(K1)
        d0 = bench(f"s3 row-fetch 4096x128B K={K0}",
                   lambda t: f0(idx0 + t.astype(jnp.int32) % 3))
        d1 = bench(f"s3 row-fetch 4096x128B K={K1}",
                   lambda t: f1(idx0 + t.astype(jnp.int32) % 3))
        per = (d1 - d0) / (K1 - K0)
        log(f"s3 row-fetch 4096 rows x 128B (8-row tiles): "
            f"{per*1e3:.2f} ms/fetch/M-lanes, K{K0} total {d0*1e3:.1f} ms/M")

    # L4: fine-step VPU cost — 32-way word select + DDA axis step
    def run_fine(K0, K1):
        def kern(idx_ref, tx_ref, ty_ref, tz_ref, out_ref, *, K):
            words = [idx_ref[:] * (j + 1) for j in range(32)]  # stand-in planes

            def body(i, carry):
                idx, tx, ty, tz, acc = carry
                vox = (idx + i) & 511
                wsel = vox >> 4
                w = jnp.zeros_like(idx)
                for j in range(32):
                    w = jnp.where(wsel == j, words[j], w)
                code = (w >> ((vox & 15) << 1)) & 3
                mx = (tx < ty) & (tx < tz)
                my = ~mx & (ty < tz)
                mz = ~(mx | my)
                tm = jnp.where(mx, tx, jnp.where(my, ty, tz))
                tx = jnp.where(mx, tx + 0.37, tx)
                ty = jnp.where(my, ty + 0.41, ty)
                tz = jnp.where(mz, tz + 0.53, tz)
                acc = acc + code + tm.astype(jnp.int32)
                return idx + code, tx, ty, tz, acc

            idx, tx, ty, tz, acc = jax.lax.fori_loop(
                0, K, body,
                (idx_ref[:], tx_ref[:], ty_ref[:], tz_ref[:],
                 jnp.zeros((ROWS, LANES), jnp.int32)))
            out_ref[:] = acc

        def make(K):
            import functools
            return jax.jit(lambda idx, tx, ty, tz: pl.pallas_call(
                functools.partial(kern, K=K),
                grid=(N // TILE,),
                in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))] * 4,
                out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
            )(idx, tx, ty, tz).sum())

        idx0 = jnp.asarray(
            np.random.randint(0, 512, (N // LANES, LANES)).astype(np.int32))
        t0 = jnp.asarray(np.random.rand(N // LANES, LANES).astype(np.float32))
        f0, f1 = make(K0), make(K1)
        d0 = bench(f"s3 fine-step K={K0}",
                   lambda t: f0(idx0, t0 + t, t0 * 1.1 + t, t0 * 1.3 + t))
        d1 = bench(f"s3 fine-step K={K1}",
                   lambda t: f1(idx0, t0 + t, t0 * 1.1 + t, t0 * 1.3 + t))
        per = (d1 - d0) / (K1 - K0)
        log(f"s3 fine-step (32-word select + DDA): {per*1e3:.3f} ms/step/M-lanes")


    # L6: pallas_call fixed overhead — trivial kernel, 18 ins / 12 outs, 1M lanes
    def run_overhead():
        def kern(*refs):
            ins, outs = refs[:18], refs[18:]
            for j, o in enumerate(outs):
                o[:] = ins[j][:] + 1.0

        arrs = [jnp.asarray(np.random.rand(N // LANES, LANES).astype(np.float32))
                for _ in range(18)]
        f = jax.jit(lambda a0: sum(
            o.sum() for o in pl.pallas_call(
                kern,
                grid=(N // TILE,),
                in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))] * 18,
                out_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))] * 12,
                out_shape=[jax.ShapeDtypeStruct((N // LANES, LANES), jnp.float32)] * 12,
            )(a0, *arrs[1:])))
        dt = bench("s3 pallas_call overhead (18in/12out, 1M lanes)",
                   lambda t: f(arrs[0] + t))
        log(f"s3 pallas invocation floor: {dt*1e3:.2f} ms/M-lanes")

    if skip_l1:
        run_fine(2, 34)
        run_fetch(1, 5)
    else:
        run_fetch(1, 5)
        run_fine(2, 34)
        run_overhead()



def _stage6(log, bench):
    """Lookup iteration + fixed cost at larger tiles (ROWS=128 -> 64 grid
    steps at 1M lanes) — is the 25 ms intercept per-tile overhead?"""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    LANES = 128
    N = 1 << 20
    for ROWS in (128, 256):
        TILE = ROWS * LANES
        a_dim, b_dim = 256, 256
        tab = jnp.asarray(
            np.random.randint(0, 255, (a_dim, b_dim)).astype(np.float32))

        def kern(tab_ref, idx_ref, out_ref, *, K, ROWS=ROWS):
            t = tab_ref[:].astype(jnp.bfloat16)
            ar_a = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, a_dim), 2)
            ar_b = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES, b_dim), 2)

            def body(i, idx):
                hi = idx // b_dim
                lo = idx % b_dim
                oh = (hi[:, :, None] == ar_a).astype(jnp.bfloat16)
                m1 = jax.lax.dot_general(
                    oh.reshape(ROWS * LANES, a_dim), t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(ROWS, LANES, b_dim)
                byte = jnp.where(lo[:, :, None] == ar_b, m1, 0.0).sum(
                    axis=2, dtype=jnp.float32).astype(jnp.int32)
                return (idx * 3 + byte + i) % (a_dim * b_dim)

            out_ref[:] = jax.lax.fori_loop(0, K, body, idx_ref[:])

        def make(K, ROWS=ROWS, TILE=TILE, kern=kern, tab=tab):
            return jax.jit(lambda idx: pl.pallas_call(
                functools.partial(kern, K=K),
                grid=(N // TILE,),
                in_specs=[pl.BlockSpec(tab.shape, lambda i: (0, 0)),
                          pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
            )(tab, idx).sum())

        idx0 = jnp.asarray(
            np.random.randint(0, a_dim * b_dim, (N // LANES, LANES)).astype(np.int32))
        f0, f1 = make(1), make(9)
        d0 = bench(f"s6 lookup 64KB rows={ROWS} K=1",
                   lambda t: f0(idx0 + t.astype(jnp.int32) % 3))
        d1 = bench(f"s6 lookup 64KB rows={ROWS} K=9",
                   lambda t: f1(idx0 + t.astype(jnp.int32) % 3))
        per = (d1 - d0) / 8
        log(f"s6 rows={ROWS}: {per*1e3:.2f} ms/iter/M, intercept {1e3*(d0-per):.1f} ms/M")

if __name__ == "__main__":
    main()
