"""Round-4 on-chip verification + perf stages. STAGED, short, watchdogged
(the tunnel wedges under sustained load — CLAUDE.md). Appends to VERIFY_r04.txt.
Run one stage at a time:  python scripts/verify_r4.py <stage>

  0: fused-window COMPILE PROBE: compile+run the fwd and bwd kernels at
     1024 rays on the default world (cheap Mosaic-legality check through the
     tunnel before any big compile).
  1: fused-window PARITY on the chip: fused window vs XLA window (scatter
     accumulator) at 256^2 x 24 with guided seeds; forward rgb diff, field
     gradient diff, escape fraction.
  2: fused-window PERF at 1024^2 x 24 (precomputed fused seed), KERNEL-ONLY
     (fallback=False): fwd-only and fwd+bwd wall times — the numbers that
     replace VERIFY_r03 s3/s5 (dedup/vec 1379 ms, fwd 414 ms).
  3: same-session comparison rows: dedup/vec window fwd+bwd and window fwd
     (scatter/vec) at 1024^2 x 24 — tunnel-variance-matched baselines.
  4: end-to-end headline composition (what bench.py measures): grad of the
     guided fused-window render incl. the fused seed pass, 1024^2,
     overflow="compact" escape_div=64.
  5: field-gradient parity of the fused window (compact fallback) vs the
     XLA scatter anchor at 1024^2 x 24.
  6: fused-window fwd+bwd WITH the escape fallback (the bench path; also
     warms the persistent compile cache for the driver's bench run).
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "VERIFY_r04.txt")


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
    stages = [int(a) for a in sys.argv[1:]] or [0]
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.kernels import fused_march as fm
    from raytracing_test_tpu.kernels import fused_window as fw
    from raytracing_test_tpu.render import diff
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    log(f"== verify_r4 {time.strftime('%F %T')} stages={stages} "
        f"device={jax.devices()[0]}")

    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )

    def guided_seed(H, W, dirs):
        ft = fm.tables_for_scene(scene)
        rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                               enable_shadows=False)
        _, aux = jax.jit(lambda: fm.render_rays_fused(
            scene, ft, cam.pos, dirs, rcfg_nm, interpret=False,
            image_hw=(H, W)))()
        t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
        return jnp.asarray(np.asarray(
            jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)))

    def fused_seed_graph(t, H, W, dirs, ft, coarse=True):
        """The bench's seed graph: coarse-to-fine fused depth -> guided seed."""
        from raytracing_test_tpu.render import progressive

        rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                               enable_shadows=False)
        st = None
        if coarse:
            rcfg_c = RenderConfig(width=W // 4, height=H // 4,
                                  enable_materials=False,
                                  enable_shadows=False)
            cdirs = jnp.asarray(
                np.asarray(dirs).reshape(H, W, 3)[2::4, 2::4].reshape(-1, 3))
            _, caux = fm.render_rays_fused(
                scene, ft, cam.pos, cdirs * (1 + 1e-6 * t), rcfg_c,
                interpret=False, image_hw=(H // 4, W // 4))
            ct = jnp.linalg.norm(caux["hit_pos"] - cam.pos[None, :], axis=1)
            depth = jnp.where(caux["hit"], ct, 1e6).reshape(H // 4, W // 4)
            st = progressive.seed_from_depth(depth, 4, H, W)
        _, aux = fm.render_rays_fused(
            scene, ft, cam.pos, dirs * (1 + 1e-6 * t), rcfg_nm,
            interpret=False, image_hw=(H, W), start_t=st)
        t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
        return jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)

    if 0 in stages:
        alarm(560)
        try:
            H, W = 8, 128  # one kernel invocation (1024 rays)
            dirs = ray_directions(cam, W, H)
            seed = jnp.zeros(H * W, jnp.float32)
            f = jax.jit(lambda t: fw.render_window_fused(
                dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24,
                start_t=seed, sky=False, interpret=False).sum())
            t0 = time.perf_counter()
            v = float(np.asarray(f(jnp.float32(0))))
            log(f"s0 fwd kernel compiled+ran in {time.perf_counter()-t0:.1f}s "
                f"(sum={v:.4f})")
            g = jax.jit(lambda t: jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(),
                jax.grad(lambda s: fw.render_window_fused(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24,
                    start_t=seed, sky=False, interpret=False).mean())(dscene),
                0.0))
            t0 = time.perf_counter()
            v = float(np.asarray(g(jnp.float32(0))))
            log(f"s0 bwd kernel compiled+ran in {time.perf_counter()-t0:.1f}s "
                f"(gsum={v:.6f})")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s0 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 1 in stages:
        # 1024^2: the XLA anchors are compile-cached from the r03 session at
        # this shape (small-N compiles crash the flaky remote helper)
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            seed = guided_seed(H, W, dirs)
            # kernel-only (fallback=False): the escaped-ray fallback is the
            # SAME XLA code being compared against, and the combined program
            # is a >9-min compile through the flaky tunnel; the fallback path
            # is interpret-verified in tests/test_fused_window.py
            got, aux = jax.jit(lambda: fw.render_window_fused(
                dscene, cam.pos, dirs, num_steps=S, start_t=seed, sky=False,
                interpret=False, image_hw=(H, W), return_aux=True,
                fallback=False))()
            got = np.asarray(got)
            esc_mask = np.asarray(aux["escaped"])
            esc = int(aux["n_escaped"])
            ref = np.asarray(jax.jit(lambda: diff.render_rays_diff_window(
                dscene, cam.pos, dirs, num_steps=S, start_t=seed, sky=False,
                accum="scatter"))())
            keep = ~esc_mask
            d = np.abs(got[keep] - ref[keep])
            err = float(d.max())
            bad = float((d.max(axis=1) > 1e-4).mean())
            log(f"s1 fwd parity 1024^2x24 (non-escaped rays): max abs diff "
                f"{err:.2e}, bad-pixel frac {bad:.5f}; escapes {esc}/{H*W} "
                f"({esc/(H*W):.4f})")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s1 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 5 in stages:
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            seed = guided_seed(H, W, dirs)

            def gtree(fn):
                return jax.jit(jax.grad(
                    lambda s: jnp.mean(fn(s) ** 2)))(dscene)

            g_f = gtree(lambda s: fw.render_window_fused(
                s, cam.pos, dirs, num_steps=S, start_t=seed, sky=False,
                interpret=False, image_hw=(H, W), overflow="compact",
                escape_div=64))
            g_r = gtree(lambda s: diff.render_rays_diff_window(
                s, cam.pos, dirs, num_steps=S, start_t=seed, sky=False,
                accum="scatter"))
            for k in ("density", "albedo"):
                a = np.asarray(getattr(g_f, k))
                b = np.asarray(getattr(g_r, k))
                sc = np.abs(b).max() + 1e-12
                log(f"s5 grad[{k}] rel max diff 1024^2x24: "
                    f"{np.abs(a-b).max()/sc:.2e} (budget 2e-4)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s5 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 2 in stages:
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            seed = guided_seed(H, W, dirs)

            def fwd(t):
                return fw.render_window_fused(
                    dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    start_t=seed, sky=False, interpret=False,
                    image_hw=(H, W), fallback=False).sum()

            dt = bench("s2 fused-window FWD kernel-only 1024^2x24",
                       jax.jit(fwd))
            log(f"s2 -> fused-window fwd {dt*1e3:.1f} ms "
                f"(r03 XLA vec fwd: 414 ms; bar <= 150)")

            def fb(t):
                gr = jax.grad(lambda s: fw.render_window_fused(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    start_t=seed, sky=False, interpret=False,
                    image_hw=(H, W), fallback=False).mean())(dscene)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), gr, 0.0)

            dt = bench("s2 fused-window FWD+BWD kernel-only 1024^2x24",
                       jax.jit(fb))
            log(f"s2 -> fused-window fwd+bwd {dt*1e3:.1f} ms = "
                f"{H*W/dt:.3e} rays/s window-only "
                f"(r03 dedup/vec: 1379 ms = 7.6e5)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 6 in stages:
        # the bench path: fwd+bwd WITH the escape fallback branches (one big
        # program; compile once here so the driver's bench hits the cache)
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            seed = guided_seed(H, W, dirs)

            def fb(t):
                gr = jax.grad(lambda s: fw.render_window_fused(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    start_t=seed, sky=False, interpret=False,
                    image_hw=(H, W), overflow="compact",
                    escape_div=64).mean())(dscene)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), gr, 0.0)

            dt = bench("s6 fused-window FWD+BWD with-fallback 1024^2x24",
                       jax.jit(fb))
            log(f"s6 -> fused-window fwd+bwd+fallback {dt*1e3:.1f} ms = "
                f"{H*W/dt:.3e} rays/s window-only")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 3 in stages:
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            seed = guided_seed(H, W, dirs)

            def fb(t):
                gr = jax.grad(lambda s: diff.render_rays_diff_window(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S, sky=False,
                    start_t=seed, accum="dedup", enumerate_mode="vec").mean())(
                        dscene)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), gr, 0.0)

            dt = bench("s3 window fwd+bwd [dedup/vec] 1024^2x24", jax.jit(fb))
            log(f"s3 -> {H*W/dt:.3e} rays/s fwd+bwd[dedup/vec] (window only)")

            def fwd(t):
                return diff.render_rays_diff_window(
                    dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    sky=False, start_t=seed, accum="scatter",
                    enumerate_mode="vec").sum()

            dt = bench("s3 window fwd [scatter/vec] 1024^2x24", jax.jit(fwd))
            log(f"s3 -> XLA window fwd {dt*1e3:.1f} ms")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s3 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 4 in stages:
        alarm(560)
        try:
            H = W = 1024
            S = 24
            dirs = ray_directions(cam, W, H)
            ft = fm.tables_for_scene(scene)
            rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                                   enable_shadows=False)

            def headline(t):
                seed = jax.lax.stop_gradient(
                    fused_seed_graph(t, H, W, dirs, ft))
                gr = jax.grad(lambda s: fw.render_window_fused(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    start_t=seed, sky=False, interpret=False,
                    image_hw=(H, W), overflow="compact",
                    escape_div=64).mean())(dscene)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), gr, 0.0)

            dt = bench("s4 HEADLINE seed+fused-window fwd+bwd 1024^2",
                       jax.jit(headline))
            log(f"s4 -> {H*W/dt:.3e} rays/s end-to-end fwd+bwd "
                f"(r03 headline 6.04e5; r04 bar >= 1e6, target 2e6)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s4 FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("== verify_r4 done")


if __name__ == "__main__":
    main()
