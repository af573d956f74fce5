"""Round-5 on-chip verification + perf stages. STAGED, short, watchdogged
(the tunnel wedges under sustained load — CLAUDE.md). Appends to VERIFY_r05.txt.
Run one stage at a time:  python scripts/verify_r5.py <stage>

Tunnel-500 retries are ANNOTATED (VERDICT r04 weak #6): a failed attempt that
is retried logs an explicit RETRY line instead of certifying numbers between
raw crash lines.

  0: COMPILE PROBE: fwd + bwd window kernels at 1024 rays (unshaded AND
     shaded variants) — cheap Mosaic-legality check before any big compile.
  1: fused-window fwd PARITY + escape rate at 1024^2 x 24 vs the XLA
     scatter anchor (kernel-only, non-escaped rays).
  2: fused-window PERF at 1024^2 x 24, KERNEL-ONLY: fwd and fwd+bwd wall
     times. r05 bars: fwd <= 120 ms (r04: 182), fwd+bwd <= 250 ms (r04: 423).
  3: HEADLINE end-to-end: fused seed (coarse) + fused window fwd+bwd with
     compact fallback (escape_div=64). r05 bar >= 2.5e6 rays/s (r04: 1.615e6).
  4: fallback delta: fwd+bwd with-fallback minus kernel-only.
     r05 bar: delta <= 60 ms (r04: ~190 ms).
  5: field-gradient parity (compact fallback) vs the XLA scatter anchor at
     1024^2 x 24 (budget 2e-4 rel).
  6: escape rate at 4 extra cameras (the r04 budget was tuned at ONE).
  7: SHADED window perf + parity at 1024^2 (shading=True end to end).
  8: pose-gradient parity on-chip at 256^2 (grad w.r.t. dirs, fused vs
     scatter anchor).
  9: seed-pass (fused march) timing at 1024^2, coarse-seeded.
 10: margin experiment: window fwd / fwd+bwd kernel-only with margin=1.0
     exact-hit seeds (tighter seeds -> earlier saturation -> more
     early-out) vs s2's margin=3.0 numbers.
 11: prox-seed pass timing at 1024^2 + miss ("need"-patch) rates at the
     bench camera and 2 oblique cameras (prox stops at surface-brick
     ENTRY; grazes + escapes get the exact compacted patch).
 12: PROX HEADLINE end-to-end (render_rays_guided_prox fwd+bwd) + parity
     spot-check vs the exact-seed pipeline at 512^2.
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "VERIFY_r05.txt")


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


def run_stage(name, fn, budget=560, retries=1):
    """Run a stage; annotate tunnel-500 retries explicitly (weak #6)."""
    for attempt in range(retries + 1):
        alarm(budget)
        try:
            fn()
            signal.alarm(0)
            return
        except SystemExit:
            raise
        except Exception as e:
            signal.alarm(0)
            s = f"{type(e).__name__}: {str(e)[:300]}"
            tunnel = "500" in s or "remote_compile" in s
            if tunnel and attempt < retries:
                log(f"== {name} RETRY after tunnel 500 (attempt "
                    f"{attempt + 1} failed; not a kernel error) ==")
                time.sleep(20)
                continue
            log(f"{name} FAILED: {s}")
            return


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

    log(f"== verify_r5 {time.strftime('%F %T')} stages={stages} "
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

    def guided_seed(H, W, dirs, c=cam, margin=3.0):
        ft = fm.tables_for_scene(scene)
        rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                               enable_shadows=False)
        _, aux = jax.jit(lambda: fm.render_rays_fused(
            scene, ft, c.pos, dirs, rcfg_nm, interpret=False,
            image_hw=(H, W)))()
        t_hit = jnp.linalg.norm(aux["hit_pos"] - c.pos[None, :], axis=1)
        return jnp.asarray(np.asarray(
            jnp.where(aux["hit"], jnp.maximum(t_hit - margin, 0.0), 1e6)))

    def fused_seed_graph(t, H, W, dirs, ft):
        return fm.seed_depth_fused(
            scene, ft, cam.pos, dirs, (H, W), margin=3.0, prox=False,
            time_jitter=t, interpret=False)

    def s0():
        H, W = 8, 128
        dirs = ray_directions(cam, W, H)
        seed = jnp.zeros(H * W, jnp.float32)
        for shading in (False, True):
            tag = "shaded" if shading else "unshaded"
            f = jax.jit(lambda t, sh=shading: fw.render_window_fused(
                dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24,
                start_t=seed, sky=False, interpret=False, shading=sh,
                fallback=False).sum())
            t0 = time.perf_counter()
            v = float(np.asarray(f(jnp.float32(0))))
            log(f"s0 fwd[{tag}] compiled+ran {time.perf_counter()-t0:.1f}s "
                f"(sum={v:.4f})")
            g = jax.jit(lambda t, sh=shading: jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(),
                jax.grad(lambda s: fw.render_window_fused(
                    s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24,
                    start_t=seed, sky=False, interpret=False, shading=sh,
                    fallback=False).mean())(dscene), 0.0))
            t0 = time.perf_counter()
            v = float(np.asarray(g(jnp.float32(0))))
            log(f"s0 bwd[{tag}] compiled+ran {time.perf_counter()-t0:.1f}s "
                f"(gsum={v:.6f})")

    def s1():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)
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
        log(f"s1 fwd parity 1024^2x24 (non-escaped): max abs diff "
            f"{d.max():.2e}, bad-pixel frac {(d.max(axis=1) > 1e-4).mean():.5f}; "
            f"escapes {esc}/{H*W} ({esc/(H*W):.4f})")

    def s2():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)

        def fwd(t):
            return fw.render_window_fused(
                dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), fallback=False).sum()

        dt = bench("s2 fused-window FWD kernel-only 1024^2x24", jax.jit(fwd))
        log(f"s2 -> fused-window fwd {dt*1e3:.1f} ms (r04: 182; bar <= 120)")

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
            f"{H*W/dt:.3e} rays/s window-only (r04: 423; bar <= 250)")

    def s3():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        ft = fm.tables_for_scene(scene)

        def headline(t):
            seed = jax.lax.stop_gradient(fused_seed_graph(t, H, W, dirs, ft))
            gr = jax.grad(lambda s: fw.render_window_fused(
                s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), overflow="compact",
                escape_div=64).mean())(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        dt = bench("s3 HEADLINE seed+fused-window fwd+bwd 1024^2",
                   jax.jit(headline))
        log(f"s3 -> {H*W/dt:.3e} rays/s end-to-end fwd+bwd "
            f"(r04: 1.615e6; r05 bar >= 2.5e6)")

    def s4():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)

        def fb_k(t):
            gr = jax.grad(lambda s: fw.render_window_fused(
                s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), fallback=False).mean())(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        def fb_f(t):
            gr = jax.grad(lambda s: fw.render_window_fused(
                s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), overflow="compact",
                escape_div=64).mean())(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        d0 = bench("s4 fwd+bwd kernel-only", jax.jit(fb_k))
        d1 = bench("s4 fwd+bwd with-fallback", jax.jit(fb_f))
        log(f"s4 -> fallback delta {1e3*(d1-d0):.1f} ms "
            f"(r04: ~190; bar <= 60)")

    def s5():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)

        def gtree(fn):
            return jax.jit(jax.grad(lambda s: jnp.mean(fn(s) ** 2)))(dscene)

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

    def s6():
        H = W = 512
        cams = [
            Camera(pos=jnp.asarray(p, jnp.float32),
                   dir=jnp.asarray(d, jnp.float32))
            for p, d in [
                ([60.0, 80.0, 200.0], [0.4, -0.5, -0.6]),
                ([200.0, 45.0, 200.0], [-0.6, -0.25, -0.6]),
                ([128.0, 100.0, 128.0], [0.05, -0.95, 0.05]),
                ([30.0, 40.0, 30.0], [0.7, -0.1, 0.7]),
            ]
        ]
        for i, c in enumerate(cams):
            dirs = ray_directions(c, W, H)
            seed = guided_seed(H, W, dirs, c)
            _, aux = jax.jit(lambda c=c, dirs=dirs, seed=seed:
                             fw.render_window_fused(
                dscene, c.pos, dirs, num_steps=24, start_t=seed, sky=False,
                interpret=False, image_hw=(H, W), return_aux=True,
                fallback=False))()
            n = int(aux["n_escaped"])
            log(f"s6 cam{i} escapes {n}/{H*W} ({n/(H*W):.4f}) "
                f"[budget N/64 = {H*W//64}]")

    def s7():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)

        def fb(t):
            gr = jax.grad(lambda s: fw.render_window_fused(
                s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False, shading=True,
                image_hw=(H, W), fallback=False).mean())(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        dt = bench("s7 SHADED fused-window fwd+bwd kernel-only 1024^2x24",
                   jax.jit(fb))
        log(f"s7 -> shaded fwd+bwd {dt*1e3:.1f} ms = {H*W/dt:.3e} rays/s")
        # parity spot check at 512^2
        H2 = W2 = 512
        d2 = ray_directions(cam, W2, H2)
        s2_ = guided_seed(H2, W2, d2)
        got, aux = jax.jit(lambda: fw.render_window_fused(
            dscene, cam.pos, d2, num_steps=S, start_t=s2_, sky=False,
            shading=True, interpret=False, image_hw=(H2, W2),
            return_aux=True, fallback=False))()
        ref = np.asarray(jax.jit(lambda: diff.render_rays_diff_window(
            dscene, cam.pos, d2, num_steps=S, start_t=s2_, sky=False,
            accum="scatter", shading=True))())
        keep = ~np.asarray(aux["escaped"])
        dd = np.abs(np.asarray(got)[keep] - ref[keep])
        log(f"s7 shaded parity 512^2 (non-escaped): max {dd.max():.2e}, "
            f"bad frac {(dd.max(axis=1) > 1e-4).mean():.5f}")

    def s8():
        H = W = 256
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs)
        # pose grads are per-ray; escaped rays' kernel cotangents are zero
        # BY CONTRACT with fallback=False (they flow via the fallback in
        # real use) — compare non-escaped rays only
        _, aux = jax.jit(lambda: fw.render_window_fused(
            dscene, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=False, fallback=False, return_aux=True))()
        keep = ~np.asarray(aux["escaped"])

        def gdirs(render):
            return np.asarray(jax.jit(jax.grad(
                lambda d: jnp.mean(render(d) ** 2)))(dirs))

        g_f = gdirs(lambda d: fw.render_window_fused(
            dscene, cam.pos, d, num_steps=24, start_t=seed, sky=False,
            interpret=False, fallback=False))
        g_r = gdirs(lambda d: diff.render_rays_diff_window(
            dscene, cam.pos, d, num_steps=24, start_t=seed, sky=False,
            accum="scatter"))
        sc = np.abs(g_r[keep]).max() + 1e-12
        diffm = np.abs(g_f - g_r).max(axis=1)
        bad = (diffm[keep] / sc > 2e-4).mean()
        log(f"s8 pose grad (d rgb/d dirs) 256^2, non-escaped "
            f"({int(keep.sum())}/{keep.size}): rel max diff "
            f"{diffm[keep].max()/sc:.2e}, bad-ray frac {bad:.5f} "
            f"(escaped excluded: {int((~keep).sum())})")

    def s9():
        H = W = 1024
        dirs = ray_directions(cam, W, H)
        ft = fm.tables_for_scene(scene)

        def seedf(t):
            return fused_seed_graph(t, H, W, dirs, ft).sum()

        dt = bench("s9 fused seed pass (coarse-seeded) 1024^2",
                   jax.jit(seedf))
        log(f"s9 -> seed pass {dt*1e3:.1f} ms (r04: 156)")

    def s10():
        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        seed = guided_seed(H, W, dirs, margin=1.0)

        def fwd(t):
            return fw.render_window_fused(
                dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), fallback=False).sum()

        dt = bench("s10 window FWD kernel-only, margin=1.0 seeds", jax.jit(fwd))
        log(f"s10 -> fwd {dt*1e3:.1f} ms (margin=3.0 ref: s2 ~151-160)")

        def fb(t):
            gr = jax.grad(lambda s: fw.render_window_fused(
                s, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                start_t=seed, sky=False, interpret=False,
                image_hw=(H, W), fallback=False).mean())(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        dt = bench("s10 window FWD+BWD kernel-only, margin=1.0 seeds",
                   jax.jit(fb))
        log(f"s10 -> fwd+bwd {dt*1e3:.1f} ms (margin=3.0 ref: s2 ~296-331)")

    def s11():
        H = W = 1024
        dirs = ray_directions(cam, W, H)
        ft = fm.tables_for_scene(scene)

        def seedp(t):
            return fm.seed_depth_fused(
                scene, ft, cam.pos, dirs, (H, W), margin=0.5, prox=True,
                time_jitter=t, interpret=False).sum()

        dt = bench("s11 PROX seed pass 1024^2", jax.jit(seedp))
        log(f"s11 -> prox seed {dt*1e3:.1f} ms (exact-hit seed: s9 ~155)")

        # miss ("need") rates: bench camera + 2 obliques at 512^2
        H2 = W2 = 512
        cams = [cam,
                Camera(pos=jnp.asarray([200.0, 45.0, 200.0], jnp.float32),
                       dir=jnp.asarray([-0.6, -0.25, -0.6], jnp.float32)),
                Camera(pos=jnp.asarray([30.0, 40.0, 30.0], jnp.float32),
                       dir=jnp.asarray([0.7, -0.1, 0.7], jnp.float32))]
        for i, c in enumerate(cams):
            d2 = ray_directions(c, W2, H2)

            def needf(c=c, d2=d2):
                seed = fm.seed_depth_fused(
                    scene, ft, c.pos, d2, (H2, W2), margin=0.5, prox=True,
                    interpret=False)
                _, waux = fw.render_window_fused(
                    dscene, c.pos, d2, num_steps=24, start_t=seed,
                    sky=False, interpret=False, image_hw=(H2, W2),
                    fallback=False, return_aux=True)
                from raytracing_test_tpu.render.diff import MISS_SEED_MIN
                dead = seed >= MISS_SEED_MIN
                need = (waux["escaped"] | (waux["t_end"] > 1e-3)) & ~dead
                return need.sum(), waux["n_escaped"]

            n, ne = jax.jit(needf)()
            n, ne = int(n), int(ne)
            log(f"s11 cam{i} need {n}/{H2*W2} ({n/(H2*W2):.4f}) "
                f"[escaped {ne}; patch budget N/64 = {H2*W2//64}]")

    def s12():
        from raytracing_test_tpu.render.diff import render_rays_guided_prox

        H = W = 1024
        S = 24
        dirs = ray_directions(cam, W, H)
        ft = fm.tables_for_scene(scene)

        def headline(t):
            gr = jax.grad(lambda s: jnp.mean(render_rays_guided_prox(
                s, scene, ft, cam.pos, dirs * (1 + 1e-6 * t), (H, W),
                num_steps=S, margin=0.5, patch_div=64,
                interpret=False)))(dscene)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), gr, 0.0)

        dt = bench("s12 PROX HEADLINE fwd+bwd 1024^2", jax.jit(headline))
        log(f"s12 -> {H*W/dt:.3e} rays/s end-to-end fwd+bwd "
            f"(s3 exact-seed: 2.121e6; r05 bar >= 2.5e6)")

        # parity spot check vs the exact-seed pipeline at 512^2
        H2 = W2 = 512
        d2 = ray_directions(cam, W2, H2)
        got, paux = jax.jit(lambda: render_rays_guided_prox(
            dscene, scene, ft, cam.pos, d2, (H2, W2), num_steps=S,
            margin=0.5, patch_div=64, interpret=False, return_aux=True))()
        s2_ = guided_seed(H2, W2, d2)
        ref = np.asarray(jax.jit(lambda: diff.render_rays_diff_window(
            dscene, cam.pos, d2, num_steps=S, start_t=s2_, sky=False,
            accum="scatter"))())
        dd = np.abs(np.asarray(got) - ref).max(axis=1)
        log(f"s12 prox parity 512^2 vs exact-seed anchor: max {dd.max():.2e}, "
            f"bad frac {(dd > 2e-3).mean():.5f}; need {int(paux['n_need'])}, "
            f"escaped {int(paux['n_escaped'])}, dropped "
            f"{bool(paux['grads_dropped'])}")

    table = {0: s0, 1: s1, 2: s2, 3: s3, 4: s4, 5: s5, 6: s6, 7: s7,
             8: s8, 9: s9, 10: s10, 11: s11, 12: s12}
    for st in stages:
        run_stage(f"s{st}", table[st])
    log("== verify_r5 done")


if __name__ == "__main__":
    main()
