"""Round-2 on-chip verification + perf, STAGED: each stage is short, has its
own watchdog, and appends to VERIFY_r02.txt immediately — a tunnel wedge
mid-run keeps everything recorded so far (CLAUDE.md: the tunnel wedges under
sustained load). Run stages selectively: python scripts/verify_r2.py 1 2 4

  1: compiled Pallas brick kernels — parity vs fast path + oracle (small)
  2: forward perf 512^2 (fast / bricks XLA / bricks-pallas)
  3: diff window fwd+bwd perf 1024^2 (dedup vs splat accumulators)
  4: forward perf 1024^2 (bricks-pallas, heavy compile — run last)
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "VERIFY_r02.txt")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def alarm(sec):
    def fire(s, f):
        log(f"WATCHDOG after {sec}s — tunnel wedged, stage abandoned")
        sys.exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(sec)


def bench(name, fn, mk, iters=3):
    t0 = time.perf_counter()
    float(np.asarray(fn(mk(99))))
    log(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s")
    ts = []
    for k in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(mk(k))))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4]
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.kernels import brick_kernels as bk
    from raytracing_test_tpu.render import bricks, diff, fast
    from raytracing_test_tpu.render.camera import (
        Camera,
        camera_from_yaw_pitch,
        ray_directions,
    )
    from raytracing_test_tpu.worldgen import terrain

    log(f"== verify_r2 run {time.strftime('%F %T')} stages={stages} "
        f"device={jax.devices()[0]}")

    wgrid, wpal = terrain.gen_world_grid(WorldConfig())
    wscene = flatten.scene_from_grid(wgrid, wpal)
    cam = camera_from_yaw_pitch((100.0, 60.0, 40.0), 55.0, 25.0)

    if 1 in stages:
        alarm(420)
        try:
            sys.path.insert(0, os.path.join(ROOT, "tests"))
            from test_render_parity import CASES, _material_world

            grid, pal = _material_world()
            scene = flatten.scene_from_grid(grid, pal)
            worst = 0.0
            for i, (pos, dirn, t) in enumerate(CASES):
                rcfg = RenderConfig(width=16, height=16, max_steps=150, shadow_steps=40)
                c = Camera(pos=jnp.asarray(pos, jnp.float32),
                           dir=jnp.asarray(dirn, jnp.float32))
                d = ray_directions(c, 16, 16)
                cp, _ = jax.jit(lambda tt: bk.render_rays_bricks_pallas(
                    scene, c.pos, d, rcfg, interpret=False, time_s=tt))(jnp.float32(t))
                cf, _ = jax.jit(lambda tt: fast.render_rays_fast(
                    scene, c.pos, d, rcfg, time_s=tt))(jnp.float32(t))
                bad = (np.abs(np.asarray(cp) - np.asarray(cf)).max(1) > 1e-5).mean()
                worst = max(worst, float(bad))
            log(f"stage1 COMPILED-KERNEL PARITY vs fast (7 material cases): "
                f"worst bad-pixel fraction {worst:.3%} (<=1% required)")
            assert worst <= 0.01
        except SystemExit:
            raise
        except Exception as e:
            log(f"stage1 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 2 in stages:
        alarm(560)
        try:
            R = 512
            rcfg = RenderConfig(width=R, height=R)
            dirs = ray_directions(cam, R, R)
            for name, f in (
                ("fast(XLA enc-grid)", lambda t: fast.render_rays_fast(
                    wscene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum()),
                ("bricks(XLA)", lambda t: bricks.render_rays_bricks(
                    wscene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum()),
                ("bricks-pallas", lambda t: bk.render_rays_bricks_pallas(
                    wscene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum()),
            ):
                jf = jax.jit(f)
                dt = bench(f"stage2 {name} fwd {R}^2", jf, lambda k: jnp.float32(k))
                log(f"stage2 {name} fwd {R}^2: {dt*1e3:.0f} ms -> {R*R/dt:.3e} rays/s")
        except SystemExit:
            raise
        except Exception as e:
            log(f"stage2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 3 in stages:
        alarm(560)
        try:
            H = W = 1024
            albedo, _, _ = flatten.palette_arrays(wpal)
            ds = diff.diff_scene_from_grid(wgrid, albedo, solid_density=50.0)
            dirs = ray_directions(cam, W, H)
            for accum in ("dedup", "splat"):
                def loss(dd, tt, _accum=accum):
                    rgb = diff.render_rays_diff_guided(
                        dd, wscene, cam.pos, dirs * (1 + 1e-6 * tt), num_steps=24,
                        sky=False, image_hw=(H, W), accum=_accum,
                    )
                    return jnp.mean(rgb)

                fb = jax.jit(lambda t, _l=loss: jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(),
                    jax.grad(_l)(ds, t),
                    0.0,
                ))
                dt = bench(f"stage3 window fwd+bwd [{accum}] {H}x{W}", fb,
                           lambda k: jnp.float32(k))
                log(f"stage3 window fwd+bwd [{accum}] {H}x{W}: {dt*1e3:.0f} ms "
                    f"-> {H*W/dt:.3e} rays/s")
        except SystemExit:
            raise
        except Exception as e:
            log(f"stage3 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 4 in stages:
        alarm(560)
        try:
            H = W = 1024
            rcfg = RenderConfig(width=W, height=H)
            dirs = ray_directions(cam, W, H)
            jf = jax.jit(lambda t: bk.render_rays_bricks_pallas(
                wscene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum())
            dt = bench(f"stage4 bricks-pallas fwd {H}x{W}", jf, lambda k: jnp.float32(k))
            log(f"stage4 bricks-pallas fwd full-feature {H}x{W}: {dt*1e3:.0f} ms "
                f"-> {H*W/dt:.3e} rays/s")
        except SystemExit:
            raise
        except Exception as e:
            log(f"stage4 FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("== verify_r2 done")


if __name__ == "__main__":
    main()
