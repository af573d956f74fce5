"""Round-3 on-chip verification + perf stages. STAGED, short, watchdogged
(the tunnel wedges under sustained load — CLAUDE.md). Appends to VERIFY_r03.txt.
Run one stage at a time:  python scripts/verify_r3.py <stage>

  1: fused-kernel PARITY on the chip: fused vs XLA fast at 128^2 across the
     material coverage cases (bad-pixel fractions).
  2: fused-kernel PERF: 512^2 and 1024^2 full-feature (materials+shadows),
     plus the materials/shadows-OFF seed-pass cost at 1024^2.
     Done-criteria anchors: VERDICT item 1 (>= 2x XLA fast, fwd >= 5e6 rays/s).
  3: window fwd+bwd accumulator A/B at 1024^2 x 24 steps with a precomputed
     seed: scatter vs dedup vs splat — the r02 stage-3 measurement that never
     ran (VERDICT items 2 & 5).
  4: comparison rows: XLA fast 512^2 / 1024^2 full-feature (the number the
     fused kernel must beat 2x), bricks-pallas 512^2 (r02 path).
  5: window-forward phase split at 1024^2 x 24 (precomputed seed): crossing
     enumeration alone, + packed-row gather, + compositing — locates the
     767 ms/M wall (PROBE_r03 s1) before the fused fwd+bwd kernel is designed.
"""

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "VERIFY_r03.txt")


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
    from raytracing_test_tpu.kernels import fused_march as fm
    from raytracing_test_tpu.render import diff, fast
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    log(f"== verify_r3 {time.strftime('%F %T')} stages={stages} "
        f"device={jax.devices()[0]}")

    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    ft = fm.tables_for_scene(scene)
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )

    if 1 in stages:
        alarm(560)
        try:
            # 512^2: both engines' executables are shape-cached from the perf
            # stages (the fast path's compaction recursion deepens at SMALL N
            # and its 128^2 compile crashes the remote compile helper)
            R = 512
            rcfg = RenderConfig(width=R, height=R)
            cases = [
                ((100.0, 60.0, 40.0), (0.55, -0.4, 0.55), 0.0),  # terrain
                ((60.0, 30.0, 60.0), (0.7, -0.25, 0.65), 1.2),  # water view
                ((8.0, 36.0, 8.0), (0.9, -0.35, 0.6), 0.5),  # smoke blocks
                ((128.0, 24.0, 128.0), (0.3, 0.45, 0.8), 0.0),  # low, looking up
            ]
            # pos/dirs/t as ARGUMENTS: one executable per engine for all
            # cases (closure constants would recompile per camera and trip
            # the flaky remote compile helper)
            f_fast = jax.jit(lambda p, dirs, t: fast.render_rays_fast(
                scene, p, dirs, rcfg, time_s=t)[0])
            f_fused = jax.jit(lambda p, dirs, t: fm.render_rays_fused(
                scene, ft, p, dirs, rcfg, time_s=t, interpret=False)[0])
            worst = 0.0
            for pos, dirn, ts_ in cases:
                c = Camera(pos=jnp.asarray(pos, jnp.float32),
                           dir=jnp.asarray(dirn, jnp.float32))
                dirs = ray_directions(c, R, R)
                t = jnp.float32(ts_)
                cf = np.asarray(f_fast(c.pos, dirs, t))
                cu = np.asarray(f_fused(c.pos, dirs, t))
                bad = float((np.abs(cf - cu).max(axis=1) > 1e-5).mean())
                worst = max(worst, bad)
                log(f"s1 parity {pos}: bad-pixel frac {bad:.5f}")
            log(f"s1 fused on-chip parity worst bad-pixel frac: {worst:.5f} "
                f"(budget 0.01)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s1 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 2 in stages:
        alarm(560)
        try:
            for R in (512, 1024):
                rcfg = RenderConfig(width=R, height=R)
                dirs = ray_directions(cam, R, R)
                dt = bench(
                    f"s2 fused {R}^2 FULL (materials+shadows)",
                    jax.jit(lambda t, dirs=dirs, rcfg=rcfg: fm.render_rays_fused(
                        scene, ft, cam.pos, dirs * (1 + 1e-6 * t), rcfg, time_s=t,
                        interpret=False, image_hw=(rcfg.height, rcfg.width),
                    )[0].sum()),
                )
                log(f"s2 -> {R*R/dt:.3e} rays/s fused full-feature {R}^2")
            R = 1024
            rcfg_nm = RenderConfig(width=R, height=R, enable_materials=False,
                                   enable_shadows=False)
            dirs = ray_directions(cam, R, R)
            dt = bench(
                "s2 fused 1024^2 materials/shadows OFF (seed pass)",
                jax.jit(lambda t: fm.render_rays_fused(
                    scene, ft, cam.pos, dirs * (1 + 1e-6 * t), rcfg_nm, time_s=t,
                    interpret=False, image_hw=(R, R))[0].sum()),
            )
            log(f"s2 -> {R*R/dt:.3e} rays/s fused seed pass")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 3 in stages:
        alarm(560)
        try:
            H = W = 1024
            NUM_STEPS = 24
            albedo, _, _ = flatten.palette_arrays(pal)
            dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
            dirs = ray_directions(cam, W, H)
            rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                                   enable_shadows=False)
            _, aux = jax.jit(lambda: fm.render_rays_fused(
                scene, ft, cam.pos, dirs, rcfg_nm, interpret=False,
                image_hw=(H, W)))()
            t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
            seed_j = jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)
            seed_j = np.asarray(seed_j)
            seed_j = jnp.asarray(seed_j)

            for accum, emode in (("scatter", "scan"), ("dedup", "scan"),
                                 ("dedup", "vec"), ("splat", "scan"),
                                 ("splat-pallas", "vec")):
                def loss(ds, t, _a=accum, _e=emode):
                    rgb = diff.render_rays_diff_window(
                        ds, cam.pos, dirs * (1 + 1e-6 * t), num_steps=NUM_STEPS,
                        sky=False, start_t=seed_j, accum=_a, enumerate_mode=_e)
                    return jnp.mean(rgb)

                fb = jax.jit(lambda t, _l=loss: jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), jax.grad(_l)(dscene, t), 0.0))
                dt = bench(f"s3 window fwd+bwd [{accum}/{emode}] 1024^2x24", fb)
                log(f"s3 -> {H*W/dt:.3e} rays/s fwd+bwd[{accum}/{emode}] (window only)")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s3 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 4 in stages:
        alarm(560)
        try:
            for R in (512, 1024):
                rcfg = RenderConfig(width=R, height=R)
                dirs = ray_directions(cam, R, R)
                dt = bench(
                    f"s4 XLA fast {R}^2 FULL",
                    jax.jit(lambda t, dirs=dirs, rcfg=rcfg: fast.render_rays_fast(
                        scene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum()),
                )
                log(f"s4 -> {R*R/dt:.3e} rays/s XLA fast {R}^2")
            from raytracing_test_tpu.kernels import brick_kernels as bk

            R = 512
            rcfg = RenderConfig(width=R, height=R)
            dirs = ray_directions(cam, R, R)
            dt = bench(
                "s4 bricks-pallas 512^2 FULL (r02 path)",
                jax.jit(lambda t: bk.render_rays_bricks_pallas(
                    scene, cam.pos, dirs * (1 + 1e-6 * t), rcfg)[0].sum()),
            )
            log(f"s4 -> {R*R/dt:.3e} rays/s bricks-pallas 512^2")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s4 FAILED: {type(e).__name__}: {str(e)[:300]}")

    if 5 in stages:
        alarm(560)
        try:
            H = W = 1024
            S = 24
            albedo, _, _ = flatten.palette_arrays(pal)
            dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
            dirs = ray_directions(cam, W, H)
            rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                                   enable_shadows=False)
            _, aux = jax.jit(lambda: fm.render_rays_fused(
                scene, ft, cam.pos, dirs, rcfg_nm, interpret=False,
                image_hw=(H, W)))()
            t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
            seed_j = jnp.asarray(np.asarray(
                jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)))
            o = jnp.asarray(cam.pos, jnp.float32)
            from raytracing_test_tpu.render.renderer import (
                _build_ray, _init_tmax)

            def prep(t):
                d, step, delta, abs_d = _build_ray(dirs * (1 + 1e-6 * t))
                ob = jnp.broadcast_to(o[None, :], d.shape) + seed_j[:, None] * d
                cell = jnp.floor(ob).astype(jnp.int32)
                tmax = _init_tmax(ob, cell, step, delta, abs_d)
                return ob, d, step, abs_d, cell, tmax

            def enum_only(t):
                ob, d, step, abs_d, cell, tmax = prep(t)
                lin, inside, dt, ax_in = diff._enumerate_window(
                    dscene.density.shape, ob, d, step, abs_d, cell, tmax, S)
                return dt.sum() + lin.sum()

            dt_ = bench("s5 enumerate only 1024^2x24", jax.jit(enum_only))
            log(f"s5 -> enumerate {dt_*1e3:.1f} ms")

            packed = diff._pack_fields(dscene)

            def enum_gather(t):
                ob, d, step, abs_d, cell, tmax = prep(t)
                lin, inside, dt, ax_in = diff._enumerate_window(
                    dscene.density.shape, ob, d, step, abs_d, cell, tmax, S)
                rows = jnp.take(packed, lin.reshape(-1), axis=0)
                return rows.sum() + dt.sum()

            dt_ = bench("s5 enumerate+gather 1024^2x24", jax.jit(enum_gather))
            log(f"s5 -> enumerate+gather {dt_*1e3:.1f} ms")

            def full_fwd(t):
                return diff.render_rays_diff_window(
                    dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    sky=False, start_t=seed_j, accum="scatter").sum()

            dt_ = bench("s5 full window fwd 1024^2x24", jax.jit(full_fwd))
            log(f"s5 -> full window fwd {dt_*1e3:.1f} ms")

            def full_fwd_vec(t):
                return diff.render_rays_diff_window(
                    dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=S,
                    sky=False, start_t=seed_j, accum="scatter",
                    enumerate_mode="vec").sum()

            dt_ = bench("s5 full window fwd VEC 1024^2x24", jax.jit(full_fwd_vec))
            log(f"s5 -> full window fwd (scan-free enumerate) {dt_*1e3:.1f} ms")
        except SystemExit:
            raise
        except Exception as e:
            log(f"s5 FAILED: {type(e).__name__}: {str(e)[:300]}")

    log("== verify_r3 done")


if __name__ == "__main__":
    main()
