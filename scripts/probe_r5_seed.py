"""r05 probe: can COARSE-ONLY seeds replace the full-res seed march?

The headline pays ~135 ms device time for the full-res fused-march seed
pass. Coarse-only seeds (the 1/4-res depth pass min-filtered, the
reference's C11 progressive scheme) cost ~1/16 of that — IF the rays whose
window then fails to capture the surface ("suspects": escaped, or
unsaturated t_end with a finite seed) are few enough for the compact
fallback budget. This measures the suspect fraction per camera, plus the
wall time of the coarse-seeded window forward.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PROBE_r05.txt")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.kernels import fused_march as fm
    from raytracing_test_tpu.kernels import fused_window as fw
    from raytracing_test_tpu.render import diff, progressive
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    ft = fm.tables_for_scene(scene)

    cams = [
        ("bench", [100.0, 60.0, 40.0], [0.55, -0.4, 0.55]),
        ("far", [60.0, 80.0, 200.0], [0.4, -0.5, -0.6]),
        ("low", [200.0, 45.0, 200.0], [-0.6, -0.25, -0.6]),
        ("down", [128.0, 100.0, 128.0], [0.05, -0.95, 0.05]),
    ]
    H = W = 1024
    log(f"== probe_r5_seed {time.strftime('%F %T')}")
    for name, p, d in cams:
        cam = Camera(pos=jnp.asarray(p, jnp.float32),
                     dir=jnp.asarray(d, jnp.float32))
        dirs = ray_directions(cam, W, H)
        rcfg_c = RenderConfig(width=W // 4, height=H // 4,
                              enable_materials=False, enable_shadows=False)
        cdirs = jnp.asarray(
            np.asarray(dirs).reshape(H, W, 3)[2::4, 2::4].reshape(-1, 3))

        def coarse_seed(t):
            _, caux = fm.render_rays_fused(
                scene, ft, cam.pos, cdirs * (1 + 1e-6 * t), rcfg_c,
                interpret=False, image_hw=(H // 4, W // 4))
            ct = jnp.linalg.norm(caux["hit_pos"] - cam.pos[None, :], axis=1)
            depth = jnp.where(caux["hit"], ct, 1e6).reshape(H // 4, W // 4)
            st = progressive.seed_from_depth(depth, 4, H, W)
            return jnp.maximum(st - 3.0, 0.0)

        def stats(t):
            st = jax.lax.stop_gradient(coarse_seed(t))
            _, aux = fw.render_window_fused(
                dscene, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24,
                sky=False, start_t=st, image_hw=(H, W), fallback=False,
                return_aux=True)
            finite = st < diff.MISS_SEED_MIN
            unsat = (aux["t_end"] > 1e-3) & finite
            susp = aux["escaped"] | unsat
            return (susp.sum(), aux["escaped"].sum(), unsat.sum(),
                    finite.sum())

        f = jax.jit(stats)
        t0 = time.perf_counter()
        s, e, u, fin = [int(np.asarray(v)) for v in f(jnp.float32(0))]
        dt0 = time.perf_counter() - t0
        ts = []
        for k in range(2):
            t0 = time.perf_counter()
            [np.asarray(v) for v in f(jnp.float32(k + 1))]
            ts.append(time.perf_counter() - t0)
        log(f"{name}: suspects {s}/{H*W} ({s/(H*W):.4f}) "
            f"[escaped {e}, unsaturated {u}, finite-seeds {fin}] "
            f"coarse-seed+window fwd wall {min(ts)*1e3:.1f} ms "
            f"(compile {dt0:.0f}s)")
    log("== probe_r5_seed done")


if __name__ == "__main__":
    main()
