"""On-chip verification: oracle <-> TPU parity + honest throughput numbers.

The pytest suite runs on CPU (8 virtual devices); this script is the
real-hardware leg of the BASELINE correctness matrix ("allclose at 1 chip"):
renders the material-coverage scenes ON THE TPU and compares against the CPU
oracle, then measures fast-path and diff-path throughput with the
backend-safe timing protocol (varied inputs + forced materialization).

Run: python scripts/verify_on_tpu.py [--res 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--skip-perf", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache — recompiles of these big programs are slow
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dev = jax.devices()[0]
    print(f"device: {dev}")

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.oracle import cpu_renderer as oracle
    from raytracing_test_tpu.render import diff, fast, renderer
    from raytracing_test_tpu.render.camera import Camera
    from raytracing_test_tpu.worldgen import terrain

    sys.path.insert(0, "tests")
    from test_render_parity import CASES, _material_world

    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    albedo, flags, _ = flatten.palette_arrays(pal)

    worst = 0.0
    for i, (pos, dirn, t) in enumerate(CASES):
        rcfg = RenderConfig(width=24, height=24, time=t)
        cam = Camera(
            pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32)
        )
        img = np.asarray(fast.render_fast_jit(scene, cam, rcfg))
        ref = oracle.render_image_oracle(grid, flags, albedo, pos, dirn, rcfg)
        d = np.abs(img - ref).max(-1)
        bad = (d > 1e-5).mean()
        worst = max(worst, bad)
        print(f"tpu-vs-oracle case{i}: maxdiff={d.max():.2e} bad={bad:.3%}")
        assert bad <= 0.01, f"case {i} diverges on TPU"
    print(f"PARITY OK (worst bad-pixel fraction {worst:.3%})")

    if args.skip_perf:
        return

    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    dscene = diff.diff_scene_from_grid(grid, albedo_table := flatten.palette_arrays(pal)[0], solid_density=50.0)
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )
    from raytracing_test_tpu.render.camera import ray_directions

    R = args.res
    dirs = ray_directions(cam, R, R)
    rcfg = RenderConfig(width=R, height=R)
    fwd = jax.jit(lambda s, p, d: fast.render_rays_fast(s, p, d, rcfg)[0].sum())
    t0 = time.perf_counter()
    float(np.asarray(fwd(scene, cam.pos, dirs * (1 + 3e-6))))
    print(f"fast fwd compile+1st: {time.perf_counter()-t0:.1f}s")
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fwd(scene, cam.pos, dirs * (1 + 1e-6 * k))))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"fast fwd {R}^2: {dt*1e3:.0f} ms -> {R*R/dt:.3e} rays/s")

    def loss(ds, pos, d):
        return jnp.mean(diff.render_rays_diff(ds, pos, d, num_steps=160, sky=False))

    fb = jax.jit(
        lambda ds, p, d: jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), jax.grad(loss)(ds, p, d), 0.0
        )
    )
    t0 = time.perf_counter()
    float(np.asarray(fb(dscene, cam.pos, dirs * (1 + 3e-6))))
    print(f"diff fwd+bwd compile+1st: {time.perf_counter()-t0:.1f}s")
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fb(dscene, cam.pos, dirs * (1 + 1e-6 * k))))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"diff fwd+bwd {R}^2 x160: {dt*1e3:.0f} ms -> {R*R/dt:.3e} rays/s")


if __name__ == "__main__":
    main()
