"""Single-chip overlap probe (VERDICT r02 item 8): can gradient-allreduce-sized
HBM traffic overlap the window backward?

docs/SCALING.md's data-axis efficiency model assumed the ~536 MB/chip ring
all-reduce of field gradients overlaps the backward. No multi-chip hardware is
reachable here, so this measures the single-chip proxy: time the window
fwd+bwd, time a 536 MB HBM round-trip, then time one XLA program computing
both with independent outputs. If XLA serializes them (t_joint ≈ t_a + t_b),
the model's overlap factor must be 0 — the doc's zero-overlap bound (≥92%)
then carries the claim. Appends to VERIFY_r03.txt.
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


def main():
    def fire(s, f):
        log("overlap_probe WATCHDOG — abandoned")
        sys.exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(850)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.render import diff
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    log(f"== overlap_probe {time.strftime('%F %T')} device={jax.devices()[0]}")
    wcfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    R = 512
    cam = Camera(pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
                 dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32))
    dirs = ray_directions(cam, R, R)
    seed = jnp.full((R * R,), 60.0, jnp.float32)

    def bwd_term(t):
        def loss(ds):
            rgb = diff.render_rays_diff_window(
                ds, cam.pos, dirs * (1 + 1e-6 * t), num_steps=24, sky=False,
                start_t=seed, accum="dedup")
            return jnp.mean(rgb)

        g = jax.grad(loss)(dscene)
        return jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), g, 0.0)

    # 536 MB of HBM round-trip traffic (the per-chip ring all-reduce volume of
    # the 256^3 x 4-channel f32 gradient at k >= 2)
    big = jnp.zeros((134_217_728 // 2,), jnp.float32)  # 268 MB read + write

    def traffic_term(t):
        return (big + t).sum() + (big * (1 + t)).sum()

    def measure(fn, iters=3):
        f = jax.jit(fn)
        float(np.asarray(f(jnp.float32(99))))
        ts = []
        for k in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f(jnp.float32(k))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ta = measure(bwd_term)
    log(f"overlap: window fwd+bwd 512^2x24 alone: {ta*1e3:.1f} ms")
    tb = measure(traffic_term)
    log(f"overlap: 1 GB HBM traffic alone: {tb*1e3:.1f} ms")
    tj = measure(lambda t: bwd_term(t) + traffic_term(t))
    log(f"overlap: joint program: {tj*1e3:.1f} ms")
    ov = (ta + tb - tj) / tb if tb > 0 else 0.0
    log(f"overlap: hidden fraction of the traffic = {ov:.2f} "
        f"(1.0 = fully overlapped, <=0 = serialized)")


if __name__ == "__main__":
    main()
