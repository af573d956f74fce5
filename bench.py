"""Headline benchmark: rays/s/chip at 1024², forward+backward.

Matches BASELINE.json's metric: differentiable render (forward + gradient
w.r.t. voxel densities/albedos) of 1024x1024 primary rays against a 256-class
world on one chip, via the round-2 window formulation (one batched gather,
MXU-splat backward — render/diff.py + ops/splat.py). Secondary: the hard
forward renderer (full materials/shadows) on the compiled Pallas brick
kernels, falling back to the XLA fast path if the kernel path fails to
compile in this environment. vs_baseline is against the 5e8 rays/s/chip
target (the reference publishes no numbers; its implied desktop-GPU
throughput is ~1.25e8 primary rays/s — BASELINE.md).

Prints exactly one JSON line.
"""

import json
import signal
import sys
import time

import numpy as np


def _watchdog(seconds: int = 560):
    """The tunneled TPU backend occasionally wedges (calls hang instead of
    failing); make sure the driver still gets a JSON line."""

    def _fire(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "rays/s/chip 1024^2 fwd+bwd — DEVICE UNRESPONSIVE "
                    "(tunnel wedge), no measurement this run",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        sys.exit(2)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def main():
    _watchdog()
    import jax

    try:  # persistent compile cache — recompiles of these big programs are slow
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.render import diff
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    wcfg = WorldConfig()  # the reference 200x200 world in a 256x128x256 window
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, flags, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)

    H = W = 1024
    NUM_STEPS = 24  # surface-guided window (hard forward seeds the scan)
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )
    dirs = ray_directions(cam, W, H)

    # NOTE measurement hygiene for the tunneled (axon) backend:
    #  - inputs must differ per call (identical-input executions are memoized)
    #  - results must be MATERIALIZED (np.asarray); block_until_ready returns
    #    before remote execution completes
    # Reduce outputs to scalars inside jit so materialization cost is nil.
    def measure(make_fn, iters=3):
        fn = jax.jit(make_fn)
        float(np.asarray(fn(jnp.float32(99))))  # warmup/compile
        ts = []
        for k in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(jnp.float32(k))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def fwd_bwd(accum):
        def loss(ds, t):
            rgb = diff.render_rays_diff_guided(
                ds, scene, cam.pos, dirs * (1.0 + 1e-6 * t), num_steps=NUM_STEPS,
                sky=False, image_hw=(H, W), accum=accum,
            )
            return jnp.mean(rgb)

        return lambda t: jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), jax.grad(loss)(dscene, t), 0.0
        )

    rays_fb, accum_used = 0.0, "none"
    for accum in ("splat", "dedup"):
        try:
            dt = measure(fwd_bwd(accum))
            rays_fb, accum_used = H * W / dt, accum
            break
        except Exception as e:
            print(f"# fwd+bwd accum={accum} failed: {e}", file=sys.stderr)

    # secondary: hard forward renderer (full materials/shadows), compiled
    # Pallas brick kernels; falls back to the XLA fast path
    rays_f, fwd_used = 0.0, "none"
    rcfg = RenderConfig(width=W, height=H)
    try:
        from raytracing_test_tpu.kernels import brick_kernels as bk

        dt_f = measure(
            lambda t: bk.render_rays_bricks_pallas(
                scene, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg
            )[0].sum()
        )
        rays_f, fwd_used = H * W / dt_f, "bricks-pallas"
    except Exception as e:
        print(f"# bricks-pallas fwd failed: {e}", file=sys.stderr)
        try:
            from raytracing_test_tpu.render import fast, progressive

            def fwd_full(t):
                depth = progressive.coarse_depth(scene, cam, rcfg, 4)
                seeds = progressive.seed_from_depth(depth, 4, H, W)
                col, _ = fast.render_rays_fast(
                    scene, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg, start_t=seeds
                )
                return col.sum()

            dt_f = measure(fwd_full)
            rays_f, fwd_used = H * W / dt_f, "fast+progressive"
        except Exception as e2:
            print(f"# fast fwd failed too: {e2}", file=sys.stderr)

    target = 5e8
    print(
        json.dumps(
            {
                "metric": "rays/s/chip, 1024^2 forward+backward (guided window "
                f"diff render, {NUM_STEPS} steps, accum={accum_used}); fwd-only "
                f"full-feature [{fwd_used}]: {rays_f:.3e} rays/s",
                "value": rays_fb,
                "unit": "rays/s",
                "vs_baseline": rays_fb / target,
            }
        )
    )


if __name__ == "__main__":
    main()
