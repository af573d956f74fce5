"""Headline benchmark: rays/s/chip at 1024², forward+backward.

Matches BASELINE.json's metric: differentiable render (forward + gradient
w.r.t. voxel densities/albedos) of 1024x1024 primary rays against a 256-class
world on one chip. VERDICT r02 weak #1: a bench that prefers untimed code can
silently regress — so this one MEASURES every candidate path and reports the
best of each axis:

  - fwd+bwd: the fused window kernel pair (kernels/fused_window.py) and the
    XLA window accumulators (dedup / scatter) over the fastest available
    seed engine (fused kernel -> fast+progressive fallback);
  - fwd-only full-feature: fused kernel (kernels/fused_march.py),
    fast+progressive (XLA), bricks-pallas (r02) — losers' numbers included in
    the metric string.

A regression guard compares the headline against the best previously recorded
round (BENCH_r01/r02) and flags a drop loudly on stderr. Prints exactly one
JSON line. Candidates are individually watchdogged (the tunneled backend can
wedge; partial results still report).
"""

import json
import os
import signal
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
TARGET = 5e8


class _Timeout(Exception):
    pass


def _arm(seconds):
    def fire(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def _prev_best():
    import glob

    best = 0.0
    for name in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        try:
            with open(name) as f:
                best = max(best, float(json.load(f).get("value", 0.0)))
        except Exception:
            pass
    return best


def main():
    # absolute backstop: if everything wedges, still emit a JSON line
    def last_resort(signum, frame):
        print(json.dumps({
            "metric": "rays/s/chip 1024^2 fwd+bwd — DEVICE UNRESPONSIVE "
                      "(tunnel wedge), no measurement this run",
            "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGTERM, last_resort)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.render import diff, fast, progressive
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    wcfg = WorldConfig()  # the reference 200x200 world in a 256x128x256 window
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)

    H = W = 1024
    NUM_STEPS = 24  # surface-guided window (hard forward seeds the scan)
    cam = Camera(
        pos=jnp.asarray([100.0, 60.0, 40.0], jnp.float32),
        dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
    )
    dirs = ray_directions(cam, W, H)

    # Measurement hygiene for the tunneled (axon) backend (CLAUDE.md): vary
    # inputs per call, materialize results, reduce to scalars in-graph.
    def measure(make_fn, iters=3, budget=420):
        _arm(budget)
        try:
            fn = jax.jit(make_fn)
            float(np.asarray(fn(jnp.float32(99))))  # warmup/compile
            ts = []
            for k in range(iters):
                t0 = time.perf_counter()
                float(np.asarray(fn(jnp.float32(k))))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        finally:
            signal.alarm(0)

    notes = []

    # ---- seed pass (materials/shadows off) for the guided window
    rcfg_nm = RenderConfig(width=W, height=H, enable_materials=False,
                           enable_shadows=False)
    ft = None
    try:
        from raytracing_test_tpu.kernels import fused_march as fm

        ft = fm.tables_for_scene(scene)
    except Exception as e:
        print(f"# fused tables unavailable: {e}", file=sys.stderr)

    rcfg_c = RenderConfig(width=W // 4, height=H // 4,
                          enable_materials=False, enable_shadows=False)
    cdirs = jnp.asarray(
        np.asarray(dirs).reshape(H, W, 3)[2::4, 2::4].reshape(-1, 3))
    # (rcfg_c/cdirs also feed the fwd-only fused+coarse candidate below)

    def seed_fused(t):
        # coarse-to-fine on the fused kernel itself (the reference's C11
        # progressive scheme): a 1/4-res fused depth pass seeds the full-res
        # march — measured 225 -> 156 ms at 1024^2 (VERIFY_r04)
        return fm.seed_depth_fused(
            scene, ft, cam.pos, dirs, (H, W), margin=3.0, prox=False,
            time_jitter=t)

    def seed_fastprog(t):
        depth = progressive.coarse_depth(scene, cam, rcfg_nm, 4)
        seeds = progressive.seed_from_depth(depth, 4, H, W)
        _, aux = fast.render_rays_fast(
            scene, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg_nm, start_t=seeds)
        t_hit = jnp.linalg.norm(aux["hit_pos"] - cam.pos[None, :], axis=1)
        return jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6)

    seed_fns = ([("fused", seed_fused)] if ft is not None else []) + [
        ("fast+progressive", seed_fastprog)
    ]
    seed_fn, seed_name = None, "none"
    for name, fn in seed_fns:
        try:
            dt = measure(lambda t, _f=fn: _f(t).sum())
            notes.append(f"seed[{name}]: {H*W/dt:.3e} rays/s")
            seed_fn, seed_name = fn, name
            break
        except Exception as e:
            print(f"# seed engine {name} failed: {type(e).__name__} {e}",
                  file=sys.stderr)

    # ---- fwd+bwd candidates: window accumulators over the best seed
    rays_fb, accum_used = 0.0, "none"
    if seed_fn is not None:
        from raytracing_test_tpu.kernels import fused_window as fwin

        # NOT a candidate: the prox-stop pipeline (render_rays_guided_prox,
        # seed 93 vs 155 ms) — at THIS camera 65% of rays stop mid-crust
        # (first-surface-brick entry is ~40 crossings before the oblique
        # hit) and the exact patch budget cannot absorb them; its rays/s
        # would "win" while rendering those rays unsaturated. Measured and
        # recorded in VERIFY_r05 s11 / SPEED_OF_LIGHT §4c.
        def _fused_window(ds, t):
            # the r04 Pallas window pair (kernels/fused_window.py): in-VMEM
            # fetch + in-kernel gradient merge; escapes (0.45% at this
            # camera) fall back exactly to the XLA dedup path (budget 1/64)
            seed = jax.lax.stop_gradient(seed_fn(t))
            return jnp.mean(fwin.render_window_fused(
                ds, cam.pos, dirs * (1.0 + 1e-6 * t), num_steps=NUM_STEPS,
                sky=False, start_t=seed, image_hw=(H, W),
                overflow="compact", escape_div=64))

        cands_fb = [("fused-window", "kernel", _fused_window)] + [
            (a, e, None) for a, e in (
                ("dedup", "vec"), ("dedup", "scan"), ("scatter", "vec"))
        ]
        for accum, emode, special in cands_fb:
            def loss(ds, t, _a=accum, _e=emode, _s=special):
                if _s is not None:
                    return _s(ds, t)
                seed = jax.lax.stop_gradient(seed_fn(t))
                rgb = diff.render_rays_diff_window(
                    ds, cam.pos, dirs * (1.0 + 1e-6 * t), num_steps=NUM_STEPS,
                    sky=False, start_t=seed, accum=_a, enumerate_mode=_e)
                return jnp.mean(rgb)

            def fb(t, _l=loss):
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum(), jax.grad(_l)(dscene, t), 0.0)

            try:
                dt = measure(fb)
                r = H * W / dt
                notes.append(f"fwd+bwd[{accum}/{emode}]: {r:.3e}")
                if r > rays_fb:
                    rays_fb, accum_used = r, f"{accum}/{emode}"
            except Exception as e:
                print(f"# fwd+bwd {accum}/{emode} failed: {type(e).__name__} {e}",
                      file=sys.stderr)

        # escape observability (VERDICT r04 weak #2): one kernel-only forward
        # with aux — n_escaped vs the compact budget the headline ran with
        try:
            def esc_probe(t):
                seed = jax.lax.stop_gradient(seed_fn(t))
                _, waux = fwin.render_window_fused(
                    dscene, cam.pos, dirs * (1.0 + 1e-6 * t),
                    num_steps=NUM_STEPS, sky=False, start_t=seed,
                    image_hw=(H, W), fallback=False, return_aux=True)
                return waux["n_escaped"]

            _arm(420)
            try:
                n_esc = int(np.asarray(jax.jit(esc_probe)(jnp.float32(0))))
            finally:
                signal.alarm(0)
            cap = (H * W) // 64  # the headline's escape_div=64 budget
            msg = f"escapes: {n_esc}/{H*W} (compact budget {cap})"
            notes.append(msg)
            if n_esc > cap:
                print(f"# ESCAPE OVERFLOW: {msg} — field gradients dropped "
                      "past the budget", file=sys.stderr)
            else:
                print(f"# {msg}", file=sys.stderr)
        except Exception as e:
            print(f"# escape probe failed: {type(e).__name__} {e}",
                  file=sys.stderr)

    # ---- fwd-only full-feature candidates
    rcfg = RenderConfig(width=W, height=H)
    rays_f, fwd_used = 0.0, "none"
    cands = []
    if ft is not None:
        cands.append(("fused", lambda t: fm.render_rays_fused(
            scene, ft, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg,
            image_hw=(H, W))[0].sum()))

        def fwd_fused_coarse(t):
            # progressive seeding on the fused kernel (C11's scheme):
            # measured 443 -> 356 ms at 1024^2 full-feature (VERIFY_r04)
            _, caux = fm.render_rays_fused(
                scene, ft, cam.pos, cdirs * (1.0 + 1e-6 * t), rcfg_c,
                image_hw=(H // 4, W // 4))
            ct = jnp.linalg.norm(caux["hit_pos"] - cam.pos[None, :], axis=1)
            st = progressive.seed_from_depth(
                jnp.where(caux["hit"], ct, 1e6).reshape(H // 4, W // 4),
                4, H, W)
            return fm.render_rays_fused(
                scene, ft, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg,
                image_hw=(H, W), start_t=st)[0].sum()

        cands.append(("fused+coarse", fwd_fused_coarse))

    def fwd_fastprog(t):
        depth = progressive.coarse_depth(scene, cam, rcfg, 4)
        seeds = progressive.seed_from_depth(depth, 4, H, W)
        col, _ = fast.render_rays_fast(
            scene, cam.pos, dirs * (1.0 + 1e-6 * t), rcfg, start_t=seeds)
        return col.sum()

    cands.append(("fast+progressive", fwd_fastprog))
    for name, fn in cands:
        try:
            dt = measure(fn)
            r = H * W / dt
            notes.append(f"fwd[{name}]: {r:.3e}")
            if r > rays_f:
                rays_f, fwd_used = r, name
        except Exception as e:
            print(f"# fwd {name} failed: {type(e).__name__} {e}", file=sys.stderr)

    prev = _prev_best()
    if rays_fb < prev:
        print(f"# REGRESSION GUARD: headline {rays_fb:.3e} rays/s is below the "
              f"best previously recorded round ({prev:.3e}); candidates: "
              + "; ".join(notes), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "rays/s/chip, 1024^2 forward+backward (guided window "
                f"diff render, {NUM_STEPS} steps, seed={seed_name}, "
                f"accum={accum_used}; measured: " + "; ".join(notes)
                + f"); fwd-only full-feature best [{fwd_used}]: {rays_f:.3e} rays/s",
                "value": rays_fb,
                "unit": "rays/s",
                "vs_baseline": rays_fb / TARGET,
            }
        )
    )


if __name__ == "__main__":
    main()
