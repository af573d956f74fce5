"""Scan-free window enumeration (diff._enumerate_window_vec) vs the scan."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_test_tpu.render import diff
from raytracing_test_tpu.render.renderer import _build_ray, _init_tmax


def _enum_pair(dirs, origs, S=24, shape3=(64, 64, 64)):
    d, step, delta, abs_d = _build_ray(jnp.asarray(dirs))
    ob = jnp.asarray(origs)
    cell = jnp.floor(ob).astype(jnp.int32)
    tmax = _init_tmax(ob, cell, step, delta, abs_d)
    a = jax.jit(lambda: diff._enumerate_window(shape3, ob, d, step, abs_d, cell, tmax, S))()
    b = jax.jit(lambda: diff._enumerate_window_vec(shape3, ob, d, step, abs_d, cell, tmax, S))()
    return a, b


def test_vec_enumeration_matches_scan_random():
    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(2048, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origs = rng.uniform(4, 60, size=(2048, 3)).astype(np.float32)
    (l1, i1, dt1, a1), (l2, i2, dt2, a2) = _enum_pair(dirs, origs)
    # cells and entry axes are order-determined: identical save FP near-ties
    mism = (np.asarray(l1) != np.asarray(l2)).any(axis=1).mean()
    assert mism <= 0.002, mism
    np.testing.assert_allclose(np.asarray(dt1), np.asarray(dt2), atol=1e-4)


def test_vec_enumeration_tie_storms():
    # axis-aligned/diagonal dirs from integer corners maximize exact ties
    base = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [1, 1, 0], [1, 1, 1],
         [-1, 1, -1], [1e-6, 1, 1e-6], [1, 2, 3], [3, -2, 1]], np.float32)
    dirs = np.repeat(base, 16, axis=0)
    origs = np.full((len(dirs), 3), 8.0, np.float32)
    (l1, i1, dt1, a1), (l2, i2, dt2, a2) = _enum_pair(dirs, origs)
    # rational directions from integer corners create EXACT multi-axis ties
    # whose crossing values differ at the ulp between accumulation (scan) and
    # closed form (vec) — order near such ties may legitimately swap. Bound
    # the damage instead of demanding equality on the degenerate set.
    frac = (np.asarray(l1) != np.asarray(l2)).mean()
    assert frac <= 0.02, frac


def test_vec_window_render_and_grads_match():
    from raytracing_test_tpu.config import WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.render.camera import Camera, ray_directions
    from raytracing_test_tpu.worldgen import terrain

    wcfg = WorldConfig(width=48, length=48, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(wcfg)
    albedo, _, _ = flatten.palette_arrays(pal)
    ds = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    cam = Camera(pos=jnp.asarray([24.0, 50.0, -10.0], jnp.float32),
                 dir=jnp.asarray([0.2, -0.7, 0.8], jnp.float32))
    rd = ray_directions(cam, 24, 24)

    def render(emode):
        return diff.render_rays_diff_window(
            ds, cam.pos, rd, num_steps=24, accum="scatter", enumerate_mode=emode)

    r1, r2 = jax.jit(lambda: render("scan"))(), jax.jit(lambda: render("vec"))()
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-4)
    g1 = jax.grad(lambda f: diff.render_rays_diff_window(
        f, cam.pos, rd, num_steps=24, accum="scatter").sum())(ds)
    g2 = jax.grad(lambda f: diff.render_rays_diff_window(
        f, cam.pos, rd, num_steps=24, accum="scatter",
        enumerate_mode="vec").sum())(ds)
    sc = float(jnp.abs(g1.density).max())
    np.testing.assert_allclose(
        np.asarray(g1.density), np.asarray(g2.density), atol=1e-4 * sc)


