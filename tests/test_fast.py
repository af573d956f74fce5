"""Fast brick-hierarchical renderer vs the reference device path.

The fast path (render/fast.py) must reproduce render/renderer.py (which is
oracle-validated) — in practice it is bit-exact except for floating-point
near-ties at brick corners, bounded here with a small pixel budget.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.render import fast, renderer
from raytracing_test_tpu.render.camera import Camera
from raytracing_test_tpu.worldgen import terrain

from tests.test_render_parity import CASES, _material_world, assert_images_close


def _both(scene, pos, dirn, rcfg):
    cam = Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32))
    a = np.asarray(renderer.render_jit(scene, cam, rcfg))
    b = np.asarray(fast.render_fast_jit(scene, cam, rcfg))
    return a, b


@pytest.mark.parametrize("case", CASES)
def test_fast_matches_reference_path_materials(case):
    pos, dirn, t = case
    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    a, b = _both(scene, pos, dirn, RenderConfig(width=24, height=24, time=t))
    assert_images_close(b, a, atol=1e-6, max_bad_frac=0.005)


@pytest.mark.parametrize(
    "pos,dirn",
    [
        ((35.0, 50.0, 35.0), (0.6, -0.5, 0.5)),  # terrain
        ((32.0, 45.0, 32.0), (0.0, -1.0, 0.0)),  # axis-aligned down
        ((500.0, 200.0, 500.0), (-1.0, -0.35, -1.0)),  # approach from outside
        ((32.0, 30.0, 32.0), (0.3, 0.9, 0.2)),  # sky
        ((32.0, 5.0, 32.0), (1.0, 0.0, 0.0)),  # camera inside solid
        ((-40.0, 20.0, 32.0), (1.0, 0.05, 0.1)),  # enter through -x face
    ],
)
def test_fast_matches_reference_path_terrain(pos, dirn):
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    a, b = _both(scene, pos, dirn, RenderConfig(width=24, height=24))
    assert_images_close(b, a, atol=1e-6, max_bad_frac=0.005)


def test_fast_full_world_with_water():
    cfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    h = terrain.heightmap(cfg)
    xs, zs = np.nonzero(h < 18)
    x, z = float(xs[0]), float(zs[0])
    a, b = _both(
        scene,
        (x - 6, 26.0, z - 6),
        (0.55, -0.35, 0.55),
        RenderConfig(width=24, height=24, time=1.0),
    )
    assert_images_close(b, a, atol=1e-6, max_bad_frac=0.005)


def test_fast_step_counts_match():
    """Bulk advances must account skipped crossings exactly (budget parity)."""
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    cam = Camera(
        pos=jnp.asarray((35.0, 50.0, 35.0), jnp.float32),
        dir=jnp.asarray((0.6, -0.5, 0.5), jnp.float32),
    )
    rcfg = RenderConfig(width=16, height=16)
    from raytracing_test_tpu.render.camera import ray_directions

    dirs = ray_directions(cam, 16, 16)
    _, aux_a = renderer.render_rays(scene, cam.pos, dirs, rcfg)
    _, aux_b = fast.render_rays_fast(scene, cam.pos, dirs, rcfg)
    hit_a = np.asarray(aux_a["hit"])
    # for rays that hit, the crossing count to the hit must agree
    sa = np.asarray(aux_a["steps"])[hit_a]
    sb = np.asarray(aux_b["steps"])[hit_a]
    assert (sa == sb).mean() > 0.98, (sa[:20], sb[:20])


def test_fast_ao_matches_reference_path():
    """Hemisphere AO shading (C10) is shared by shade(); the fast path must
    reproduce the reference path bit-for-bit with enable_ao."""
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    a, b = _both(
        scene,
        (35.0, 50.0, 35.0),
        (0.6, -0.5, 0.5),
        RenderConfig(width=24, height=24, enable_ao=True),
    )
    np.testing.assert_array_equal(b, a)
