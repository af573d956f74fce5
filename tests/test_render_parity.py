"""Device renderer vs CPU oracle: pixel-exact parity across feature coverage.

The oracle (oracle/cpu_renderer.py) is a scalar transcription of the reference
kernel's semantics; the JAX renderer must reproduce it bitwise (both are f32).
"""

import numpy as np
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.core.color import rgb_to_u64
from raytracing_test_tpu.core.tree import Palette
from raytracing_test_tpu.core.types import Block, Properties
from raytracing_test_tpu.oracle import cpu_renderer as oracle
from raytracing_test_tpu.render import renderer
from raytracing_test_tpu.render.camera import Camera
from raytracing_test_tpu.worldgen import terrain


def _material_world():
    """Small synthetic world exercising every material path."""
    pal = Palette()
    red = pal.id_for(Block(0, int(rgb_to_u64(200, 30, 30))))
    green = pal.id_for(Block(0, int(rgb_to_u64(30, 200, 30))))
    mirror = pal.id_for(
        Block(int(Properties.REFLECTIVE), int(rgb_to_u64(255, 255, 255)), 0.94)
    )
    glass = pal.id_for(Block(int(Properties.REFRACTIVE), int(rgb_to_u64(0, 0, 0)), 1.5))
    water = pal.id_for(
        Block(
            int(Properties.REFRACTIVE | Properties.LIQUID), int(rgb_to_u64(0, 150, 10))
        )
    )
    grid = np.zeros((64, 64, 64), np.uint8)
    grid[:, 0:8, :] = red  # floor
    grid[:, 8, :] = green  # surface
    grid[20:28, 9:20, 30:31] = mirror  # mirror wall
    grid[34:38, 9:12, 20:24] = glass  # glass slab
    grid[8:16, 9:12, 8:16] = water  # pool
    grid[40:44, 9:14, 40:44] = red  # pillar
    return grid, pal


def assert_images_close(img, ref, atol=1e-5, max_bad_frac=0.01):
    """Pixel-exact up to f32 noise, with a small budget for silhouette-edge
    pixels where a 1-ULP ray-direction difference flips the discrete traversal
    (hits a different voxel). Those are geometrically unstable pixels, not
    renderer bugs; everything else must match to ``atol``."""
    d = np.abs(img - ref).max(axis=-1)
    bad = d > atol
    frac = bad.mean()
    assert frac <= max_bad_frac, (
        f"{bad.sum()} pixels ({frac:.2%}) differ by more than {atol}; "
        f"max diff {d.max()}"
    )


def _compare(grid, pal, pos, dirn, rcfg, atol=1e-5):
    scene = flatten.scene_from_grid(grid, pal)
    albedo, flags, _ = flatten.palette_arrays(pal)
    cam = Camera(
        pos=np.asarray(pos, np.float32), dir=np.asarray(dirn, np.float32)
    )
    img = np.asarray(renderer.render_jit(scene, cam, rcfg))
    ref = oracle.render_image_oracle(grid, flags, albedo, pos, dirn, rcfg)
    assert_images_close(img, ref, atol=atol)


CASES = [
    # (camera pos, dir, time) — chosen to cover shading/sky/materials
    ((35.0, 50.0, 35.0), (0.5, -0.6, 0.6), 0.0),  # terrain look-down
    ((32.0, 12.0, 5.0), (0.1, 0.05, 1.0), 0.3),  # grazing: mirror+glass+pillar
    ((12.0, 14.0, 12.0), (0.2, -0.8, 0.3), 1.7),  # into the water pool
    ((12.0, 10.5, 12.0), (0.6, -0.1, 0.8), 0.9),  # submerged camera
    ((30.0, 30.0, 30.0), (0.3, 0.9, 0.2), 0.0),  # mostly sky + sun disc
    ((24.0, 12.0, 24.0), (-0.4, 0.1, 0.6), 2.2),  # mirror reflection path
    ((41.0, 11.0, 41.0), (0.5, 0.2, 0.5), 0.0),  # camera inside solid block
]


@pytest.mark.parametrize("case", CASES)
def test_material_world_parity(case):
    pos, dirn, t = case
    grid, pal = _material_world()
    rcfg = RenderConfig(width=24, height=24, time=t)
    _compare(grid, pal, pos, dirn, rcfg)


def test_terrain_world_parity():
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    rcfg = RenderConfig(width=32, height=32)
    _compare(grid, pal, (35.0, 50.0, 35.0), (0.6, -0.5, 0.5), rcfg)


def test_full_terrain_with_water_parity():
    cfg = WorldConfig()  # full 200x200 — has lakes (heights < 20)
    grid, pal = terrain.gen_world_grid(cfg)
    h = terrain.heightmap(cfg)
    xs, zs = np.nonzero(h < 18)
    assert len(xs), "expected water in the reference world"
    x, z = float(xs[0]), float(zs[0])
    rcfg = RenderConfig(width=24, height=24, time=1.0)
    _compare(grid, pal, (x - 6, 26.0, z - 6), (0.55, -0.35, 0.55), rcfg)


def test_highlight_and_crosshair():
    grid, pal = _material_world()
    rcfg = RenderConfig(
        width=24,
        height=24,
        looking_at=(43, 13, 41),  # visible pillar cell
        crosshair=True,
        mouse_px=(12.0, 12.0),
    )
    scene = flatten.scene_from_grid(grid, pal)
    albedo, flags, _ = flatten.palette_arrays(pal)
    cam = Camera(
        pos=np.asarray((35.0, 20.0, 35.0), np.float32),
        dir=np.asarray((0.5, -0.5, 0.5), np.float32),
    )
    img = np.asarray(renderer.render_jit(scene, cam, rcfg))
    # crosshair center is white
    assert np.all(img[12, 12] == 1.0)
    # oracle comparison away from the crosshair for the highlight pixels
    ref = oracle.render_image_oracle(
        grid, flags, albedo, (35.0, 20.0, 35.0), (0.5, -0.5, 0.5), rcfg
    )
    yy, xx = np.mgrid[0:24, 0:24]
    mask = ((yy - 12.0) ** 2 + (xx - 12.0) ** 2) > 9.0
    assert_images_close(img[mask][:, None, :], ref[mask][:, None, :], atol=1e-5)
    # the highlighted block must actually be highlighted somewhere
    assert np.any(np.all(np.isclose(img, ref), axis=-1) & (img.max(-1) > 1.0))


def test_ao_runs_and_darkens():
    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    cam = Camera(
        pos=np.asarray((35.0, 20.0, 35.0), np.float32),
        dir=np.asarray((0.5, -0.5, 0.5), np.float32),
    )
    base = np.asarray(
        renderer.render_jit(scene, cam, RenderConfig(width=16, height=16))
    )
    ao = np.asarray(
        renderer.render_jit(
            scene, cam, RenderConfig(width=16, height=16, enable_ao=True)
        )
    )
    assert np.all(ao <= base + 1e-6)
    assert ao.sum() < base.sum()  # something got occluded


def test_ao_occlusion_matches_scalar_oracle():
    """The vectorized hemisphere AO march equals the scalar oracle at sampled
    hit points (same Fibonacci table, tangent frame, and 5-step marches)."""
    import jax.numpy as jnp
    from raytracing_test_tpu.oracle.cpu_renderer import ao_factor_scalar
    from raytracing_test_tpu.render.camera import ray_directions

    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    cam = Camera(
        pos=np.asarray((35.0, 20.0, 35.0), np.float32),
        dir=np.asarray((0.5, -0.5, 0.5), np.float32),
    )
    rcfg = RenderConfig(width=16, height=16)
    dirs = ray_directions(cam, 16, 16)
    _, aux = renderer.render_rays(scene, cam.pos, dirs, rcfg)
    hit = np.asarray(aux["hit"])
    p = np.asarray(aux["hit_pos"])
    n = np.asarray(aux["normal"])
    occ_vec = np.asarray(
        renderer._ao_march(scene, jnp.asarray(p), jnp.asarray(n), rcfg)
    )
    idx = np.nonzero(hit)[0][::7][:12]
    for i in idx:
        want = ao_factor_scalar(grid, p[i], n[i], rcfg.ao_rays, rcfg.ao_steps)
        assert abs(occ_vec[i] - want) < 1e-6, (i, occ_vec[i], want)
