"""Progressive refinement (the reference's disabled mid/full_res scheme):
coarse depth seeding must (a) reduce marching work and (b) approximate the
full render with only sparse thin-feature error."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.render import fast, progressive
from raytracing_test_tpu.render.camera import Camera, ray_directions
from raytracing_test_tpu.worldgen import terrain


def test_progressive_approximates_and_saves_steps():
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    cam = Camera(
        pos=jnp.asarray((35.0, 50.0, 35.0), jnp.float32),
        dir=jnp.asarray((0.6, -0.5, 0.5), jnp.float32),
    )
    rcfg = RenderConfig(width=64, height=64)
    full = np.asarray(fast.render_fast_jit(scene, cam, rcfg))
    img, aux = jax.jit(
        lambda s, c: progressive.render_image_progressive(s, c, rcfg)
    )(scene, cam)
    d = np.abs(np.asarray(img) - full).max(-1)
    assert (d > 1e-3).mean() < 0.01, f"{(d > 1e-3).mean():.3%} pixels off"

    dirs = ray_directions(cam, 64, 64)
    _, aux_full = fast.render_rays_fast(scene, cam.pos, dirs, rcfg)
    saved = float(np.asarray(aux_full["steps"]).mean()) / max(
        float(np.asarray(aux["steps"]).mean()), 1e-6
    )
    assert saved > 1.5, f"expected step reduction, got {saved:.2f}x"
