"""Pallas fused-march kernel vs the XLA fast path.

The kernel (kernels/pallas_march.py) re-expresses render/fast.py's march body
with identical per-lane arithmetic, so for material-free configs the rendered
images must be bit-identical. Runs in interpret mode (the CPU test env has no
Mosaic compiler); the same kernel compiles unchanged on a real TPU slice.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.kernels import pallas_march
from raytracing_test_tpu.render import fast
from raytracing_test_tpu.render.camera import Camera, ray_directions
from raytracing_test_tpu.worldgen import terrain


@pytest.fixture(scope="module")
def world():
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    return flatten.scene_from_grid(grid, pal)


def _cfg(**kw):
    kw.setdefault("width", 16)
    kw.setdefault("height", 16)
    kw.setdefault("enable_materials", False)
    return RenderConfig(**kw)


@pytest.mark.parametrize(
    "pos,dirn",
    [
        ((35.0, 50.0, 35.0), (0.6, -0.5, 0.5)),  # terrain look-down
        ((32.0, 45.0, 32.0), (0.0, -1.0, 0.0)),  # axis-aligned down
        ((500.0, 200.0, 500.0), (-1.0, -0.35, -1.0)),  # approach from outside
        ((32.0, 30.0, 32.0), (0.3, 0.9, 0.2)),  # sky
        ((32.0, 5.0, 32.0), (1.0, 0.0, 0.0)),  # camera inside solid
        ((-40.0, 20.0, 32.0), (1.0, 0.05, 0.1)),  # enter through -x face
    ],
)
def test_pallas_matches_fast(world, pos, dirn):
    cam = Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32))
    rcfg = _cfg()
    a = np.asarray(fast.render_fast_jit(world, cam, rcfg))
    b = np.asarray(
        pallas_march.render_image_pallas(world, cam, rcfg, interpret=True)
    )
    # march state is bit-exact (test_march_state_parity); shading fuses
    # differently across the two programs (skybox exp), hence the epsilon
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_pallas_shadow_liquid_skip():
    """Shadow rays treat LIQUID as transparent via the re-encoded table."""
    cfg = WorldConfig()  # full 200x200 world — has lakes
    grid, pal = terrain.gen_world_grid(cfg)
    scene = flatten.scene_from_grid(grid, pal)
    h = terrain.heightmap(cfg)
    xs, zs = np.nonzero(h < 18)
    x, z = float(xs[0]), float(zs[0])
    cam = Camera(
        pos=jnp.asarray((x - 6, 26.0, z - 6), jnp.float32),
        dir=jnp.asarray((0.55, -0.35, 0.55), jnp.float32),
    )
    rcfg = _cfg()
    a = np.asarray(fast.render_fast_jit(scene, cam, rcfg))
    b = np.asarray(pallas_march.render_image_pallas(scene, cam, rcfg, interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_march_state_parity(world):
    """Raw kernel state (cell/tmax/last_t/steps) equals fast_march's."""
    cam = Camera(
        pos=jnp.asarray((35.0, 50.0, 35.0), jnp.float32),
        dir=jnp.asarray((0.6, -0.5, 0.5), jnp.float32),
    )
    dirs = ray_directions(cam, 16, 16)
    rcfg = _cfg()
    s0 = fast._init_state(jnp.asarray(cam.pos), dirs, jnp.ones(dirs.shape[0]))
    ref, _ = fast.fast_march(world, s0, rcfg, jnp.asarray(300, jnp.int32), shadow=True)
    table = pallas_march._pad_table(world.grid_enc)
    got = pallas_march.march_pallas(
        table, world.shape3, world.y_max, s0, 300, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got.mat), np.asarray(ref.mat))
    np.testing.assert_array_equal(np.asarray(got.cell), np.asarray(ref.cell))
    np.testing.assert_array_equal(np.asarray(got.steps), np.asarray(ref.steps))
    np.testing.assert_array_equal(np.asarray(got.last_t), np.asarray(ref.last_t))
    np.testing.assert_array_equal(np.asarray(got.done), np.asarray(ref.done))


def test_pallas_supported_probe_is_bool():
    assert pallas_march.pallas_supported() in (True, False)
