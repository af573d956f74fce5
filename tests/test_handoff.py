"""Ray segment-handoff spatial sharding (parallel/handoff.py) vs the
single-device fast path.

The handoff march runs render/fast.py's exact per-lane arithmetic — only the
DEVICE a lane is marched on changes — so the output must be bit-identical to
the replicated fast path (which is itself bounded against the oracle-validated
reference path in test_fast.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.parallel import handoff, mesh as meshlib, spatial
from raytracing_test_tpu.render import fast
from raytracing_test_tpu.render.camera import Camera
from raytracing_test_tpu.worldgen import terrain

from tests.test_render_parity import CASES, _material_world


@pytest.fixture(scope="module")
def world():
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(cfg)
    return flatten.scene_from_grid(grid, pal)


def _fast_single(scene, cam, rcfg):
    return np.asarray(fast.render_fast_jit(scene, cam, rcfg))


@pytest.mark.parametrize("n_data,n_space", [(4, 2), (2, 4), (1, 8)])
def test_handoff_matches_fast_terrain(world, n_data, n_space):
    cam = Camera(
        pos=jnp.asarray((35.0, 50.0, 35.0), jnp.float32),
        dir=jnp.asarray((0.6, -0.5, 0.5), jnp.float32),
    )
    rcfg = RenderConfig(width=32, height=16)
    single = _fast_single(world, cam, rcfg)
    mesh = meshlib.make_mesh(n_data, n_space)
    sharded = spatial.shard_scene_spatial(world, mesh)
    img = handoff.render_image_handoff(sharded, cam, rcfg, mesh)
    np.testing.assert_array_equal(img, single)


@pytest.mark.parametrize(
    "pos,dirn",
    [
        ((500.0, 200.0, 500.0), (-1.0, -0.35, -1.0)),  # approach from outside
        ((-40.0, 20.0, 32.0), (1.0, 0.05, 0.1)),  # enter through -x face
        ((32.0, 5.0, 32.0), (1.0, 0.0, 0.0)),  # camera inside solid, +x march
        ((63.0, 40.0, 32.0), (-1.0, -0.4, 0.01)),  # cross every slab boundary
    ],
)
def test_handoff_boundary_crossings(world, pos, dirn):
    """Rays whose march crosses x-slab boundaries (incl. multi-slab jumps from
    large empty-space licenses) must hand off exactly."""
    cam = Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32))
    rcfg = RenderConfig(width=16, height=16)
    single = _fast_single(world, cam, rcfg)
    mesh = meshlib.make_mesh(2, 4)
    sharded = spatial.shard_scene_spatial(world, mesh)
    img = handoff.render_image_handoff(sharded, cam, rcfg, mesh)
    np.testing.assert_array_equal(img, single)


@pytest.mark.parametrize("case", CASES[:3])
def test_handoff_materials(case):
    """Reflection/refraction rebuild ray state mid-march; handed-off lanes must
    carry the full material state (ior, color_mod, seg_origin) across devices."""
    pos, dirn, t = case
    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    cam = Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32))
    rcfg = RenderConfig(width=16, height=16, time=t)
    single = _fast_single(scene, cam, rcfg)
    mesh = meshlib.make_mesh(2, 4)
    sharded = spatial.shard_scene_spatial(scene, mesh)
    img = handoff.render_image_handoff(sharded, cam, rcfg, mesh)
    # material math (Snell sqrt chains) fuses differently under shard_map;
    # tolerance matches test_spatial's material case
    np.testing.assert_allclose(img, single, atol=1e-6)


def test_handoff_memory_is_sharded(world):
    mesh = meshlib.make_mesh(1, 8)
    sharded = spatial.shard_scene_spatial(world, mesh)
    assert sharded.grid_enc.addressable_shards[0].data.shape[0] == 64 // 8


def test_handoff_ao_matches_fast(world):
    """Hemisphere AO on the handoff path (collective slab lookup) must match
    the single-device fast path bit-for-bit — the one feature asymmetry left
    in round 2 (VERDICT item 9)."""
    cam = Camera(
        pos=jnp.asarray((35.0, 50.0, 35.0), jnp.float32),
        dir=jnp.asarray((0.6, -0.5, 0.5), jnp.float32),
    )
    rcfg = RenderConfig(width=16, height=16, enable_ao=True)
    single = _fast_single(world, cam, rcfg)
    mesh = meshlib.make_mesh(2, 4)
    sharded = spatial.shard_scene_spatial(world, mesh)
    img = handoff.render_image_handoff(sharded, cam, rcfg, mesh)
    np.testing.assert_array_equal(img, single)
