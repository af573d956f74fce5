"""Fused single-invocation march kernel (kernels/fused_march.py) vs the fast
path. Same contract as the round-2 brick kernels (tests/test_bricks.py): the
fused kernel runs interpret-mode here and must reproduce the oracle-validated
fast path across the material coverage matrix, edge starts, budgets and the
progressive seed; the identical kernel compiles unmodified on the chip
(scripts/verify_r3.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.kernels import fused_march as fm
from raytracing_test_tpu.render import fast
from raytracing_test_tpu.render.camera import Camera, ray_directions
from raytracing_test_tpu.worldgen import terrain
from tests.test_render_parity import CASES, _material_world, assert_images_close


@pytest.fixture(scope="module")
def mat_scene():
    grid, pal = _material_world()
    scene = flatten.scene_from_grid(grid, pal)
    return scene, fm.tables_for_scene(scene)


@pytest.fixture(scope="module")
def terrain_scene():
    wcfg = WorldConfig(width=48, length=48, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    return scene, fm.tables_for_scene(scene)


def _render_both(scene, ft, pos, dirn, rcfg, time_s=0.0, start_t=None):
    cam = Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(dirn, jnp.float32))
    dirs = ray_directions(cam, rcfg.width, rcfg.height)
    t = jnp.float32(time_s)
    cf, af = jax.jit(
        lambda t: fast.render_rays_fast(scene, cam.pos, dirs, rcfg, time_s=t, start_t=start_t)
    )(t)
    cu, au = jax.jit(
        lambda t: fm.render_rays_fused(
            scene, ft, cam.pos, dirs, rcfg, time_s=t, interpret=True, start_t=start_t
        )
    )(t)
    return np.asarray(cf), af, np.asarray(cu), au


@pytest.mark.parametrize("case", CASES, ids=[f"case{i}" for i in range(len(CASES))])
def test_fused_matches_fast_material_cases(mat_scene, case):
    scene, ft = mat_scene
    pos, dirn, time_s = case
    rcfg = RenderConfig(width=24, height=24, max_steps=150, shadow_steps=40)
    cf, af, cu, au = _render_both(scene, ft, pos, dirn, rcfg, time_s)
    assert_images_close(
        cu.reshape(rcfg.height, rcfg.width, 3), cf.reshape(rcfg.height, rcfg.width, 3)
    )


def test_fused_matches_fast_terrain_exact(terrain_scene):
    scene, ft = terrain_scene
    rcfg = RenderConfig(width=32, height=32, max_steps=150, shadow_steps=40)
    cf, af, cu, au = _render_both(scene, ft, (24.0, 45.0, -8.0), (0.25, -0.65, 0.9), rcfg)
    np.testing.assert_array_equal(cu, cf)
    np.testing.assert_array_equal(np.asarray(au["mat"]), np.asarray(af["mat"]))
    hit = np.asarray(af["hit"])
    np.testing.assert_array_equal(
        np.asarray(au["cell"])[hit], np.asarray(af["cell"])[hit]
    )


def test_fused_edges_and_sky(terrain_scene):
    scene, ft = terrain_scene
    rcfg = RenderConfig(width=16, height=16, max_steps=200, shadow_steps=40)
    for pos, dirn in [
        ((-40.0, 30.0, -40.0), (0.6, -0.2, 0.6)),  # enter through the slab
        ((32.0, 90.0, 32.0), (0.1, 0.9, 0.1)),  # sky-up exit
        ((200.0, 30.0, 200.0), (1.0, 0.1, 1.0)),  # outside moving away
        ((24.0, 30.0, 24.0), (0.3, 0.2, 0.9)),  # start below the surface
    ]:
        cf, _, cu, _ = _render_both(scene, ft, pos, dirn, rcfg)
        assert_images_close(
            cu.reshape(rcfg.height, rcfg.width, 3),
            cf.reshape(rcfg.height, rcfg.width, 3),
        )
        assert not np.isnan(cu).any()


def test_fused_tight_budget(mat_scene):
    # budget freezes (incl. frozen-in-water shadow semantics) must match
    scene, ft = mat_scene
    rcfg = RenderConfig(width=16, height=16, max_steps=24, shadow_steps=6)
    cf, _, cu, _ = _render_both(scene, ft, (12.0, 10.5, 12.0), (0.8, -0.1, 0.55), rcfg)
    assert_images_close(
        cu.reshape(rcfg.height, rcfg.width, 3), cf.reshape(rcfg.height, rcfg.width, 3)
    )


def test_fused_progressive_seed(terrain_scene):
    scene, ft = terrain_scene
    rcfg = RenderConfig(width=16, height=16, max_steps=150, shadow_steps=30)
    cam = Camera(pos=jnp.asarray([24.0, 50.0, -10.0], jnp.float32),
                 dir=jnp.asarray([0.2, -0.7, 0.8], jnp.float32))
    dirs = ray_directions(cam, rcfg.width, rcfg.height)
    seed = jnp.full((dirs.shape[0],), 5.0, jnp.float32)
    cf, _ = jax.jit(lambda: fast.render_rays_fast(scene, cam.pos, dirs, rcfg, start_t=seed))()
    cu, _ = jax.jit(lambda: fm.render_rays_fused(
        scene, ft, cam.pos, dirs, rcfg, start_t=seed, interpret=True))()
    assert_images_close(
        np.asarray(cu).reshape(rcfg.height, rcfg.width, 3),
        np.asarray(cf).reshape(rcfg.height, rcfg.width, 3),
    )


def test_fused_materials_shadows_off(terrain_scene):
    scene, ft = terrain_scene
    rcfg = RenderConfig(width=16, height=16, max_steps=150, shadow_steps=30,
                        enable_materials=False, enable_shadows=False)
    cf, _, cu, _ = _render_both(scene, ft, (24.0, 45.0, -8.0), (0.3, -0.5, 0.8), rcfg)
    np.testing.assert_array_equal(cu, cf)


def test_fused_image_block_remap(terrain_scene):
    # the 64x64 tile remap must be a pure permutation (image path == ray path)
    scene, ft = terrain_scene
    rcfg = RenderConfig(width=64, height=64, max_steps=150, shadow_steps=30)
    cam = Camera(pos=jnp.asarray([24.0, 45.0, -8.0], jnp.float32),
                 dir=jnp.asarray([0.25, -0.65, 0.9], jnp.float32))
    dirs = ray_directions(cam, rcfg.width, rcfg.height)
    c1, _ = fm.render_rays_fused(scene, ft, cam.pos, dirs, rcfg, interpret=True)
    c2, _ = fm.render_rays_fused(
        scene, ft, cam.pos, dirs, rcfg, interpret=True, image_hw=(64, 64)
    )
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_fused_tables_reject_unsupported():
    from raytracing_test_tpu.core.fused_tables import build_fused_tables

    with pytest.raises(ValueError):
        build_fused_tables(np.zeros((60, 64, 64), np.uint8), np.zeros(16, np.int32))
    g = np.zeros((64, 64, 64), np.uint8)
    g[0, 0, 0] = 15  # material id over the 4-bit budget
    with pytest.raises(ValueError):
        build_fused_tables(g, np.zeros(16, np.int32))


def test_session_fused_mode_matches_fast():
    from raytracing_test_tpu.app.session import WorldSession

    s = WorldSession(WorldConfig(width=24, length=24, grid_shape=(32, 32, 32)),
                     use_native=False)
    rcfg = RenderConfig(width=16, height=16, max_steps=80, shadow_steps=20)
    img_fast = s.render(rcfg, highlight=False, mode="fast")
    img_fused = s.render(rcfg, highlight=False, mode="fused")
    assert_images_close(img_fused, img_fast)


def test_fused_dp_matches_single_device(terrain_scene):
    """shard_map dp over the rays axis (scene/tables replicated) is bit-exact
    vs the single-device fused kernel — rays are pure data parallelism
    (VERDICT r03 item 5; SURVEY §5.8)."""
    from raytracing_test_tpu.parallel import mesh as meshlib

    scene, ft = terrain_scene
    mesh = meshlib.make_mesh(len(jax.devices()), 1)
    cam = Camera(
        pos=jnp.asarray([24.0, 50.0, 10.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.75, 0.55], jnp.float32),
    )
    rcfg = RenderConfig(width=32, height=16, max_steps=96, shadow_steps=24)
    dirs = ray_directions(cam, rcfg.width, rcfg.height)

    col1, aux1 = jax.jit(lambda: fm.render_rays_fused(
        scene, ft, cam.pos, dirs, rcfg, interpret=True))()
    coln, auxn = jax.jit(lambda: fm.render_rays_fused_dp(
        scene, ft, cam.pos, dirs, rcfg, mesh, interpret=True))()
    np.testing.assert_array_equal(np.asarray(coln), np.asarray(col1))
    np.testing.assert_array_equal(np.asarray(auxn["hit"]), np.asarray(aux1["hit"]))
    # hit_pos = seg_origin + t*dir is computed in XLA outside the kernel;
    # fma/fusion choices differ between the dp and single programs by ~1 ulp
    np.testing.assert_allclose(
        np.asarray(auxn["hit_pos"]), np.asarray(aux1["hit_pos"]), atol=1e-4)
