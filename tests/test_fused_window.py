"""Fused window kernel (kernels/fused_window.py): parity + gradient checks.

The kernel pair runs in interpret mode on CPU; the anchor is the XLA window
path with the plain-scatter accumulator (the correctness reference of
render/diff.py). Gradients must reconstruct to ~1e-5 relative — the hi+lo
bf16 one-hot contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.core.color import rgb_to_u64
from raytracing_test_tpu.core.tree import Palette
from raytracing_test_tpu.core.types import Block
from raytracing_test_tpu.render import diff
from raytracing_test_tpu.render.camera import Camera, ray_directions
from raytracing_test_tpu.kernels import fused_window as fw


def _world(shape=(64, 64, 64), pillar=False):
    pal = Palette()
    red = pal.id_for(Block(0, int(rgb_to_u64(200, 30, 30))))
    green = pal.id_for(Block(0, int(rgb_to_u64(30, 200, 30))))
    grid = np.zeros(shape, np.uint8)
    grid[:, 0:8, :] = red
    if pillar:
        grid[shape[0] // 2 : shape[0] // 2 + 4, 8:30, 20:24] = green
    else:
        grid[10:14, 8:12, 10:14] = green
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.DiffScene(
        density=jnp.asarray(np.where(grid > 0, 8.0, 0.0).astype(np.float32)),
        albedo=jnp.asarray(albedo[grid]),
    )
    return dscene


def _grads(fn, dscene):
    return jax.jit(jax.grad(lambda s: jnp.mean(fn(s) ** 2)))(dscene)


def _assert_grads_close(g_got, g_ref, rtol, msg=""):
    for k in ("density", "albedo"):
        a = np.asarray(getattr(g_got, k))
        b = np.asarray(getattr(g_ref, k))
        sc = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / sc, b / sc, atol=rtol, err_msg=f"{msg}:{k}")


def test_fused_window_matches_scatter():
    """rgb and field gradients match the XLA scatter anchor on a world the
    box fully covers (no escapes)."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    dirs = ray_directions(cam, 12, 12)
    seed = jnp.zeros(dirs.shape[0], jnp.float32)

    got, aux = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            return_aux=True,
        )
    )(dscene)
    assert int(aux["n_escaped"]) == 0
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    g_got = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=True,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_window(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            accum="scatter",
        ),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 1e-4)


def test_fused_window_sky_gradient():
    """sky=True exercises the T_end cotangent (g_T) through the kernel."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.6, 0.1, 0.5], jnp.float32),  # grazing: sky + floor
    )
    dirs = ray_directions(cam, 8, 8)
    seed = jnp.zeros(dirs.shape[0], jnp.float32)
    got = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=True,
            interpret=True,
        )
    )(dscene)
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, sky=True,
        accum="scatter",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g_got = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=True,
            interpret=True,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_window(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=True,
            accum="scatter",
        ),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 1e-4)


def test_fused_window_escape_fallback():
    """Rays whose window leaves the group box are re-rendered exactly by the
    compacted XLA fallback (discontinuous seeds force escapes)."""
    dscene = _world((64, 64, 64))
    cam = Camera(
        pos=jnp.asarray([4.0, 30.0, 4.0], jnp.float32),
        dir=jnp.asarray([0.8, -0.3, 0.5], jnp.float32),
    )
    dirs = ray_directions(cam, 16, 16)
    N = dirs.shape[0]
    seed = jnp.where((jnp.arange(N) // 7) % 2 == 0, 0.0, 40.0).astype(
        jnp.float32
    )
    got, aux = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            return_aux=True,
        )
    )(dscene)
    assert int(aux["n_escaped"]) > 0  # the escape path must actually fire
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
    g_got = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=True,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_window(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            accum="scatter",
        ),
        dscene,
    )
    # the fallback accumulates via dedup (its documented rtol ~1e-4)
    _assert_grads_close(g_got, g_ref, 2e-4)


def test_fused_window_escape_overflow_full_xla():
    """More escapes than the compact budget -> the whole frame re-renders on
    the XLA path (exactness over speed)."""
    dscene = _world((64, 64, 64))
    cam = Camera(
        pos=jnp.asarray([4.0, 30.0, 4.0], jnp.float32),
        dir=jnp.asarray([0.8, -0.3, 0.5], jnp.float32),
    )
    dirs = ray_directions(cam, 8, 8)
    N = dirs.shape[0]
    seed = ((jnp.arange(N) % 3) * 40.0).astype(jnp.float32)
    got, aux = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            return_aux=True, escape_cap=8,
        )
    )(dscene)
    assert int(aux["n_escaped"]) > 8
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_window_image_permutation():
    """image_hw routes rays through the 8x32-pixel strip permutation; output
    order must be restored exactly."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    H, W = 16, 64
    dirs = ray_directions(cam, W, H)
    seed = jnp.zeros(H * W, jnp.float32)
    got = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            image_hw=(H, W),
        )
    )(dscene)
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_window_small_world_falls_back():
    """Worlds smaller than the box edge use the XLA window path outright."""
    pal = Palette()
    red = pal.id_for(Block(0, int(rgb_to_u64(200, 30, 30))))
    grid = np.zeros((32, 32, 32), np.uint8)  # Sz < 64: unsupported
    grid[:, 0:8, :] = red
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.DiffScene(
        density=jnp.asarray(np.where(grid > 0, 8.0, 0.0).astype(np.float32)),
        albedo=jnp.asarray(albedo[grid]),
    )
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    dirs = ray_directions(cam, 8, 8)
    seed = jnp.zeros(64, jnp.float32)
    got = fw.render_window_fused(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True
    )
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="dedup",
        enumerate_mode="vec",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_fused_window_dp_matches_single_device():
    """shard_map dp (rays sharded, field replicated) reproduces the
    single-device fused window bit-for-bit, and the field gradient cotangent
    is correctly psum'ed over the data axis (VERDICT r03 item 5).
    num_steps=4 (one chunk): the 8-virtual-device SPMD partitioner's
    compile time explodes super-linearly in the interpret-expanded kernel
    body (S=8 took ~2 h against the r05 kernel pair) — the dp machinery
    under test is S-independent."""
    import jax as _jax
    from raytracing_test_tpu.parallel import mesh as meshlib

    dscene = _world((64, 64, 64))
    cam = Camera(
        pos=jnp.asarray([16.0, 30.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.4, -0.6, 0.5], jnp.float32),
    )
    H, W = 16, 64
    dirs = ray_directions(cam, W, H)
    seed = jnp.zeros(H * W, jnp.float32)
    mesh = meshlib.make_mesh(len(_jax.devices()), 1)

    single = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=4, start_t=seed, sky=False,
            interpret=True, image_hw=(H, W),
        )
    )(dscene)
    dp = jax.jit(
        lambda s: fw.render_window_fused_dp(
            s, cam.pos, dirs, mesh, num_steps=4, start_t=seed, sky=False,
            interpret=True, image_hw=(H, W),
        )
    )(dscene)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(single))

    g_single = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=4, start_t=seed, sky=False,
            interpret=True, image_hw=(H, W),
        ),
        dscene,
    )
    g_dp = _grads(
        lambda s: fw.render_window_fused_dp(
            s, cam.pos, dirs, mesh, num_steps=4, start_t=seed, sky=False,
            interpret=True, image_hw=(H, W),
        ),
        dscene,
    )
    _assert_grads_close(g_dp, g_single, 1e-5, "dp")


def test_guided_accum_fused_end_to_end():
    """render_rays_diff_guided(accum='fused') composes the hard seed pass
    with the fused window and matches the dedup-accumulated guided render."""
    from raytracing_test_tpu.config import WorldConfig
    from raytracing_test_tpu.worldgen import terrain

    wcfg = WorldConfig(width=48, length=48, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    cam = Camera(
        pos=jnp.asarray([24.0, 50.0, 10.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.75, 0.55], jnp.float32),
    )
    dirs = ray_directions(cam, 32, 16)

    def render(accum):
        return diff.render_rays_diff_guided(
            dscene, scene, cam.pos, dirs, num_steps=24, accum=accum,
            image_hw=(16, 32), coarse_factor=4,
        )

    got = np.asarray(jax.jit(lambda s=dscene: render("fused"))())
    ref = np.asarray(render("dedup"))
    # the dedup anchor's own noise contract is ~1e-4 (ops/scatter.py)
    np.testing.assert_allclose(got, ref, atol=2e-4)

    g_got = _grads(
        lambda s: diff.render_rays_diff_guided(
            s, scene, cam.pos, dirs, num_steps=24, accum="fused", sky=False,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_guided(
            s, scene, cam.pos, dirs, num_steps=24, accum="scatter", sky=False,
        ),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 2e-4)


def test_fused_window_shading_matches_anchor():
    """In-kernel face shading (r05): rgb + gradients match the XLA window
    with shading=True (calcLightIntensity applied per entry axis)."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    dirs = ray_directions(cam, 12, 12)
    seed = jnp.zeros(dirs.shape[0], jnp.float32)
    got = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            shading=True,
        )
    )(dscene)
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter",
        shading=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g_got = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=True, shading=True,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_window(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            accum="scatter", shading=True,
        ),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 1e-4)


def test_fused_window_shadow_matches_anchor():
    """shadow_steps>0 (r05): the XLA-side soft shadow factor driven by the
    kernel's expected-hit-point planes matches the XLA window's."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    dirs = ray_directions(cam, 8, 8)
    seed = jnp.zeros(dirs.shape[0], jnp.float32)
    got = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            shading=True, shadow_steps=6, sky=False,
        )
    )(dscene)
    ref = diff.render_rays_diff_window(
        dscene, cam.pos, dirs, num_steps=24, start_t=seed, accum="scatter",
        shading=True, shadow_steps=6, sky=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g_got = _grads(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=True, shading=True, shadow_steps=6,
        ),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_window(
            s, cam.pos, dirs, num_steps=24, start_t=seed, sky=False,
            accum="scatter", shading=True, shadow_steps=6,
        ),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 1e-4)


def test_fused_window_pose_gradients():
    """r05: the custom VJP returns real ray-geometry cotangents (through the
    tmax/abs_delta planes), so gradients w.r.t. ray DIRECTIONS match the XLA
    window's autodiff — the camera-pose fit path (BASELINE north star)."""
    dscene = _world()
    cam = Camera(
        pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
    )
    dirs = ray_directions(cam, 8, 8)
    seed = jnp.zeros(dirs.shape[0], jnp.float32)

    def loss_fused(d):
        return jnp.mean(fw.render_window_fused(
            dscene, cam.pos, d, num_steps=24, start_t=seed, sky=False,
            interpret=True) ** 2)

    def loss_ref(d):
        return jnp.mean(diff.render_rays_diff_window(
            dscene, cam.pos, d, num_steps=24, start_t=seed, sky=False,
            accum="scatter") ** 2)

    g_got = np.asarray(jax.jit(jax.grad(loss_fused))(dirs))
    g_ref = np.asarray(jax.jit(jax.grad(loss_ref))(dirs))
    sc = np.abs(g_ref).max() + 1e-12
    np.testing.assert_allclose(g_got / sc, g_ref / sc, atol=2e-4)

    # and w.r.t. a shared origin (through the same tmax cotangents)
    def loss_fused_o(o):
        return jnp.mean(fw.render_window_fused(
            dscene, o, dirs, num_steps=24, start_t=seed, sky=False,
            interpret=True) ** 2)

    def loss_ref_o(o):
        return jnp.mean(diff.render_rays_diff_window(
            dscene, o, dirs, num_steps=24, start_t=seed, sky=False,
            accum="scatter") ** 2)

    go_got = np.asarray(jax.jit(jax.grad(loss_fused_o))(cam.pos))
    go_ref = np.asarray(jax.jit(jax.grad(loss_ref_o))(cam.pos))
    sco = np.abs(go_ref).max() + 1e-12
    np.testing.assert_allclose(go_got / sco, go_ref / sco, atol=2e-4)


def test_fused_window_overflow_observable():
    """Escapes beyond the compact budget set aux['grads_dropped'] (VERDICT
    r04 weak #2: the drop must be loud)."""
    dscene = _world((64, 64, 64))
    cam = Camera(
        pos=jnp.asarray([4.0, 30.0, 4.0], jnp.float32),
        dir=jnp.asarray([0.8, -0.3, 0.5], jnp.float32),
    )
    dirs = ray_directions(cam, 16, 16)
    N = dirs.shape[0]
    seed = jnp.where((jnp.arange(N) // 7) % 2 == 0, 0.0, 40.0).astype(
        jnp.float32
    )
    _, aux = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            return_aux=True, escape_cap=16, overflow="compact",
        )
    )(dscene)
    assert int(aux["n_escaped"]) > 16
    assert bool(aux["grads_dropped"])
    assert int(aux["escape_capacity"]) >= 16
    # ample budget: not dropped
    _, aux2 = jax.jit(
        lambda s: fw.render_window_fused(
            s, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            return_aux=True, overflow="compact",
        )
    )(dscene)
    assert not bool(aux2["grads_dropped"])


def test_fused_window_bypass_logging(capsys):
    """Every silent-bypass path logs once (VERDICT r04 items: shape reject,
    num_steps reject, strip-permutation divisibility fail)."""
    import raytracing_test_tpu.utils.log as logmod

    fw._WARNED.clear()
    old = logmod.DEBUG_LEVEL
    logmod.set_debug_level(1)
    try:
        dscene = _world()
        cam = Camera(
            pos=jnp.asarray([16.0, 20.0, 16.0], jnp.float32),
            dir=jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
        )
        dirs = ray_directions(cam, 8, 8)
        seed = jnp.zeros(64, jnp.float32)
        # num_steps not a multiple of the chunk size
        fw.render_window_fused(
            dscene, cam.pos, dirs, num_steps=23, start_t=seed, interpret=True
        )
        # small world
        small = diff.DiffScene(
            density=jnp.zeros((16, 16, 16), jnp.float32),
            albedo=jnp.zeros((16, 16, 16, 3), jnp.float32),
        )
        fw.render_window_fused(
            small, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True
        )
        # bad strip divisibility
        fw.render_window_fused(
            dscene, cam.pos, dirs, num_steps=24, start_t=seed, interpret=True,
            image_hw=(4, 16),
        )
        err = capsys.readouterr().err
        assert "not a multiple" in err
        assert "unsupported" in err
        assert "divisibility" in err
    finally:
        logmod.set_debug_level(old)


# ---------------------------------------------------------------------------
# prox-seeded orchestration (r05): render_rays_guided_prox


def _terrain_world():
    from raytracing_test_tpu.config import WorldConfig
    from raytracing_test_tpu.worldgen import terrain
    from raytracing_test_tpu.kernels import fused_march as fm

    wcfg = WorldConfig(width=48, length=48, grid_shape=(64, 64, 64))
    grid, pal = terrain.gen_world_grid(wcfg)
    scene = flatten.scene_from_grid(grid, pal)
    albedo, _, _ = flatten.palette_arrays(pal)
    dscene = diff.diff_scene_from_grid(grid, albedo, solid_density=50.0)
    ft = fm.tables_for_scene(scene)
    return scene, dscene, ft


def test_prox_seed_is_conservative():
    """The prox seed (surface-brick ENTRY - margin) never exceeds the
    exact-hit seed's surface distance, and agrees on sky rays."""
    from raytracing_test_tpu.kernels import fused_march as fm

    scene, dscene, ft = _terrain_world()
    cam = Camera(
        pos=jnp.asarray([24.0, 50.0, 10.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.75, 0.55], jnp.float32),
    )
    H, W = 16, 32
    dirs = ray_directions(cam, W, H)
    sp = np.asarray(jax.jit(lambda: fm.seed_depth_fused(
        scene, ft, cam.pos, dirs, (H, W), margin=0.0, prox=True,
        interpret=True, max_steps=96))())
    se = np.asarray(jax.jit(lambda: fm.seed_depth_fused(
        scene, ft, cam.pos, dirs, (H, W), margin=0.0, prox=False,
        interpret=True, max_steps=96))())
    sky_p, sky_e = sp >= 9.9e5, se >= 9.9e5
    np.testing.assert_array_equal(sky_p, sky_e)
    hit = ~sky_p
    assert hit.any()
    assert (sp[hit] <= se[hit] + 1e-4).all()


@pytest.mark.skipif(
    not __import__("os").environ.get("RTT_HEAVY_TESTS"),
    reason="interpret+VJP compile of the full prox orchestrator graph takes "
    ">45 min on the 2-CPU CI box (set RTT_HEAVY_TESTS=1 to run); the "
    "components are covered separately: kernel parity on-chip at 1024^2 "
    "(VERIFY_r05 s1, 2.9e-6), prox-seed conservativeness (test above), "
    "patch/overflow bookkeeping (test below)")
def test_guided_prox_matches_exact_pipeline():
    """Prox seed + fused window + exact patch-up reproduces the exact-seed
    anchor pipeline on a hard field (rgb and field gradients); the patch
    path must actually fire."""
    scene, dscene, ft = _terrain_world()
    # oblique camera: grazing rays -> first-surface-brick misses -> patches
    cam = Camera(
        pos=jnp.asarray([10.0, 34.0, 10.0], jnp.float32),
        dir=jnp.asarray([0.8, -0.12, 0.55], jnp.float32),
    )
    H, W = 16, 32
    dirs = ray_directions(cam, W, H)

    got, aux = jax.jit(lambda s: diff.render_rays_guided_prox(
        s, scene, ft, cam.pos, dirs, (H, W), num_steps=24, margin=0.5,
        interpret=True, return_aux=True))(dscene)
    assert int(aux["n_need"]) > 0  # the patch must be exercised
    assert not bool(aux["grads_dropped"])

    # exact-seed anchor: guided scatter with the same margin contract
    ref = np.asarray(jax.jit(lambda s: diff.render_rays_diff_guided(
        s, scene, cam.pos, dirs, num_steps=24, sky=False,
        image_hw=(H, W), accum="scatter"))(dscene))
    got = np.asarray(got)
    # saturated-window tail truncation is bounded by sat_eps (1e-3)
    np.testing.assert_allclose(got, ref, atol=2e-3)

    g_got = _grads(
        lambda s: diff.render_rays_guided_prox(
            s, scene, ft, cam.pos, dirs, (H, W), num_steps=24, margin=0.5,
            interpret=True),
        dscene,
    )
    g_ref = _grads(
        lambda s: diff.render_rays_diff_guided(
            s, scene, cam.pos, dirs, num_steps=24, sky=False,
            image_hw=(H, W), accum="scatter"),
        dscene,
    )
    _assert_grads_close(g_got, g_ref, 5e-3, "prox")


@pytest.mark.skipif(
    not __import__("os").environ.get("RTT_HEAVY_TESTS"),
    reason="same heavy interpret compile as the parity test above")
def test_guided_prox_overflow_observable():
    """Misses beyond the patch budget keep kernel values and raise
    aux['grads_dropped'] (the escape-observability contract)."""
    scene, dscene, ft = _terrain_world()
    cam = Camera(
        pos=jnp.asarray([24.0, 50.0, 10.0], jnp.float32),
        dir=jnp.asarray([0.3, -0.75, 0.55], jnp.float32),
    )
    H, W = 16, 32
    dirs = ray_directions(cam, W, H)
    # sat_eps=-1: every non-sky ray is flagged as needing a patch -> the
    # 8-lane-granular budget (min 128 rays) must overflow at 512 rays
    _, aux = jax.jit(lambda s: diff.render_rays_guided_prox(
        s, scene, ft, cam.pos, dirs, (H, W), num_steps=24, margin=0.5,
        sat_eps=-1.0, interpret=True, return_aux=True))(dscene)
    assert int(aux["n_need"]) > int(aux["patch_capacity"])
    assert bool(aux["grads_dropped"])
