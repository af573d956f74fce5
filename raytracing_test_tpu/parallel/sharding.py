"""Sharded execution: ray/tile-parallel rendering and data-parallel training.

The renderer is embarrassingly parallel over rays, so the forward path shards
the pixel axis over the mesh's "data" axis with the scene replicated — the
analog of DP. For training (inverse rendering), rays+targets are sharded and
the voxel-field gradients are all-reduced: the psum over ICI is inserted by XLA
from the sharding annotations (scene replicated in, replicated grads out), per
the standard jax.sharding recipe. Spatial world sharding (the "space" axis)
lives in parallel/spatial.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..core.flatten import Scene
from ..render import renderer
from ..render.camera import Camera, ray_directions
from ..render.diff import DiffScene, render_rays_diff
from .mesh import DATA_AXIS, rays_sharding, replicated


def shard_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Replicate the scene on every device of the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), scene)


def render_image_sharded(
    scene: Scene, camera: Camera, cfg: RenderConfig, mesh: Mesh
):
    """Forward render with rays sharded over the mesh's data axis."""
    rs = rays_sharding(mesh)
    rep = replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, rs),
        out_shardings=rs,
    )
    def _render(scene, pos, dirs):
        col, _ = renderer.render_rays(scene, pos, dirs, cfg)
        return col

    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    dirs = jax.device_put(dirs, rs)
    col = _render(shard_scene(scene, mesh), camera.pos, dirs)
    return col.reshape(cfg.height, cfg.width, 3)


# --------------------------------------------------------------- training step


class FitParams(NamedTuple):
    """Optimizable voxel fields: density through softplus for positivity."""

    density_raw: jnp.ndarray  # f32 [Sx,Sy,Sz]; sigma = softplus(density_raw)
    albedo_raw: jnp.ndarray  # f32 [Sx,Sy,Sz,3]; albedo = sigmoid(albedo_raw)


def params_to_scene(p: FitParams, density_scale: float = 25.0) -> DiffScene:
    return DiffScene(
        density=jax.nn.softplus(p.density_raw) * density_scale,
        albedo=jax.nn.sigmoid(p.albedo_raw),
    )


def init_params(grid_shape, key=None) -> FitParams:
    Sx, Sy, Sz = grid_shape
    return FitParams(
        density_raw=jnp.full((Sx, Sy, Sz), -2.0, jnp.float32),
        albedo_raw=jnp.zeros((Sx, Sy, Sz, 3), jnp.float32),
    )


def loss_fn(params: FitParams, origins, dirs, targets, num_steps: int = 128):
    scene = params_to_scene(params)
    rgb = render_rays_diff(scene, origins, dirs, num_steps=num_steps, sky=False)
    return jnp.mean((rgb - targets) ** 2)


def guide_scene_from_params(
    params: FitParams, tau: float = 1.0, density_scale: float = 25.0
) -> Scene:
    """Threshold the EVOLVING density field into an occupancy guide Scene
    (fit-time occupancy re-thresholding).

    The guide's distance-encoded grid steers surface-guided sampling
    (render/diff.py render_rays_diff_guided) during fitting: the hard march
    finds the current surface estimate, the volumetric window samples around
    it. Re-threshold every K optimizer steps so the guide tracks the field.
    Pruning is one-directional (carving): matter cannot re-emerge inside a
    region the guide has pruned, which is the standard occupancy-grid
    trade-off — keep ``tau`` below the rendering-relevant density.
    """
    import numpy as np
    from ..core.color import rgb_to_u64
    from ..core.tree import Palette
    from ..core.types import Block

    dens = np.asarray(jax.nn.softplus(params.density_raw)) * density_scale
    occ = (dens > tau).astype(np.uint8)  # material id 1 where occupied
    pal = Palette()
    pal.id_for(Block(0, int(rgb_to_u64(255, 255, 255))))
    from ..core import flatten as _fl

    return _fl.scene_from_grid(occ, pal)


def make_train_step_guided(
    mesh: Mesh, optimizer, num_steps: int = 24, shading: bool = False,
    shadow_steps: int = 0,
):
    """Training step using surface-guided sampling against a (periodically
    re-thresholded) occupancy guide scene. Same sharding recipe as
    make_train_step; the guide is replicated and non-differentiable.
    ``shading``/``shadow_steps`` enable the face-shaded (+ soft sun shadow)
    volumetric model so targets rendered with shading can be fit directly."""
    from ..render.diff import render_rays_diff_guided

    rs = rays_sharding(mesh)
    rep = replicated(mesh)

    def loss_g(params, guide, origins, dirs, targets):
        scene = params_to_scene(params)
        rgb = render_rays_diff_guided(
            scene, guide, origins, dirs, num_steps=num_steps, sky=False,
            shading=shading, shadow_steps=shadow_steps,
        )
        return jnp.mean((rgb - targets) ** 2)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, rep, rs, rs, rs),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, guide, origins, dirs, targets):
        loss, grads = jax.value_and_grad(loss_g)(
            params, guide, origins, dirs, targets
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_train_step_fused(
    mesh: Mesh, optimizer, guide_scene: Scene, guide_tables,
    num_steps: int = 24, interpret=None, overflow: str = "compact",
    shading: bool = False, shadow_steps: int = 0, escape_div: int = 16,
):
    """Data-parallel training step on the FUSED engines (VERDICT r03 item 5):
    per shard, the fused march kernel seeds the guided window
    (kernels/fused_march) and the fused window kernel pair renders and
    accumulates field gradients in VMEM (kernels/fused_window); the
    per-shard field gradients are then psum'ed over the data axis.

    A Pallas call is a custom call XLA cannot partition, so the dp
    collectives are spelled explicitly with ``shard_map`` + ``lax.pmean``
    instead of sharding annotations — the explicit-collectives twin of
    make_train_step_guided.

    r05: the guide (occupancy Scene + fused-march tables) is passed to the
    STEP as traced arrays, so fit-time occupancy re-thresholding swaps
    guides WITHOUT rebuilding the step (a retrace happens only when table
    shapes change); ``guide_tables`` at construction supplies the static
    fields (air0/bgrid/shape3) and the default guide. The step returns
    (params, opt_state, loss, aux) with aux = {n_escaped, grads_dropped}
    reduced over shards — escapes past the compact budget silently drop
    field gradients (kernels/fused_window.py), so the overflow MUST be
    observable at the training loop (VERDICT r04 weak #2).
    """
    import functools as _ft

    from jax import shard_map
    from jax.sharding import PartitionSpec as _P

    from ..kernels import fused_march as _fm
    from ..kernels import fused_window as _fw
    from .mesh import DATA_AXIS

    tmpl = guide_tables

    def loss_local(params, guide, tabs, origins, dirs, targets):
        ft = tmpl._replace(meta=tabs[0], mask=tabs[1], multi=tabs[2])
        ds = params_to_scene(params)
        n_loc = dirs.shape[0]
        cfg = RenderConfig(width=1, height=n_loc, enable_materials=False,
                           enable_shadows=False)
        _, aux = _fm.render_rays_fused(
            guide, ft, origins, dirs, cfg, interpret=interpret)
        o = origins if origins.ndim == 2 else origins[None, :]
        t_hit = jnp.linalg.norm(aux["hit_pos"] - o, axis=1)
        seed = jax.lax.stop_gradient(
            jnp.where(aux["hit"], jnp.maximum(t_hit - 3.0, 0.0), 1e6))
        rgb, waux = _fw.render_window_fused(
            ds, origins, dirs, num_steps=num_steps, sky=False, start_t=seed,
            interpret=interpret, overflow=overflow, escape_div=escape_div,
            shading=shading, shadow_steps=shadow_steps, return_aux=True)
        loss = jnp.mean((rgb - targets) ** 2)
        return loss, (waux["n_escaped"],
                      waux["grads_dropped"].astype(jnp.int32))

    @_ft.partial(
        shard_map,
        mesh=mesh,
        in_specs=(_P(), _P(), _P(), _P(DATA_AXIS, None),
                  _P(DATA_AXIS, None), _P(DATA_AXIS, None)),
        out_specs=(_P(), _P(), _P(), _P()),
        check_vma=False,
    )
    def _loss_grads(params, guide, tabs, origins, dirs, targets):
        (loss, (nesc, dropped)), g = jax.value_and_grad(
            loss_local, has_aux=True)(params, guide, tabs, origins, dirs,
                                      targets)
        return (
            jax.lax.pmean(loss, DATA_AXIS),
            jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, DATA_AXIS), g),
            jax.lax.psum(nesc, DATA_AXIS),
            jax.lax.pmax(dropped, DATA_AXIS),
        )

    @jax.jit
    def _step(params, opt_state, guide, tabs, origins, dirs, targets):
        loss, grads, nesc, dropped = _loss_grads(
            params, guide, tabs, origins, dirs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, nesc, dropped

    def train_step(params, opt_state, origins, dirs, targets,
                   guide=None, tables=None):
        g = guide_scene if guide is None else guide
        t = tmpl if tables is None else tables
        assert (t.air0, t.bgrid, t.shape3) == (
            tmpl.air0, tmpl.bgrid, tmpl.shape3), "guide static fields changed"
        tabs = tuple(jnp.asarray(x) for x in (t.meta, t.mask, t.multi))
        params, opt_state, loss, nesc, dropped = _step(
            params, opt_state, g, tabs, origins, dirs, targets)
        return params, opt_state, loss, {
            "n_escaped": nesc, "grads_dropped": dropped != 0}

    return train_step


def make_train_step(mesh: Mesh, optimizer, num_steps: int = 128):
    """Data-parallel training step: rays sharded, params replicated, gradient
    all-reduce inserted by XLA from the sharding annotations."""
    rs = rays_sharding(mesh)
    rep = replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, rs, rs, rs),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, origins, dirs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, origins, dirs, targets, num_steps
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
