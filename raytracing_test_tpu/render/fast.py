"""Fast brick-hierarchical renderer — the performance path.

Same semantics as render/renderer.py (which is itself oracle-validated), but
built around what TPUs are actually fast at. Profiling on a v5e chip showed the
naive march is bound by XLA's scalar gather (~1e8 lookups/s, ~9.7 ms per 1M
lanes), so this path eliminates per-crossing gathers:

  1. analytic air skips — everything above the world's max solid y, outside the
     grid window, or inside an empty 4^3 brick is provably air; the DDA is
     bulk-advanced to the exit of the enclosing empty box in O(1) arithmetic
     (no lookup per crossing), with the skipped crossing count tracked exactly
     for step-budget parity;
  2. brick occupancy tests via the MXU one-hot word lookup
     (ops/mxu_lookup.py, ~8e8 lookups/s) instead of gathers — the device
     analog of the reference tree's bitmap empty-space skip
     (low_res.frag:520-524);
  3. on entering an occupied brick, ONE row gather fetches the entire 4^3
     brick payload (64 x (mat | flags<<8)); all fine crossings inside the brick
     then resolve materials from the in-register row by one-hot selection —
     zero further memory traffic.

The march alternates an empty-space subloop (cheap body) with a brick-resolve
phase (row fetch + bounded fine loop), so expensive work runs once per occupied
brick entered (typically 1-3 per ray) rather than once per crossing (~40-300).

Exactness vs the reference path: the bulk advance reproduces sequential
stepping's cell/tmax state exactly (sums are order-independent); the only
divergences are (a) floating-point near-ties at brick corners, where a crossing
within 1 ULP of a boundary may resolve differently, and (b) rays frozen by the
step budget mid-air, which shade as sky either way. Tests bound (a) with a
small pixel budget.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.flatten import Scene
from ..core.types import Properties
from ..ops.mxu_lookup import mxu_nibble_lookup
from .camera import Camera, ray_directions
from .renderer import (
    _March,
    _argmin_axis,
    _build_ray,
    _get,
    _init_tmax,
    _onehot,
    classify,
    material_step,
    shade,
)

_BIG = 1 << 20  # "infinite" AABB bound (cells); advances are clamped anyway
_MAX_JUMP = 512  # max crossings consumed per bulk advance


def _brick_lin(scene: Scene, cell):
    nbx, nby, nbz = scene.brick_dims
    b = cell >> 2
    lin = (b[:, 0] * nby + b[:, 1]) * nbz + b[:, 2]
    return jnp.clip(lin, 0, nbx * nby * nbz - 1)


def _row_select(row, off):
    """row: i32[N, 64], off: i32[N] in [0,64) -> i32[N] (one-hot reduce; no
    gather)."""
    oh = (off[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]).astype(row.dtype)
    return (row * oh).sum(axis=1)


def _offset_in_brick(cell):
    return ((cell[:, 0] & 3) << 4) | ((cell[:, 1] & 3) << 2) | (cell[:, 2] & 3)


def lookup_mat16(scene: Scene, cell):
    """mat | flags<<8 at integer cells (single row gather); air outside."""
    Sx, Sy, Sz = scene.shape3
    c = cell & 1023
    inside = (c[:, 0] < Sx) & (c[:, 1] < Sy) & (c[:, 2] < Sz)
    row = jnp.take(scene.brick_rows, jnp.where(inside, _brick_lin(scene, c), 0), axis=0)
    m16 = _row_select(row, _offset_in_brick(c))
    return jnp.where(inside, m16, 0)


class _FastCarry(NamedTuple):
    s: _March
    i: jnp.ndarray  # outer round counter


def _aabb_advance(s: _March, lo, hi, mask, budget):
    """Advance masked lanes' DDA to the exit of the all-air AABB [lo, hi]
    (inclusive fine-cell bounds), exactly as sequential stepping would.

    Returns the updated _March. The advance consumes >= 1 crossing; the skipped
    crossing count is added to ``steps`` so budgets behave like the
    one-crossing-at-a-time path.
    """
    f32 = s.dir.dtype
    istep = s.step.astype(jnp.int32)
    # crossings needed to exit the box per axis (>= 1)
    n = jnp.where(istep > 0, hi + 1 - s.cell, s.cell - lo + 1)
    n = jnp.clip(n, 1, _MAX_JUMP)
    t_exit = s.tmax + (n - 1).astype(f32) * s.abs_delta
    m = _argmin_axis(t_exit)
    oh = _onehot(m, f32)
    t_m = _get(t_exit, m)
    # crossings on the other axes that occur before t_m
    c = jnp.where(
        t_m[:, None] >= s.tmax,
        jnp.floor((t_m[:, None] - s.tmax) / s.abs_delta).astype(jnp.int32) + 1,
        0,
    )
    c = jnp.minimum(c, n - 1)  # stay inside the box on non-exit axes
    c = jnp.where(oh > 0, n, c)  # the exit axis takes its full count
    c = jnp.maximum(c, 0)

    mask3 = mask[:, None]
    cell = jnp.where(mask3, s.cell + c * istep, s.cell)
    tmax = jnp.where(mask3, s.tmax + c.astype(f32) * s.abs_delta, s.tmax)
    last_axis = jnp.where(mask, m, s.last_axis)
    last_t = jnp.where(mask, t_m, s.last_t)
    steps = s.steps + jnp.where(mask, c.sum(axis=1), 0)
    done = s.done | (mask & (steps >= budget))
    return s._replace(
        cell=cell, tmax=tmax, last_axis=last_axis, last_t=last_t, steps=steps, done=done
    )


def _classify_lanes(scene: Scene, s: _March, budget):
    """Per-lane situation flags for the empty-space march."""
    Sx, Sy, Sz = scene.shape3
    shape = jnp.asarray([Sx, Sy, Sz], jnp.int32)[None, :]
    istep = s.step.astype(jnp.int32)
    out_pos = s.cell >= shape
    out_neg = s.cell < 0
    inside = ~(out_pos | out_neg).any(axis=1)
    moving_away = ((out_pos & (istep > 0)) | (out_neg & (istep < 0))).any(axis=1)
    in_sky = s.cell[:, 1] > scene.y_max
    sky_up = in_sky & (istep[:, 1] > 0)
    active = ~s.done
    exit_now = active & (moving_away | sky_up)
    # Chebyshev brick-distance: 0 = occupied (park); d >= 1 licenses a jump
    # through the (2d-1)^3-brick box centered on the current brick
    dist = mxu_nibble_lookup(scene.brick_dist, _brick_lin(scene, s.cell))
    parked = active & ~exit_now & inside & ~in_sky & (dist == 0)
    return inside, in_sky, exit_now, parked, out_pos, out_neg, dist


def _empty_march(scene: Scene, s: _March, budget):
    """Advance all lanes through provably-empty space until every active lane
    is parked at an occupied brick (or done). The lane classification (incl.
    the MXU occupancy lookup) is carried so cond() stays cheap."""
    Sx, Sy, Sz = scene.shape3

    def cond(carry):
        s, cls, it = carry
        parked = cls[3]
        return (it < 2 * budget) & jnp.any(~s.done & ~parked)

    def body(carry):
        s, cls, it = carry
        inside, in_sky, exit_now, parked, out_pos, out_neg, dist = cls
        s = s._replace(done=s.done | exit_now)
        advance = ~s.done & ~parked

        # empty-region AABB per lane, by priority: sky slab > outside slab >
        # distance-certified empty box around the current brick
        b = s.cell >> 2
        r = (jnp.maximum(dist, 1) - 1)[:, None]
        brick_lo = (b - r) << 2
        brick_hi = ((b + r) << 2) + 3
        big_lo = jnp.full_like(s.cell, -_BIG)
        big_hi = jnp.full_like(s.cell, _BIG)
        # outside-window slab along each out axis
        shape = jnp.asarray([Sx, Sy, Sz], jnp.int32)[None, :]
        out_lo = jnp.where(out_pos, shape, jnp.where(out_neg, -_BIG, -_BIG))
        out_hi = jnp.where(out_pos, _BIG, jnp.where(out_neg, -1, _BIG))
        outside = ~inside
        sky_lo = jnp.concatenate(
            [
                jnp.full((s.cell.shape[0], 1), -_BIG, jnp.int32),
                jnp.broadcast_to((scene.y_max + 1)[None, None], (s.cell.shape[0], 1)).astype(jnp.int32),
                jnp.full((s.cell.shape[0], 1), -_BIG, jnp.int32),
            ],
            axis=1,
        )
        lo = jnp.where(
            in_sky[:, None], sky_lo, jnp.where(outside[:, None], out_lo, brick_lo)
        )
        hi = jnp.where(
            in_sky[:, None], big_hi, jnp.where(outside[:, None], out_hi, brick_hi)
        )
        s = _aabb_advance(s, lo, hi, advance, budget)
        return s, _classify_lanes(scene, s, budget), it + 1

    cls0 = _classify_lanes(scene, s, budget)
    s, cls, iters = jax.lax.while_loop(cond, body, (s, cls0, jnp.asarray(0, jnp.int32)))
    exit_now, parked = cls[2], cls[3]
    # anything not parked after the loop is either done or frozen in air
    # (iteration cap / budget): finish it as sky rather than looping forever
    s = s._replace(done=s.done | (exit_now | (~parked & ~s.done)))
    undone = parked & ~s.done
    return s, undone, iters


def _brick_phase(scene: Scene, s: _March, parked, cfg: RenderConfig, budget, shadow: bool):
    """Resolve one occupied brick per parked lane: fetch its row once, then
    fine-march in registers until hit / brick exit / budget."""
    N = s.cell.shape[0]
    blin = _brick_lin(scene, s.cell)
    row = jnp.take(scene.brick_rows, jnp.where(parked, blin, 0), axis=0)
    brick0 = s.cell >> 2

    def cond(carry):
        s, fine, it = carry
        return (it < 14) & jnp.any(fine)

    def body(carry):
        s, fine, it = carry
        m16 = _row_select(row, _offset_in_brick(s.cell))
        mat = m16 & 0xFF
        fl = m16 >> 8
        if shadow:
            # shadow rays: LIQUID blocks are transparent (frag:384); any other
            # block occludes
            liquid = (fl & int(Properties.LIQUID)) > 0
            is_hit = fine & (mat != 0) & ~liquid
            is_refl = is_hit & False
            is_refr = is_hit & False
        else:
            is_refl, is_refr, is_hit = classify(fl, mat, fine, cfg)
        done = s.done | is_hit
        s2 = s._replace(mat=jnp.where(fine, mat, s.mat), done=done)

        if not shadow:
            # material math is ~half the fine-body cost but fires on a tiny
            # fraction of iterations; branch around it when no lane needs it
            def _with_materials(s2):
                (dirx, stepx, absx, tmaxx, segx, last_t, cmod, ior, refl) = (
                    material_step(s2, is_refl, is_refr, fl, cfg)
                )
                return s2._replace(
                    dir=dirx, step=stepx, abs_delta=absx, tmax=tmaxx,
                    seg_origin=segx, last_t=last_t, color_mod=cmod, ior=ior,
                    reflected=refl,
                )

            s2 = jax.lax.cond(
                jnp.any(is_refl | is_refr), _with_materials, lambda s2: s2, s2
            )

        # fine DDA step for lanes still marching in this brick
        march = fine & ~s2.done
        ax = _argmin_axis(s2.tmax)
        oh = _onehot(ax, s2.dir.dtype)
        t_cross = _get(s2.tmax, ax)
        m3 = march[:, None]
        cell = jnp.where(m3, s2.cell + (oh * s2.step).astype(jnp.int32), s2.cell)
        s2 = s2._replace(
            cell=cell,
            tmax=jnp.where(m3, s2.tmax + oh * s2.abs_delta, s2.tmax),
            last_axis=jnp.where(march, ax, s2.last_axis),
            last_t=jnp.where(march, t_cross, s2.last_t),
            steps=s2.steps + march.astype(jnp.int32),
        )
        over = march & (s2.steps >= budget)
        s2 = s2._replace(done=s2.done | over)
        left = (s2.cell >> 2 != brick0).any(axis=1)
        fine2 = march & ~left & ~over
        # lanes that left the brick return to in-flight state (mat = 0 again)
        s2 = s2._replace(mat=jnp.where(march & left & ~s2.done, 0, s2.mat))
        return s2, fine2, it + 1

    s, _, _ = jax.lax.while_loop(cond, body, (s, parked, jnp.asarray(0, jnp.int32)))
    return s


def fast_march(
    scene: Scene,
    state: _March,
    cfg: RenderConfig,
    budget,
    shadow: bool = False,
    compact_fraction: int = 8,
):
    """The full phased march: alternate empty-space advance and brick resolve,
    with ray compaction for the straggler tail.

    Every round costs O(N) regardless of how many lanes still march (gathers
    and the fine loop can't be masked away), and worst-case lanes (grazing
    rays) need ~20-30 rounds while most finish in 1-3. So: run full-width
    rounds only until the active count drops below N/compact_fraction, then
    gather the survivors into a compact array, drain them there, and scatter
    the results back — the classic wavefront-compaction trick, shapes static
    throughout.
    """

    N = state.cell.shape[0]
    M = _compact_size_static(N, compact_fraction)

    def cond_many(carry):
        s, i = carry
        active = ~s.done & (s.mat == 0)
        # round cap: worst case is a long traversal of occupied-but-transparent
        # (liquid) bricks at >= 2 crossings per round within the step budget
        return ((i >> 16) < 192) & (jnp.sum(active) > M)

    def cond_all(carry):
        s, i = carry
        return ((i >> 16) < 192) & jnp.any(~s.done & (s.mat == 0))

    def body(carry):
        s, i = carry
        s, parked, it = _empty_march(scene, s, budget)
        s = _brick_phase(scene, s, parked, cfg, budget, shadow)
        return s, i + (1 << 16) + it
        # ^ i packs (outer rounds << 16 | total empty iterations) for stats

    if M >= N:  # too small to be worth compacting
        state, i = jax.lax.while_loop(
            cond_all, body, (state, jnp.asarray(0, jnp.int32))
        )
        return state, i

    # phase 1: full width until few lanes remain
    state, i = jax.lax.while_loop(cond_many, body, (state, jnp.asarray(0, jnp.int32)))

    # phase 2: compact the stragglers and recurse (multi-stage: N/8, N/64, ...)
    active = ~state.done & (state.mat == 0)
    count = jnp.sum(active)
    (idx,) = jnp.nonzero(active, size=M, fill_value=0)
    valid = jnp.arange(M) < count
    sub = jax.tree_util.tree_map(lambda a: a[idx], state)
    sub = sub._replace(done=sub.done | ~valid)
    sub, i2 = fast_march(scene, sub, cfg, budget, shadow, compact_fraction)
    scatter_idx = jnp.where(valid, idx, N)  # out-of-bounds rows are dropped
    state = jax.tree_util.tree_map(
        lambda full, part: full.at[scatter_idx].set(part, mode="drop"),
        state,
        sub,
    )
    return state, i + i2


def _compact_size_static(n: int, frac: int) -> int:
    m = max(n // frac, 256)
    return ((m + 127) // 128) * 128


def _init_state(origin, dirs, ior, start_t=None):
    N = dirs.shape[0]
    f32 = dirs.dtype
    d, step, delta, abs_delta = _build_ray(dirs)
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], (N, 3))
    origin = origin.astype(f32)
    if start_t is not None:
        # fast-forward along the ray (progressive refinement seeding — the
        # mid/full_res "sourceRay" trick, mid_res.frag:219)
        origin = origin + jnp.maximum(start_t, 0.0)[:, None] * d
    cell = jnp.floor(origin).astype(jnp.int32)
    tmax = _init_tmax(origin, cell, step, delta, abs_delta)
    return _March(
        mat=jnp.zeros(N, jnp.int32),
        cell=cell,
        dir=d,
        step=step,
        abs_delta=abs_delta,
        tmax=tmax,
        seg_origin=origin.astype(f32),
        last_t=jnp.zeros(N, f32),
        last_axis=jnp.zeros(N, jnp.int32),
        color_mod=jnp.ones((N, 3), f32),
        ior=ior,
        reflected=jnp.zeros(N, bool),
        done=jnp.zeros(N, bool),
        steps=jnp.zeros(N, jnp.int32),
    )


def _shadow_march_fast(scene: Scene, p, cell, last_axis, step, cfg, sun, active):
    """Sun shadow via the fast machinery (semantics of renderer._shadow_march)."""
    N = p.shape[0]
    d, sstep, sdelta, sabs = _build_ray(jnp.broadcast_to(sun[None, :], p.shape))
    tmax = _init_tmax(p, cell, sstep, sdelta, sabs)
    oh = _onehot(last_axis, p.dtype)
    tmax = tmax - oh * sabs  # step out through the hit face (frag:380)
    s = _March(
        mat=jnp.zeros(N, jnp.int32),
        cell=cell,
        dir=d,
        step=sstep,
        abs_delta=sabs,
        tmax=tmax,
        seg_origin=p,
        last_t=jnp.zeros(N, p.dtype),
        last_axis=last_axis,
        color_mod=jnp.ones((N, 3), p.dtype),
        ior=jnp.ones(N, p.dtype),
        reflected=jnp.zeros(N, bool),
        done=~active,
        steps=jnp.zeros(N, jnp.int32),
    )
    # the shadow loop starts by stepping (frag:383-387), i.e. the origin cell
    # (the hit block itself) is not re-tested: take one DDA step first
    ax = _argmin_axis(s.tmax)
    oh2 = _onehot(ax, p.dtype)
    t_cross = _get(s.tmax, ax)
    m3 = active[:, None]
    s = s._replace(
        cell=jnp.where(m3, s.cell + (oh2 * s.step).astype(jnp.int32), s.cell),
        tmax=jnp.where(m3, s.tmax + oh2 * s.abs_delta, s.tmax),
        last_axis=jnp.where(active, ax, s.last_axis),
        last_t=jnp.where(active, t_cross, s.last_t),
        steps=s.steps + active.astype(jnp.int32),
    )
    # evaluate the first stepped-into cell, then continue with the fast march
    m16 = lookup_mat16(scene, s.cell)
    first_mat = m16 & 0xFF
    first_fl = m16 >> 8
    first_hit = active & (first_mat != 0) & ((first_fl & int(Properties.LIQUID)) == 0)
    s = s._replace(
        mat=jnp.where(first_hit, first_mat, 0),
        done=s.done | first_hit,
    )
    s, _ = fast_march(scene, s, cfg, jnp.asarray(cfg.shadow_steps, jnp.int32), shadow=True)
    return active & (s.mat != 0)


def render_rays_fast(scene: Scene, origin, dirs, cfg: RenderConfig, start_t=None):
    """Fast-path render of arbitrary rays -> (rgb [N,3], aux).

    ``start_t`` (f32[N], optional) fast-forwards each ray by a known-safe
    parameter distance before marching (progressive-refinement seeding).
    """
    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    N = dirs.shape[0]

    sun = jnp.asarray(cfg.sun_dir, f32)
    sun = sun / jnp.linalg.norm(sun)

    # starting-cell specials (frag:299-307), evaluated at the (possibly
    # fast-forwarded) start point
    s = _init_state(origin, dirs, jnp.ones(N, f32), start_t=start_t)
    m16_0 = lookup_mat16(scene, s.cell)
    mat0 = m16_0 & 0xFF
    flags0 = m16_0 >> 8
    refr0 = (flags0 & int(Properties.REFRACTIVE)) > 0
    raw0 = (mat0 != 0) & ~refr0
    ior = jnp.where((mat0 != 0) & refr0, 1.1, 1.0).astype(f32)
    s = s._replace(ior=ior)
    s = s._replace(done=raw0, mat=jnp.where(raw0, mat0, 0))
    s, stats = fast_march(scene, s, cfg, jnp.asarray(cfg.max_steps, jnp.int32), shadow=False)

    def shadow_fn(p, cell, last_axis, step, active):
        return _shadow_march_fast(scene, p, cell, last_axis, step, cfg, sun, active)

    col, aux = shade(scene, s, raw0, mat0, sun, cfg, shadow_fn)
    aux["march_rounds"] = stats >> 16
    aux["march_empty_iters"] = stats & 0xFFFF
    return col, aux


def render_image_fast(scene: Scene, camera: Camera, cfg: RenderConfig):
    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    col, _ = render_rays_fast(scene, camera.pos, dirs, cfg)
    img = col.reshape(cfg.height, cfg.width, 3)
    if cfg.crosshair:
        yy = jnp.arange(cfg.height, dtype=jnp.float32)[:, None]
        xx = jnp.arange(cfg.width, dtype=jnp.float32)[None, :]
        mrow, mcol = cfg.mouse_px
        d2 = (yy - mrow) ** 2 + (xx - mcol) ** 2
        img = jnp.where((d2 <= 9.0)[:, :, None], 1.0, img)
    return img


import functools


@functools.lru_cache(maxsize=64)
def _render_fast_jit_for(cfg: RenderConfig):
    return jax.jit(lambda sc, cam: render_image_fast(sc, cam, cfg))


def render_fast_jit(scene: Scene, camera: Camera, cfg: RenderConfig):
    return _render_fast_jit_for(cfg)(scene, camera)
