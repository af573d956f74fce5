"""Fused DDA ray-march as a single Pallas TPU kernel.

The XLA fast path (render/fast.py) runs the march as a `lax.while_loop` whose
body is ONE u8 gather from the distance-encoded grid (Scene.grid_enc) plus VPU
math. Under XLA each iteration's gather is an HBM round-trip scheduled by the
compiler. This kernel fuses the ENTIRE march into one Pallas program so the
grid lives in VMEM for the whole march (the default 256x128x256 world is 8 MiB
of u8 — it fits) and the per-iteration gather never touches HBM. It is the
TPU-native descendant of the reference's primary GLSL kernel
(src/shaders/low_res.frag:309-315 march + :493-532 descent), with the tree
descent replaced by the distance-field jump boxes.

Semantics: identical to render/fast.py's `_march_body` WITHOUT the material
(reflection/refraction) block — i.e. the `shadow=True` / `enable_materials=False`
march: Chebyshev jump boxes, analytic window exits, sky-up exit, budget freeze,
reference tie-breaking. Shadow rays see LIQUID as transparent via a re-encoded
grid (liquid cells -> air license 0) instead of a second flags gather, keeping
the kernel at exactly one gather per iteration. Materials stay on the XLA path
(render/fast.py gates them behind `lax.cond`); fusing the material state
machine into the kernel is follow-up work.

Ray state is laid out as (8, 128) f32/i32 lane planes (the native VPU tile);
each grid step marches a 1024-ray tile to completion under an in-kernel
`lax.while_loop`. The grid table has a constant index_map, so Mosaic keeps it
VMEM-resident across grid steps instead of re-fetching per tile.

Pallas/Mosaic compiles DO work through this environment's tunneled TPU
backend (probed 2026-08-18, see CLAUDE.md) — but THIS kernel's one-gather-per-
iteration body needs a big-table `jnp.take`, which Mosaic's lane-shuffle-only
gather cannot lower, so it still runs `interpret=True` only (bit-exact,
CPU-speed). It remains as the semantics bridge / fallback; the compiled-on-
chip production kernel is kernels/brick_kernels.py, whose lookups are
Mosaic-legal (MXU one-hot) by construction. `pallas_supported()` probes once
whether compiled Pallas is available at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..core.flatten import Scene
from ..core.types import Properties
from ..render import fast, renderer
from ..render.camera import Camera, ray_directions

_TILE_ROWS = 8  # (8, 128) f32 native tile => 1024 rays per grid step
_LANES = 128
_TILE = _TILE_ROWS * _LANES
_MAX_JUMP = fast._MAX_JUMP
_BIG = fast._BIG
_ITER_CAP = 4096  # safety bound on in-kernel march iterations


# --------------------------------------------------------------------------
# kernel


def _march_kernel(
    # scalar prefetch-ish SMEM input
    ymax_ref,
    # VMEM table (whole grid, resident across tiles)
    tab_ref,
    # per-ray input planes, all (_TILE_ROWS, 128)
    cx0, cy0, cz0, tx0, ty0, tz0, sx0, sy0, sz0, ax0, ay0, az0, mat0, done0,
    lt0, la0, st0,
    # outputs
    omat, ocx, ocy, ocz, otx, oty, otz, olt, ola, ost, odone,
    *,
    shape3,
    budget,
):
    Sx, Sy, Sz = shape3
    f32 = jnp.float32
    i32 = jnp.int32
    y_max = ymax_ref[0]
    tflat = tab_ref[:].reshape(-1)

    sx, sy, sz = sx0[:], sy0[:], sz0[:]
    ax, ay, az = ax0[:], ay0[:], az0[:]
    isx = jnp.where(sx > 0, 1, -1).astype(i32)
    isy = jnp.where(sy > 0, 1, -1).astype(i32)
    isz = jnp.where(sz > 0, 1, -1).astype(i32)
    px, nx_ = sx > 0, sx < 0  # step sign predicates (reference: +1 unless < 0)
    py, ny_ = sy > 0, sy < 0
    pz, nz_ = sz > 0, sz < 0

    def axis_count(t_m, t, a, n, is_exit):
        """Crossings consumed on one axis inside the box (``_aabb_advance_bounds``):
        floor((t_m - t)/a) + 1 capped at n-1 off the exit axis, n on it."""
        c = jnp.where(t_m >= t, jnp.floor((t_m - t) / a).astype(i32) + 1, 0)
        c = jnp.minimum(c, n - 1)
        c = jnp.where(is_exit, n, c)
        return jnp.maximum(c, 0)

    def body(carry):
        cx, cy, cz, tx, ty, tz, mat, lt, la, st, done, it = carry
        active = ~done

        # ---- the ONE gather: distance-encoded value at the current cell
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        in_w = (wx < Sx) & (wy < Sy) & (wz < Sz)
        lin = (wx * Sy + wy) * Sz + wz
        enc = jnp.take(tflat, jnp.where(in_w, lin, 0)).astype(i32)
        enc = jnp.where(in_w, enc, 129)  # outside the window: air, d >= 1

        # ---- hit test (frag:309-315 break-on-solid)
        matc = jnp.where(enc < 128, enc, 0)
        mat = jnp.where(active, matc, mat)
        done = done | (active & (matc != 0))

        # ---- analytic exits (fast._march_body exit rules)
        opx, onx = cx >= Sx, cx < 0
        opy, ony = cy >= Sy, cy < 0
        opz, onz = cz >= Sz, cz < 0
        away = (
            (opx & px) | (onx & nx_)
            | (opy & py) | (ony & ny_)
            | (opz & pz) | (onz & nz_)
        )
        sky = (cy > y_max) & py
        done = done | (~done & (away | sky))
        march = ~done

        # ---- empty-box bounds: license radius inside, window slab outside
        r = jnp.maximum(enc - 129, 0)
        inside = ~(opx | onx | opy | ony | opz | onz)
        lox = jnp.where(inside, cx - r, jnp.where(opx, Sx, -_BIG))
        hix = jnp.where(inside, cx + r, jnp.where(onx, -1, _BIG))
        loy = jnp.where(inside, cy - r, jnp.where(opy, Sy, -_BIG))
        hiy = jnp.where(inside, cy + r, jnp.where(ony, -1, _BIG))
        loz = jnp.where(inside, cz - r, jnp.where(opz, Sz, -_BIG))
        hiz = jnp.where(inside, cz + r, jnp.where(onz, -1, _BIG))

        nx = jnp.clip(jnp.where(px, hix + 1 - cx, cx - lox + 1), 1, _MAX_JUMP)
        ny = jnp.clip(jnp.where(py, hiy + 1 - cy, cy - loy + 1), 1, _MAX_JUMP)
        nz = jnp.clip(jnp.where(pz, hiz + 1 - cz, cz - loz + 1), 1, _MAX_JUMP)

        tex = tx + (nx - 1).astype(f32) * ax
        tey = ty + (ny - 1).astype(f32) * ay
        tez = tz + (nz - 1).astype(f32) * az
        # exit axis, reference tie-break: x iff strictly smallest, else y iff
        # y < z, else z (nextIntersectDDA, low_res.frag:450-476)
        mx = (tex < tey) & (tex < tez)
        my = ~mx & (tey < tez)
        mz = ~(mx | my)
        t_m = jnp.where(mx, tex, jnp.where(my, tey, tez))

        ccx = axis_count(t_m, tx, ax, nx, mx)
        ccy = axis_count(t_m, ty, ay, ny, my)
        ccz = axis_count(t_m, tz, az, nz, mz)

        cx = jnp.where(march, cx + ccx * isx, cx)
        cy = jnp.where(march, cy + ccy * isy, cy)
        cz = jnp.where(march, cz + ccz * isz, cz)
        tx = jnp.where(march, tx + ccx.astype(f32) * ax, tx)
        ty = jnp.where(march, ty + ccy.astype(f32) * ay, ty)
        tz = jnp.where(march, tz + ccz.astype(f32) * az, tz)
        la = jnp.where(march, jnp.where(mx, 0, jnp.where(my, 1, 2)), la)
        lt = jnp.where(march, t_m, lt)
        st = st + jnp.where(march, ccx + ccy + ccz, 0)
        done = done | (march & (st >= budget))
        return cx, cy, cz, tx, ty, tz, mat, lt, la, st, done, it + 1

    def cond(carry):
        done, it = carry[-2], carry[-1]
        return (it < _ITER_CAP) & jnp.any(~done)

    out = jax.lax.while_loop(
        cond,
        body,
        (
            cx0[:], cy0[:], cz0[:], tx0[:], ty0[:], tz0[:],
            mat0[:], lt0[:], la0[:], st0[:], done0[:] != 0,
            jnp.zeros((), i32),
        ),
    )
    cx, cy, cz, tx, ty, tz, mat, lt, la, st, done, _ = out
    omat[:] = mat
    ocx[:], ocy[:], ocz[:] = cx, cy, cz
    otx[:], oty[:], otz[:] = tx, ty, tz
    olt[:] = lt
    ola[:] = la
    ost[:] = st
    odone[:] = done.astype(i32)


# --------------------------------------------------------------------------
# host wrappers


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """Probe once whether the default backend compiles Pallas/Mosaic kernels
    (the tunneled axon backend HTTP-500s; real TPU slices and CPU both work)."""
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    try:
        x = jnp.zeros((8, 128), jnp.float32)
        np.asarray(
            pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(x)
        )
        return True
    except Exception:
        return False


def _pad_table(grid_enc):
    """Flatten the encoded grid and pad to a (rows, 128) VMEM layout."""
    flat = grid_enc.reshape(-1)
    V = flat.shape[0]
    rows = -(-V // _LANES)
    pad = rows * _LANES - V
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), 129, flat.dtype)])
    return flat.reshape(rows, _LANES)


def _to_planes(a, n_pad, fill):
    a = jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)]) if n_pad else a
    return a.reshape(-1, _LANES)


def march_pallas(table, shape3, y_max, s, budget: int, interpret: bool = True):
    """Run the fused march kernel on a fast._March state (no materials).

    ``table`` is the (rows, 128) padded grid_enc from `_pad_table` — pass the
    liquid-remapped variant for shadow rays. Returns the updated _March.
    """
    N = s.cell.shape[0]
    n_pad = (-N) % _TILE
    NP = N + n_pad
    planes = lambda a, fill=0: _to_planes(a, n_pad, fill)

    ins = (
        jnp.asarray([y_max], jnp.int32),
        table,
        planes(s.cell[:, 0]), planes(s.cell[:, 1]), planes(s.cell[:, 2]),
        planes(s.tmax[:, 0]), planes(s.tmax[:, 1]), planes(s.tmax[:, 2]),
        planes(s.step[:, 0], 1.0), planes(s.step[:, 1], 1.0), planes(s.step[:, 2], 1.0),
        planes(s.abs_delta[:, 0], 1.0), planes(s.abs_delta[:, 1], 1.0), planes(s.abs_delta[:, 2], 1.0),
        planes(s.mat),
        planes(s.done.astype(jnp.int32), 1),  # padding lanes start done
        planes(s.last_t),
        planes(s.last_axis),
        planes(s.steps),  # incoming budget consumption carries over
    )

    nt = NP // _TILE
    ray_spec = pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))
    tab_spec = pl.BlockSpec(table.shape, lambda i: (0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = []
    out_specs = []
    for dt in (
        jnp.int32, jnp.int32, jnp.int32, jnp.int32,  # mat, cx, cy, cz
        jnp.float32, jnp.float32, jnp.float32,  # tx, ty, tz
        jnp.float32, jnp.int32, jnp.int32, jnp.int32,  # lt, la, st, done
    ):
        out_shape.append(jax.ShapeDtypeStruct((NP // _LANES, _LANES), dt))
        out_specs.append(ray_spec)

    kern = functools.partial(_march_kernel, shape3=tuple(shape3), budget=int(budget))
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[smem_spec, tab_spec] + [ray_spec] * 17,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    mat, cx, cy, cz, tx, ty, tz, lt, la, st, done = (o.reshape(-1)[:N] for o in outs)
    return s._replace(
        mat=mat,
        cell=jnp.stack([cx, cy, cz], axis=1),
        tmax=jnp.stack([tx, ty, tz], axis=1),
        last_t=lt,
        last_axis=la,
        steps=st,
        done=done != 0,
    )


def shadow_table(scene: Scene):
    """grid_enc with LIQUID cells re-encoded as license-0 air: shadow rays
    skip liquid (low_res.frag:382-387) without a second flags gather."""
    enc = scene.grid_enc
    mat = jnp.where(enc < 128, enc, 0).astype(jnp.int32)
    liquid = (jnp.take(scene.flags, mat) & int(Properties.LIQUID)) > 0
    liquid = liquid & (enc < 128)
    return _pad_table(jnp.where(liquid, jnp.uint8(129), enc))


def _shadow_march_pallas(scene, stab, p, cell, last_axis, cfg, sun, active, interpret):
    """Sun-shadow occlusion via the kernel (semantics of fast._shadow_march_fast)."""
    N = p.shape[0]
    d, sstep, sdelta, sabs = renderer._build_ray(jnp.broadcast_to(sun[None, :], p.shape))
    tmax = renderer._init_tmax(p, cell, sstep, sdelta, sabs)
    oh = renderer._onehot(last_axis, p.dtype)
    tmax = tmax - oh * sabs  # step out through the hit face (frag:380)
    s = fast._March(
        mat=jnp.zeros(N, jnp.int32),
        cell=cell, dir=d, step=sstep, abs_delta=sabs, tmax=tmax,
        seg_origin=p,
        last_t=jnp.zeros(N, p.dtype),
        last_axis=last_axis,
        color_mod=jnp.ones((N, 3), p.dtype),
        ior=jnp.ones(N, p.dtype),
        reflected=jnp.zeros(N, bool),
        done=~active,
        steps=jnp.zeros(N, jnp.int32),
    )
    # first step is geometric — the hit block itself is not re-tested (frag:383)
    ax = renderer._argmin_axis(s.tmax)
    oh2 = renderer._onehot(ax, p.dtype)
    t_cross = renderer._get(s.tmax, ax)
    m3 = active[:, None]
    s = s._replace(
        cell=jnp.where(m3, s.cell + (oh2 * s.step).astype(jnp.int32), s.cell),
        tmax=jnp.where(m3, s.tmax + oh2 * s.abs_delta, s.tmax),
        last_axis=jnp.where(active, ax, s.last_axis),
        last_t=jnp.where(active, t_cross, s.last_t),
        steps=s.steps + active.astype(jnp.int32),
    )
    Sx, Sy, Sz = scene.shape3
    s = march_pallas(stab, (Sx, Sy, Sz), scene.y_max, s, cfg.shadow_steps, interpret)
    return active & (s.mat != 0)


def render_rays_pallas(scene: Scene, origin, dirs, cfg: RenderConfig, interpret=None):
    """Kernel-path render (primary + shadow marches fused in Pallas).

    Materials and AO are served by the XLA paths; this path requires
    cfg.enable_materials == False (the kernel has no reflect/refract state
    machine yet).
    """
    assert not cfg.enable_materials and not cfg.enable_ao
    if interpret is None:
        interpret = not pallas_supported()
    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    N = dirs.shape[0]
    sun = jnp.asarray(cfg.sun_dir, f32)
    sun = sun / jnp.linalg.norm(sun)

    table = _pad_table(scene.grid_enc)
    stab = shadow_table(scene) if cfg.enable_shadows else table

    # starting-cell specials (frag:299-307), identical to the fast path
    s = fast._init_state(origin, dirs, jnp.ones(N, f32))
    mat0, flags0 = fast.lookup_mat_flags(scene, s.cell)
    refr0 = (flags0 & int(Properties.REFRACTIVE)) > 0
    raw0 = (mat0 != 0) & ~refr0
    ior = jnp.where((mat0 != 0) & refr0, 1.1, 1.0).astype(f32)
    s = s._replace(ior=ior, done=raw0, mat=jnp.where(raw0, mat0, 0))

    Sx, Sy, Sz = scene.shape3
    s = march_pallas(table, (Sx, Sy, Sz), scene.y_max, s, cfg.max_steps, interpret)

    def shadow_fn(p, cell, last_axis, step, active):
        return _shadow_march_pallas(
            scene, stab, p, cell, last_axis, cfg, sun, active, interpret
        )

    return renderer.shade(scene, s, raw0, mat0, sun, cfg, shadow_fn)


def render_image_pallas(scene: Scene, camera: Camera, cfg: RenderConfig, interpret=None):
    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    col, _ = render_rays_pallas(scene, camera.pos, dirs, cfg, interpret=interpret)
    return col.reshape(cfg.height, cfg.width, 3)
