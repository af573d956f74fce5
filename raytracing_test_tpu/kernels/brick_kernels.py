"""Compiled Pallas kernels for the brick-hierarchical march.

These replace render/bricks.py's two inner while_loops one-for-one:

  - **kernel A** (`brick_loop_pallas`): the empty-space march. Per iteration it
    looks up the brick-level Chebyshev distance via an in-kernel MXU one-hot
    matmul against the VMEM-resident nibble table (every op Mosaic-legal: iota,
    compare, dot, reduce — no gather), then bulk-advances through the certified
    empty brick box with the exact AABB arithmetic of fast._aabb_advance_bounds.
    Lanes halt at occupied bricks (or terminate on window/sky/budget rules).
  - **kernel B** (`fine_loop_pallas`): per-voxel DDA inside one occupied brick.
    The brick's 64-byte material row arrives as 16 packed i32 word PLANES (the
    XLA round driver row-gathers them), so each step's voxel lookup is a
    16-way register select + byte extract — zero memory traffic. Lanes stop on
    hits (LUT-classified), on material events (reflect/refract blocks — the
    XLA driver applies renderer.material_step between kernel invocations), on
    leaving the fetched brick, or on budget freeze.

The round structure, row gathers, compaction and material glue stay in XLA
(render/bricks.py `brick_march(fine_loop=..., brick_loop=...)`). Both kernels
run `interpret=True` on CPU (bit-exact vs the XLA twins — tests) and compile
unmodified on the TPU. Reference anchor: low_res.frag:309-315 march /
:493-532 descent / :317-333 material loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.flatten import Scene
from ..core.types import Properties
from ..render import bricks as _bx
from ..render.renderer import (
    _argmin_axis,
    _get,
    _onehot,
    classify,
    material_step,
)

_LANES = 128
_TILE_ROWS = 32  # (rows, 128) ray tile per grid step; tuned on-chip (bigger
# tiles amortize Mosaic per-tile overhead ~2-4x vs 8 rows)
_ITER_CAP = 4096
_BIG = 1 << 20
_MAX_JUMP = 512

# toggle: express the one-hot contraction as a true 2D matmul via
# major-dim reshapes (fast path) or as a 3D dot_general (conservative)
_USE_2D_DOT = True


def _nib_lookup_kernel(tab_bf16, blin, ar_a, ar_b, A: int, B: int, R: int):
    """In-kernel brick-distance nibble lookup: one-hot MXU matmul + VPU select.
    tab_bf16: (A, B) bf16 byte table; blin: (R, 128) i32 nibble index;
    ar_a/ar_b: hoisted iotas (built once outside the march loop)."""
    byte_idx = blin >> 1
    hi = byte_idx // B
    lo = byte_idx % B
    oh = (hi[:, :, None] == ar_a).astype(jnp.bfloat16)
    if _USE_2D_DOT:
        oh2 = oh.reshape(R * _LANES, A)
        m1 = jax.lax.dot_general(
            oh2, tab_bf16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        ).reshape(R, _LANES, B)
    else:
        m1 = jax.lax.dot_general(
            oh, tab_bf16, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
    # bf16 select is exact: table entries are bytes (<=255)
    byte = (
        jnp.where(lo[:, :, None] == ar_b, m1, jnp.bfloat16(0.0))
        .sum(axis=2, dtype=jnp.float32)
        .astype(jnp.int32)
    )
    return (byte >> ((blin & 1) << 2)) & 0xF


def _axis_count(t_m, t, a, n, is_exit):
    """Crossings consumed per axis inside the box (fast._aabb_advance_bounds)."""
    i32 = jnp.int32
    c = jnp.where(t_m >= t, jnp.floor((t_m - t) / a).astype(i32) + 1, 0)
    c = jnp.minimum(c, n - 1)
    c = jnp.where(is_exit, n, c)
    return jnp.maximum(c, 0)


# --------------------------------------------------------------------------
# kernel A: empty-space brick march


def _brick_kernel(
    scal_ref,  # SMEM (2,): [y_max, budget]
    tab_ref,
    cx0, cy0, cz0, tx0, ty0, tz0, sx0, sy0, sz0, ax0, ay0, az0,
    mat0, done0, lt0, la0, st0,
    omat, ocx, ocy, ocz, otx, oty, otz, olt, ola, ost, odone,
    *,
    shape3, bgrid, sh, A, B,
):
    Sx, Sy, Sz = shape3
    Bx, By, Bz = bgrid
    f32, i32 = jnp.float32, jnp.int32
    R = _TILE_ROWS
    y_max = scal_ref[0]
    budget = scal_ref[1]
    tab = tab_ref[:].astype(jnp.bfloat16)
    ar_a = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES, A), 2)
    ar_b = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES, B), 2)

    sx, sy, sz = sx0[:], sy0[:], sz0[:]
    ax, ay, az = ax0[:], ay0[:], az0[:]
    isx = jnp.where(sx > 0, 1, -1).astype(i32)
    isy = jnp.where(sy > 0, 1, -1).astype(i32)
    isz = jnp.where(sz > 0, 1, -1).astype(i32)
    px, nx_ = sx > 0, sx < 0
    py, ny_ = sy > 0, sy < 0
    pz, nz_ = sz > 0, sz < 0

    def step(carry):
        # `done` is carried as i32 (Mosaic cannot legalize i1 vector carries
        # through scf.while) and converted to a mask per iteration
        cx, cy, cz, tx, ty, tz, mat, lt, la, st, done_i, it = carry
        done = done_i != 0

        # ---- brick distance at the current cell (the ONE lookup)
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        in_w = (wx < Sx) & (wy < Sy) & (wz < Sz)
        blin = ((wx >> sh) * By + (wy >> sh)) * Bz + (wz >> sh)
        d = _nib_lookup_kernel(tab, jnp.where(in_w, blin, 0), ar_a, ar_b, A, B, R)
        d = jnp.where(in_w, d, 1)

        # ---- exit rules + current-cell mat write (bricks._brick_loop)
        opx, onx = cx >= Sx, cx < 0
        opy, ony = cy >= Sy, cy < 0
        opz, onz = cz >= Sz, cz < 0
        inside = ~(opx | onx | opy | ony | opz | onz)
        away = (
            (opx & px) | (onx & nx_)
            | (opy & py) | (ony & ny_)
            | (opz & pz) | (onz & nz_)
        )
        sky = (cy > y_max) & py
        air_here = ~done & ~(in_w & (d == 0))
        mat = jnp.where(air_here, 0, mat)
        done = done | (~done & (away | sky))
        march = ~done & ~(in_w & (d == 0))

        # ---- empty brick box / outside slab bounds
        r = jnp.maximum(d - 1, 0)
        bcx, bcy, bcz = wx >> sh, wy >> sh, wz >> sh
        lox = jnp.where(inside, (bcx - r) << sh, jnp.where(opx, Sx, -_BIG))
        hix = jnp.where(inside, ((bcx + r + 1) << sh) - 1, jnp.where(onx, -1, _BIG))
        loy = jnp.where(inside, (bcy - r) << sh, jnp.where(opy, Sy, -_BIG))
        hiy = jnp.where(inside, ((bcy + r + 1) << sh) - 1, jnp.where(ony, -1, _BIG))
        loz = jnp.where(inside, (bcz - r) << sh, jnp.where(opz, Sz, -_BIG))
        hiz = jnp.where(inside, ((bcz + r + 1) << sh) - 1, jnp.where(onz, -1, _BIG))

        nx = jnp.clip(jnp.where(px, hix + 1 - cx, cx - lox + 1), 1, _MAX_JUMP)
        ny = jnp.clip(jnp.where(py, hiy + 1 - cy, cy - loy + 1), 1, _MAX_JUMP)
        nz = jnp.clip(jnp.where(pz, hiz + 1 - cz, cz - loz + 1), 1, _MAX_JUMP)

        tex = tx + (nx - 1).astype(f32) * ax
        tey = ty + (ny - 1).astype(f32) * ay
        tez = tz + (nz - 1).astype(f32) * az
        mx = (tex < tey) & (tex < tez)
        my = ~mx & (tey < tez)
        mz = ~(mx | my)
        t_m = jnp.where(mx, tex, jnp.where(my, tey, tez))

        ccx = _axis_count(t_m, tx, ax, nx, mx)
        ccy = _axis_count(t_m, ty, ay, ny, my)
        ccz = _axis_count(t_m, tz, az, nz, mz)

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

        # march itself is the pending signal: lanes that didn't march this
        # iteration are settled (done or waiting at an occupied brick)
        return cx, cy, cz, tx, ty, tz, mat, lt, la, st, done.astype(i32), jnp.where(
            jnp.any(march), it + 1, _ITER_CAP
        )

    def body(carry):
        # unroll a few march steps per while-iteration: the loop cond's
        # cross-lane any() is a scalar sync — amortize it (extra steps on
        # settled lanes are fully masked no-ops)
        for _ in range(3):
            carry = step(carry)
        return carry

    def cond(carry):
        it = carry[-1]
        return it < _ITER_CAP

    out = jax.lax.while_loop(
        cond,
        body,
        (
            cx0[:], cy0[:], cz0[:], tx0[:], ty0[:], tz0[:],
            mat0[:], lt0[:], la0[:], st0[:], (done0[:] != 0).astype(i32),
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
    odone[:] = done


# --------------------------------------------------------------------------
# kernel B: fine march inside one fetched brick


def _fine_kernel(
    scal_ref,  # SMEM (9,): hit words [0:4), event words [4:8), budget [8]
    cx0, cy0, cz0, tx0, ty0, tz0, sx0, sy0, sz0, ax0, ay0, az0,
    mat0, done0, lt0, la0, st0, blin0,
    *rows_and_outs,
    shape3, bgrid, sh, n_words,
):
    rows = rows_and_outs[:n_words]
    (omat, ocx, ocy, ocz, otx, oty, otz, olt, ola, ost, odone, oevt) = (
        rows_and_outs[n_words:]
    )
    Sx, Sy, Sz = shape3
    Bx, By, Bz = bgrid
    bs = 1 << sh
    msk = bs - 1
    f32, i32 = jnp.float32, jnp.int32
    blin = blin0[:]
    budget = scal_ref[8]

    sx, sy, sz = sx0[:], sy0[:], sz0[:]
    ax, ay, az = ax0[:], ay0[:], az0[:]

    def lut_bit(base, v):
        """Bit v (0..127) of the 4-word LUT at scal_ref[base:base+4]."""
        w = jnp.where(
            (v >> 5) == 0, scal_ref[base],
            jnp.where((v >> 5) == 1, scal_ref[base + 1],
                      jnp.where((v >> 5) == 2, scal_ref[base + 2], scal_ref[base + 3])),
        )
        # logical shift on the int32 bit pattern (bit 31 must not smear)
        return (jax.lax.shift_right_logical(w, v & 31)) & 1

    def row_byte(vox):
        """Byte `vox` of the fetched 64-byte row (16 packed i32 word planes)."""
        wsel = vox >> 2
        out = jnp.zeros_like(vox)
        for j in range(n_words):
            out = jnp.where(wsel == j, rows[j][:], out)
        return (out >> ((vox & 3) << 3)) & 0xFF

    def body(carry):
        cx, cy, cz, tx, ty, tz, mat, lt, la, st, done_i, evt_i, it = carry
        done = done_i != 0
        evt = evt_i != 0
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        in_w = (wx < Sx) & (wy < Sy) & (wz < Sz)
        cur_blin = ((wx >> sh) * By + (wy >> sh)) * Bz + (wz >> sh)
        active = ~done & ~evt & in_w & (cur_blin == blin) & (blin >= 0)

        vox = ((wx & msk) * bs + (wy & msk)) * bs + (wz & msk)
        m = jnp.where(active, row_byte(vox), 0)
        is_hit = active & (m != 0) & (lut_bit(0, m) > 0)
        is_evt = active & (m != 0) & (lut_bit(4, m) > 0)
        mat = jnp.where(active, m, mat)
        done = done | is_hit
        evt = evt | is_evt

        march = active & ~is_hit & ~is_evt
        mx = (tx < ty) & (tx < tz)
        my = ~mx & (ty < tz)
        mz = ~(mx | my)
        t_m = jnp.where(mx, tx, jnp.where(my, ty, tz))
        stp = jnp.where(march, 1, 0)
        cx = cx + jnp.where(march & mx, jnp.where(sx > 0, 1, -1), 0)
        cy = cy + jnp.where(march & my, jnp.where(sy > 0, 1, -1), 0)
        cz = cz + jnp.where(march & mz, jnp.where(sz > 0, 1, -1), 0)
        tx = jnp.where(march & mx, tx + ax, tx)
        ty = jnp.where(march & my, ty + ay, ty)
        tz = jnp.where(march & mz, tz + az, tz)
        la = jnp.where(march, jnp.where(mx, 0, jnp.where(my, 1, 2)), la)
        lt = jnp.where(march, t_m, lt)
        st = st + stp
        done = done | (march & (st >= budget))
        return (
            cx, cy, cz, tx, ty, tz, mat, lt, la, st,
            done.astype(i32), evt.astype(i32),
            jnp.where(jnp.any(march), it + 1, _ITER_CAP),
        )

    def cond(carry):
        return carry[-1] < _ITER_CAP

    out = jax.lax.while_loop(
        cond,
        body,
        (
            cx0[:], cy0[:], cz0[:], tx0[:], ty0[:], tz0[:],
            mat0[:], lt0[:], la0[:], st0[:], (done0[:] != 0).astype(i32),
            jnp.zeros((_TILE_ROWS, _LANES), i32),
            jnp.zeros((), i32),
        ),
    )
    cx, cy, cz, tx, ty, tz, mat, lt, la, st, done, evt, _ = out
    omat[:] = mat
    ocx[:], ocy[:], ocz[:] = cx, cy, cz
    otx[:], oty[:], otz[:] = tx, ty, tz
    olt[:] = lt
    ola[:] = la
    ost[:] = st
    odone[:] = done
    oevt[:] = evt.astype(i32)


# --------------------------------------------------------------------------
# host plumbing


def _planes(a, n_pad, fill=0):
    if n_pad:
        a = jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])
    return a.reshape(-1, _LANES)


def _state_planes(s, n_pad):
    p = lambda a, fill=0: _planes(a, n_pad, fill)
    return (
        p(s.cell[:, 0]), p(s.cell[:, 1]), p(s.cell[:, 2]),
        p(s.tmax[:, 0]), p(s.tmax[:, 1]), p(s.tmax[:, 2]),
        p(s.step[:, 0], 1.0), p(s.step[:, 1], 1.0), p(s.step[:, 2], 1.0),
        p(s.abs_delta[:, 0], 1.0), p(s.abs_delta[:, 1], 1.0), p(s.abs_delta[:, 2], 1.0),
        p(s.mat), p(s.done.astype(jnp.int32), 1),
        p(s.last_t), p(s.last_axis), p(s.steps),
    )


_STATE_OUT_DTYPES = (
    jnp.int32, jnp.int32, jnp.int32, jnp.int32,  # mat, cx, cy, cz
    jnp.float32, jnp.float32, jnp.float32,  # tx, ty, tz
    jnp.float32, jnp.int32, jnp.int32, jnp.int32,  # lt, la, st, done
)


def _unpack_state(s, outs, N):
    mat, cx, cy, cz, tx, ty, tz, lt, la, st, done = (
        o.reshape(-1)[:N] for o in outs[:11]
    )
    return s._replace(
        mat=mat,
        cell=jnp.stack([cx, cy, cz], axis=1),
        tmax=jnp.stack([tx, ty, tz], axis=1),
        last_t=lt,
        last_axis=la,
        steps=st,
        done=done != 0,
    )


def pallas_supported() -> bool:
    from .support import pallas_supported as _ps

    return _ps()


def brick_loop_pallas(scene: Scene, table, s, budget, interpret):
    """Kernel-A drop-in for bricks._brick_loop."""
    N = s.cell.shape[0]
    tile = _TILE_ROWS * _LANES
    n_pad = (-N) % tile
    NP = N + n_pad
    A, B = table.shape
    kern = functools.partial(
        _brick_kernel,
        shape3=tuple(scene.shape3),
        bgrid=tuple(scene.brick_grid),
        sh=scene.brick_shift,
        A=A, B=B,
    )
    ray_spec = pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))
    tab_spec = pl.BlockSpec(table.shape, lambda i: (0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal = jnp.stack(
        [jnp.asarray(scene.y_max, jnp.int32), jnp.asarray(budget, jnp.int32)]
    )
    outs = pl.pallas_call(
        kern,
        grid=(NP // tile,),
        in_specs=[smem_spec, tab_spec] + [ray_spec] * 17,
        out_specs=[ray_spec] * 11,
        out_shape=[
            jax.ShapeDtypeStruct((NP // _LANES, _LANES), dt) for dt in _STATE_OUT_DTYPES
        ],
        interpret=interpret,
    )(
        scal,
        jnp.asarray(table, jnp.float32),
        *_state_planes(s, n_pad),
    )
    return _unpack_state(s, outs, N)


def _prop_luts(scene: Scene, shadow: bool, enable_materials: bool):
    """8 i32 words (jit-traceable): hit mask [0:4), material-event mask [4:8)
    over material ids (bit i of word i>>5 = property of material id i)."""
    fl = scene.flags
    P = fl.shape[0]
    if P < 128:
        fl = jnp.concatenate([fl, jnp.zeros(128 - P, fl.dtype)])
    else:
        fl = fl[:128]
    ids = jnp.arange(128, dtype=jnp.int32)
    liquid = (fl & int(Properties.LIQUID)) > 0
    f7 = fl & 0x7
    solid = ids > 0
    if shadow:
        hit = solid & ~liquid
        event = jnp.zeros_like(hit)
    elif enable_materials:
        is_refl = solid & (f7 == 0x3)
        is_refr = solid & (f7 == 0x5)
        hit = solid & ~is_refl & ~is_refr
        event = is_refl | is_refr
    else:
        hit = solid
        event = jnp.zeros_like(hit)

    def words(mask):
        bits = mask.astype(jnp.uint32).reshape(4, 32)
        sh = jnp.arange(32, dtype=jnp.uint32)[None, :]
        w = (bits << sh).sum(axis=1, dtype=jnp.uint32)
        return jax.lax.bitcast_convert_type(w, jnp.int32)

    return jnp.concatenate([words(hit), words(event)])


def fine_steps_pallas(scene: Scene, s, rows, blin, budget, luts, interpret):
    """Kernel-B invocation: march lanes inside their fetched bricks until
    hit/event/exit/freeze. Returns (state, evt bool[N])."""
    assert scene.brick_shift == 2, "pallas fine kernel supports 4^3 bricks"
    N = s.cell.shape[0]
    tile = _TILE_ROWS * _LANES
    n_pad = (-N) % tile
    NP = N + n_pad
    n_words = rows.shape[1] // 4
    words = jax.lax.bitcast_convert_type(
        rows.reshape(N, n_words, 4), jnp.int32
    )  # little-endian u8x4 -> i32 words
    word_planes = [_planes(words[:, j], n_pad) for j in range(n_words)]
    kern = functools.partial(
        _fine_kernel,
        shape3=tuple(scene.shape3),
        bgrid=tuple(scene.brick_grid),
        sh=scene.brick_shift,
        n_words=n_words,
    )
    ray_spec = pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal = jnp.concatenate([luts, jnp.asarray(budget, jnp.int32).reshape(1)])
    outs = pl.pallas_call(
        kern,
        grid=(NP // tile,),
        in_specs=[smem_spec] + [ray_spec] * (18 + n_words),
        out_specs=[ray_spec] * 12,
        out_shape=[
            jax.ShapeDtypeStruct((NP // _LANES, _LANES), dt)
            for dt in _STATE_OUT_DTYPES + (jnp.int32,)
        ],
        interpret=interpret,
    )(
        scal,
        *_state_planes(s, n_pad),
        _planes(blin, n_pad, -1),
        *word_planes,
    )
    state = _unpack_state(s, outs, N)
    evt = outs[11].reshape(-1)[:N] != 0
    return state, evt


def make_pallas_loops(interpret=None):
    """(fine_loop, brick_loop) closures for bricks.brick_march.

    The fine loop runs kernel B, then (primary path, materials on) applies
    renderer.material_step + one DDA step to event lanes in XLA and re-enters
    the kernel until no events remain — the same marching sequence as the XLA
    twin's in-loop material handling."""
    if interpret is None:
        interpret = not pallas_supported()

    def brick_loop(scene, table, s, budget):
        return brick_loop_pallas(scene, table, s, budget, interpret)

    def fine_loop(scene, s, rows, blin, cfg_, budget, shadow, time_s):
        luts = _prop_luts(scene, shadow, cfg_.enable_materials)
        s, evt = fine_steps_pallas(scene, s, rows, blin, budget, luts, interpret)
        if shadow or not cfg_.enable_materials:
            return s

        def glue_body(carry):
            s, evt, it = carry
            fl = jnp.take(scene.flags, s.mat)
            is_refl, is_refr, _ = classify(fl, s.mat, evt, cfg_)
            out = material_step(s, is_refl, is_refr, fl, cfg_, time_s)
            (dirx, stepx, absx, tmaxx, segx, last_t, cmod, ior, refl) = out
            s = s._replace(
                dir=dirx, step=stepx, abs_delta=absx, tmax=tmaxx,
                seg_origin=segx, last_t=last_t, color_mod=cmod, ior=ior,
                reflected=refl,
            )
            # the DDA step the twin's fine iteration takes after material_step
            ax = _argmin_axis(s.tmax)
            oh = _onehot(ax, s.dir.dtype)
            t_cross = _get(s.tmax, ax)
            m3 = evt[:, None]
            steps = s.steps + evt.astype(jnp.int32)
            s = s._replace(
                cell=jnp.where(m3, s.cell + (oh * s.step).astype(jnp.int32), s.cell),
                tmax=jnp.where(m3, s.tmax + oh * s.abs_delta, s.tmax),
                last_axis=jnp.where(evt, ax, s.last_axis),
                last_t=jnp.where(evt, t_cross, s.last_t),
                steps=steps,
                done=s.done | (evt & (steps >= budget)),
            )
            s, evt = fine_steps_pallas(scene, s, rows, blin, budget, luts, interpret)
            return s, evt, it + 1

        def glue_cond(carry):
            s, evt, it = carry
            return (it < 64) & jnp.any(evt)

        s, evt, _ = jax.lax.while_loop(
            glue_cond, glue_body, (s, evt, jnp.zeros((), jnp.int32))
        )
        return s

    return fine_loop, brick_loop


def render_rays_bricks_pallas(scene, origin, dirs, cfg, interpret=None, **kw):
    """Full brick-path render with both inner loops on the Pallas kernels.

    compact_min defaults higher than the XLA twin's: every compaction level
    instantiates both kernels, and in-kernel iterations are cheap enough that
    deep straggler compaction buys little — capping recursion bounds compile
    size (the tunneled backend is sensitive to long compiles)."""
    kw.setdefault("compact_min", 16384)
    fine_loop, brick_loop = make_pallas_loops(interpret=interpret)
    return _bx.render_rays_bricks(
        scene, origin, dirs, cfg, fine_loop=fine_loop, brick_loop=brick_loop, **kw
    )


def render_image_bricks_pallas(scene, camera, cfg, interpret=None, time_s=None):
    from ..render.camera import ray_directions

    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    col, _ = render_rays_bricks_pallas(
        scene, camera.pos, dirs, cfg, interpret=interpret, time_s=time_s
    )
    return col.reshape(cfg.height, cfg.width, 3)
