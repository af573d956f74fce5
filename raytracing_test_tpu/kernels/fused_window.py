"""Fused window forward+backward kernel — the round-4 headline path.

The differentiable renderer's guided-window pass (render/diff.py
render_rays_diff_window) was measured wall-to-wall on the v5e (VERIFY_r03):
the 24M-row field fetch rides XLA's gather engine (~380 ms at 1024^2 x 24,
~9.7 ms per M lanes flat) and the backward rides a 24M-row sort-based
dedup scatter (~950-1400 ms against a ~30 ms pure-bandwidth bound,
docs/SPEED_OF_LIGHT.md §4). Both are structural XLA costs, not kernel
quality; this module moves the whole window — enumeration, field fetch,
compositing, AND the gradient accumulation — into one Pallas kernel pair:

  - rays are grouped into spatially coherent 8x32-pixel strips (256 rays);
    each group's 24-step window almost always fits a 32^3-cell axis-aligned
    box of the field (the windows hug one surface patch);
  - the box is DMA'd HBM->VMEM once per group (512 KB); every sample fetch
    is then an in-VMEM MXU one-hot matmul over the box's (x,y) rows — the
    only fast arbitrary in-kernel lookup on this chip (CLAUDE.md). f32
    exactness comes from a hi+lo bf16 split of the box (one-hot products are
    exact; the f32 accumulation reconstructs to ~1 ulp — the established
    contract from the splat lineage);
  - the BACKWARD re-marches the same window (re-march strategy, SURVEY §7
    layer 5 / low_res.frag:309-315 flipped) and accumulates per-sample
    gradients into a VMEM gradient box with the transposed one-hot matmul,
    then merges the box into the HBM gradient field with an in-kernel DMA
    read-modify-write. TPU grid steps execute sequentially on the core, so
    the read-modify-write needs no atomics and NEVER touches XLA's
    element-serialized scatter (the wall that killed ops/splat.py's
    box merge — VERIFY_r03 s3);
  - rays whose window leaves their group's box (depth discontinuities)
    "escape": the kernel zeroes their contributions and flags them, and the
    XLA window path (dedup accumulator) re-renders exactly those rays — the
    fused path is therefore bit-honest for every ray.

Gradient scope: the custom VJP differentiates w.r.t. the FIELD only (density
+ albedo). Camera-pose gradients (through dt) return zero from this engine —
pose fits use accum="dedup" (render/diff.py documents the split).

Reference anchors: the window being fetched is the linearization of the
per-step lookup in low_res.frag:493-532; the march loop re-marched by the
backward is low_res.frag:309-315.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBG = 2          # sublane rows per ray group (256 rays)
_NG = 4            # groups per kernel invocation (1024 rays)
_ROWS = _SUBG * _NG
_B = 32            # field box edge (cells), origin aligned to 8
_B4 = _B * 4       # box lane width: 32 z-cells x 4 channels
_BIG = 1 << 20
_CHUNK_S = 4       # window steps fetched per one-hot matmul chunk


def _enumerate_planes(cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                      S, shape3):
    """Unrolled in-kernel twin of render/diff._enumerate_window's scan: per
    step record (wrapped cell, dt, inside) BEFORE advancing, with the
    reference tie-break (x iff strictly smallest, else y<z, else z —
    renderer._argmin_axis). Returns per-step plane lists + per-lane running
    mins of inside cells (for the group box origin)."""
    Sx, Sy, Sz = shape3
    f32 = jnp.float32
    t_cur = jnp.zeros_like(tx)
    recs = []
    mnx = jnp.full(cx.shape, _BIG, jnp.int32)
    mny = jnp.full(cx.shape, _BIG, jnp.int32)
    mnz = jnp.full(cx.shape, _BIG, jnp.int32)
    for _ in range(S):
        mx = (tx < ty) & (tx < tz)
        my = (~mx) & (ty < tz)
        mz = ~(mx | my)
        t_n = jnp.where(mx, tx, jnp.where(my, ty, tz))
        dt = jnp.maximum(t_n - t_cur, 0.0)
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        inside = (wx < Sx) & (wy < Sy) & (wz < Sz)
        recs.append((wx, wy, wz, dt, inside))
        mnx = jnp.where(inside, jnp.minimum(mnx, wx), mnx)
        mny = jnp.where(inside, jnp.minimum(mny, wy), mny)
        mnz = jnp.where(inside, jnp.minimum(mnz, wz), mnz)
        cx = jnp.where(mx, cx + isx, cx)
        cy = jnp.where(my, cy + isy, cy)
        cz = jnp.where(mz, cz + isz, cz)
        tx = jnp.where(mx, tx + ax, tx)
        ty = jnp.where(my, ty + ay, ty)
        tz = jnp.where(mz, tz + az, tz)
        t_cur = t_n
    return recs, (mnx, mny, mnz)


def _group_box_origin(mn_planes, g, shape3):
    """Scalar box origin for group ``g``: min inside-cell over the group's
    lanes, aligned down to 8, clamped so the box stays in the grid."""
    Sx, Sy, Sz = shape3
    sl = slice(g * _SUBG, (g + 1) * _SUBG)
    mnx, mny, mnz = mn_planes
    ox = jnp.min(mnx[sl])
    oy = jnp.min(mny[sl])
    oz = jnp.min(mnz[sl])
    has_any = ox < _BIG
    ox = jnp.clip(ox & ~7, 0, Sx - _B)
    oy = jnp.clip(oy & ~7, 0, Sy - _B)
    oz = jnp.clip(oz & ~7, 0, Sz - _B)
    return ox, oy, oz, has_any


def _chunk_rows(planes, g, c0):
    """Stack _CHUNK_S per-step (SUBG,128) group slices into one (8,128) chunk
    plane. Row order: [step c0 sub0, step c0 sub1, step c0+1 sub0, ...]."""
    sl = slice(g * _SUBG, (g + 1) * _SUBG)
    return jnp.concatenate([planes[c0 + i][sl] for i in range(_CHUNK_S)], axis=0)


def _split_rows(chunk, s_list):
    """Inverse of _chunk_rows: (8,128,...) -> list of (SUBG,128,...)."""
    return [chunk[i * _SUBG : (i + 1) * _SUBG] for i in range(len(s_list))]


def _fetch_chunk(box_hi, box_lo, lxy, lz, valid):
    """One-hot fetch of (8,128) sample lanes from the VMEM box.

    lxy: i32 (8,128) = lx*B + ly in [0, B^2) (or <0 for no-match);
    lz: i32 (8,128) z-cell in-box (or <0); valid bool (8,128).
    Returns (sigma, alb_r, alb_g, alb_b) f32 (8,128), zero where invalid.
    """
    i32 = jnp.int32
    ar = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B * _B), 2)
    oh = (lxy[:, :, None] == ar).astype(jnp.bfloat16).reshape(
        _ROWS * _LANES, _B * _B
    )
    lines = (
        jax.lax.dot_general(
            oh, box_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            oh, box_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).reshape(_ROWS, _LANES, _B4)
    arc = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B4), 2)
    zsel = (arc >> 2) == lz[:, :, None]
    vals = []
    for c in range(4):
        m = zsel & ((arc & 3) == c)
        v = jnp.where(m, lines, 0.0).sum(axis=2)
        vals.append(jnp.where(valid, v, 0.0))
    return vals


def _accum_chunk(gbox, lxy, lz, gvec):
    """Transpose of _fetch_chunk: accumulate per-sample gradient rows into the
    (B*B, B4) f32 gradient box. gvec: 4 x f32 (8,128) (already masked)."""
    i32 = jnp.int32
    f32 = jnp.float32
    arc = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B4), 2)
    zsel = (arc >> 2) == lz[:, :, None]
    V = jnp.zeros((_ROWS, _LANES, _B4), f32)
    for c in range(4):
        m = zsel & ((arc & 3) == c)
        V = jnp.where(m, gvec[c][:, :, None], V)
    V = V.reshape(_ROWS * _LANES, _B4)
    V_hi = V.astype(jnp.bfloat16)
    V_lo = (V - V_hi.astype(f32)).astype(jnp.bfloat16)
    ar = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B * _B), 2)
    oh = (lxy[:, :, None] == ar).astype(jnp.bfloat16).reshape(
        _ROWS * _LANES, _B * _B
    )
    part = jax.lax.dot_general(
        oh, V_hi, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        oh, V_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return gbox + part


def _local_coords(recs_g, ox, oy, oz):
    """Per-step local box coords + masks for one group. recs_g: list of
    (wx, wy, wz, dt, inside) (SUBG,128) planes. Returns per-step
    (lxy, lz, contrib) + the group's escaped plane (SUBG,128)."""
    escaped = None
    out = []
    for wx, wy, wz, dt, inside in recs_g:
        lx = wx - ox
        ly = wy - oy
        lz = wz - oz
        inbox = (
            (lx >= 0) & (lx < _B) & (ly >= 0) & (ly < _B)
            & (lz >= 0) & (lz < _B)
        )
        esc_s = inside & ~inbox
        escaped = esc_s if escaped is None else (escaped | esc_s)
        contrib = inside & inbox
        lxy = jnp.where(contrib, lx * _B + ly, -1)
        lzc = jnp.where(contrib, lz, -1)
        out.append((lxy, lzc, contrib))
    return out, escaped


def _box_dma(ref3, boxbuf, sem, ox, oy, oz):
    return pltpu.make_async_copy(
        ref3.at[pl.ds(ox, _B), pl.ds(oy, _B), pl.ds(oz * 4, _B4)],
        boxbuf,
        sem,
    )


def _fwd_kernel(cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                field3,
                osr, osg, osb, otend, oesc,
                boxbuf, sem,
                *, shape3, S):
    f32 = jnp.float32
    recs, mn = _enumerate_planes(
        cx[:], cy[:], cz[:], tx[:], ty[:], tz[:],
        isx[:], isy[:], isz[:], ax[:], ay[:], az[:], S, shape3,
    )
    n_chunks = S // _CHUNK_S
    for g in range(_NG):
        gsl = slice(g * _SUBG, (g + 1) * _SUBG)
        ox, oy, oz, has_any = _group_box_origin(mn, g, shape3)

        @pl.when(has_any)
        def _():
            dma = _box_dma(field3, boxbuf, sem, ox, oy, oz)
            dma.start()
            dma.wait()

        box2 = boxbuf[:].reshape(_B * _B, _B4)
        box_hi = box2.astype(jnp.bfloat16)
        box_lo = (box2 - box_hi.astype(f32)).astype(jnp.bfloat16)

        recs_g = [tuple(p[gsl] for p in r[:3]) + (r[3][gsl], r[4][gsl])
                  for r in recs]
        loc, escaped = _local_coords(recs_g, ox, oy, oz)

        # fetch all S steps in _CHUNK_S-step one-hot chunks
        sig, alr, alg, alb = [], [], [], []
        for c0 in range(0, S, _CHUNK_S):
            lxy = jnp.concatenate([loc[c0 + i][0] for i in range(_CHUNK_S)])
            lz = jnp.concatenate([loc[c0 + i][1] for i in range(_CHUNK_S)])
            vd = jnp.concatenate([loc[c0 + i][2] for i in range(_CHUNK_S)])

            def fetch(_):
                return tuple(_fetch_chunk(box_hi, box_lo, lxy, lz, vd))

            def zeros(_):
                z = jnp.zeros((_ROWS, _LANES), f32)
                return z, z, z, z

            v0, v1, v2, v3 = jax.lax.cond(has_any, fetch, zeros, 0)
            sig += _split_rows(v0, range(_CHUNK_S))
            alr += _split_rows(v1, range(_CHUNK_S))
            alg += _split_rows(v2, range(_CHUNK_S))
            alb += _split_rows(v3, range(_CHUNK_S))

        # sequential compositing (identical recurrence to the XLA window's
        # exp-of-cumsum formulation up to fp reassociation)
        trans = jnp.ones((_SUBG, _LANES), f32)
        acc = [jnp.zeros((_SUBG, _LANES), f32) for _ in range(3)]
        for s in range(S):
            dt = recs_g[s][3]
            e = jnp.exp(-sig[s] * dt)
            w = trans * (1.0 - e)
            acc[0] = acc[0] + w * alr[s]
            acc[1] = acc[1] + w * alg[s]
            acc[2] = acc[2] + w * alb[s]
            trans = trans * e
        osr[gsl] = acc[0]
        osg[gsl] = acc[1]
        osb[gsl] = acc[2]
        otend[gsl] = trans
        oesc[gsl] = escaped.astype(jnp.int32)


def _bwd_kernel(cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                gr, gg, gb, gt,
                field3, grad_in,
                grad_out,
                boxbuf, gboxbuf, sem,
                *, shape3, S):
    del grad_in  # aliased with grad_out; all access goes through grad_out
    f32 = jnp.float32
    recs, mn = _enumerate_planes(
        cx[:], cy[:], cz[:], tx[:], ty[:], tz[:],
        isx[:], isy[:], isz[:], ax[:], ay[:], az[:], S, shape3,
    )
    for g in range(_NG):
        gsl = slice(g * _SUBG, (g + 1) * _SUBG)
        ox, oy, oz, has_any = _group_box_origin(mn, g, shape3)

        @pl.when(has_any)
        def _():
            dma = _box_dma(field3, boxbuf, sem, ox, oy, oz)
            dma.start()
            dma.wait()

        box2 = boxbuf[:].reshape(_B * _B, _B4)
        box_hi = box2.astype(jnp.bfloat16)
        box_lo = (box2 - box_hi.astype(f32)).astype(jnp.bfloat16)

        recs_g = [tuple(p[gsl] for p in r[:3]) + (r[3][gsl], r[4][gsl])
                  for r in recs]
        loc, escaped = _local_coords(recs_g, ox, oy, oz)
        live = ~escaped  # escaped rays' grads flow via the XLA fallback

        sig, alr, alg, alb = [], [], [], []
        for c0 in range(0, S, _CHUNK_S):
            lxy = jnp.concatenate([loc[c0 + i][0] for i in range(_CHUNK_S)])
            lz = jnp.concatenate([loc[c0 + i][1] for i in range(_CHUNK_S)])
            vd = jnp.concatenate([loc[c0 + i][2] for i in range(_CHUNK_S)])

            def fetch(_):
                return tuple(_fetch_chunk(box_hi, box_lo, lxy, lz, vd))

            def zeros(_):
                z = jnp.zeros((_ROWS, _LANES), f32)
                return z, z, z, z

            v0, v1, v2, v3 = jax.lax.cond(has_any, fetch, zeros, 0)
            sig += _split_rows(v0, range(_CHUNK_S))
            alr += _split_rows(v1, range(_CHUNK_S))
            alg += _split_rows(v2, range(_CHUNK_S))
            alb += _split_rows(v3, range(_CHUNK_S))

        # forward recompute storing T_s, e_s, w_s, A_s
        g_r, g_g, g_b, g_T = gr[gsl], gg[gsl], gb[gsl], gt[gsl]
        trans = jnp.ones((_SUBG, _LANES), f32)
        Ts, es, ws, As = [], [], [], []
        for s in range(S):
            dt = recs_g[s][3]
            e = jnp.exp(-sig[s] * dt)
            w = trans * (1.0 - e)
            A = alr[s] * g_r + alg[s] * g_g + alb[s] * g_b
            Ts.append(trans)
            es.append(e)
            ws.append(w)
            As.append(A)
            trans = trans * e
        t_end = trans

        # reverse sweep: suffix_s = sum_{j>s} w_j A_j
        suffix = jnp.zeros((_SUBG, _LANES), f32)
        gvecs = [None] * S
        for s in range(S - 1, -1, -1):
            dt = recs_g[s][3]
            g_od = Ts[s] * es[s] * As[s] - suffix - t_end * g_T
            g_sig = g_od * dt
            m = (loc[s][2] & live).astype(f32)
            gvecs[s] = (
                g_sig * m,
                ws[s] * g_r * m,
                ws[s] * g_g * m,
                ws[s] * g_b * m,
            )
            suffix = suffix + ws[s] * As[s]

        # accumulate the group's gradient box with transposed one-hot matmuls
        gboxbuf[:] = jnp.zeros((_B * _B, _B4), f32)
        for c0 in range(0, S, _CHUNK_S):
            lxy = jnp.concatenate([loc[c0 + i][0] for i in range(_CHUNK_S)])
            lz = jnp.concatenate([loc[c0 + i][1] for i in range(_CHUNK_S)])
            gv = [
                jnp.concatenate([gvecs[c0 + i][c] for i in range(_CHUNK_S)])
                for c in range(4)
            ]

            def accum(gb):
                return _accum_chunk(gb, lxy, lz, gv)

            gboxbuf[:] = jax.lax.cond(
                has_any, accum, lambda gb: gb, gboxbuf[:]
            )

        # merge: in-kernel DMA read-modify-write (grid steps are sequential
        # on the TPU core, so this needs no atomics and no XLA scatter)
        @pl.when(has_any)
        def _():
            rd = _box_dma(grad_out, boxbuf, sem, ox, oy, oz)
            rd.start()
            rd.wait()
            boxbuf[:] = boxbuf[:] + gboxbuf[:].reshape(_B, _B, _B4)
            wr = pltpu.make_async_copy(
                boxbuf,
                grad_out.at[pl.ds(ox, _B), pl.ds(oy, _B), pl.ds(oz * 4, _B4)],
                sem,
            )
            wr.start()
            wr.wait()


# --------------------------------------------------------------------------
# host-side op with custom VJP


def _ray_plane_specs(n):
    return [pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)) for _ in range(n)]


@functools.lru_cache(maxsize=8)
def _make_window_op(shape3, S, interpret):
    """(field3, 12 ray planes) -> (surf_r, surf_g, surf_b, t_end, escaped).

    Planes are (G*_ROWS, 128) arrays; G = rows/_ROWS grid steps. The custom
    VJP differentiates w.r.t. field3 ONLY (zeros for the ray planes)."""
    Sx, Sy, Sz = shape3

    def fwd_call(field3, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(_fwd_kernel, shape3=shape3, S=S)
        outs = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=_ray_plane_specs(12)
            + [pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))] * 5,
            out_shape=[
                jax.ShapeDtypeStruct(planes[0].shape, dt)
                for dt in (jnp.float32,) * 4 + (jnp.int32,)
            ],
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _B4), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(*planes, field3)
        return outs

    def bwd_call(field3, gr, gg, gb, gt, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(_bwd_kernel, shape3=shape3, S=S)
        zeros = jnp.zeros((Sx, Sy, Sz * 4), jnp.float32)
        (grad,) = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=_ray_plane_specs(16)
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_shape=[jax.ShapeDtypeStruct((Sx, Sy, Sz * 4), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _B4), jnp.float32),
                pltpu.VMEM((_B * _B, _B4), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={17: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(*planes, gr, gg, gb, gt, field3, zeros)
        return grad

    @jax.custom_vjp
    def op(field3, *planes):
        return tuple(fwd_call(field3, *planes))

    def op_fwd(field3, *planes):
        return tuple(fwd_call(field3, *planes)), (field3, planes)

    def op_bwd(res, g):
        field3, planes = res
        gr, gg, gb, gt, _ = g
        grad = bwd_call(field3, gr, gg, gb, gt, *planes)
        return (grad,) + tuple(jnp.zeros_like(p) for p in planes)

    op.defvjp(op_fwd, op_bwd)
    return op


# --------------------------------------------------------------------------
# renderer-level wrapper


def _pad_plane(a, n_pad, fill):
    if n_pad:
        a = jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])
    return a.reshape(-1, _LANES)


def _strip_perm(H, W):
    """Row-major pixel order -> 8x32-pixel strips (one ray group each)."""
    gh, gw = 8, 32
    idx = np.arange(H * W).reshape(H, W)
    blocks = idx.reshape(H // gh, gh, W // gw, gw).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1)
    inv = np.empty_like(blocks)
    inv[blocks] = np.arange(H * W)
    return blocks, inv


def window_supported(shape3) -> bool:
    Sx, Sy, Sz = shape3
    return min(Sx, Sy, Sz) >= _B


def render_window_fused(
    scene,
    origin,
    dirs,
    num_steps: int = 24,
    sun_dir=(2.0, 1.0, 4.0),
    sky: bool = True,
    start_t=None,
    image_hw=None,
    interpret=None,
    escape_div: int = 16,
):
    """Drop-in for render/diff.render_rays_diff_window (accum='fused'):
    volumetric window render whose forward fetch and backward accumulation
    run in the Pallas kernel pair above. Field gradients only (ray-geometry
    cotangents are zero — use accum='dedup' for camera-pose fits).

    ``escape_div``: escaped-ray budget N/escape_div for the compact XLA
    fallback; more escapes than that re-renders the frame on the XLA path
    (exactness over speed, lax.cond'd).
    """
    from ..render.diff import (
        DiffScene, render_rays_diff_window, _pack_fields,
    )
    from ..render.renderer import _build_ray, _init_tmax, skybox
    from .support import pallas_supported

    if interpret is None:
        interpret = not pallas_supported()
    f32 = jnp.float32
    dirs = jnp.asarray(dirs, f32)
    origin = jnp.asarray(origin, f32)
    N = dirs.shape[0]
    Sx, Sy, Sz = scene.density.shape
    if not window_supported((Sx, Sy, Sz)):
        return render_rays_diff_window(
            scene, origin, dirs, num_steps=num_steps, sun_dir=sun_dir,
            sky=sky, start_t=start_t, accum="dedup", enumerate_mode="vec",
        )
    S = int(num_steps)
    assert S % _CHUNK_S == 0, f"num_steps {S} must be a multiple of {_CHUNK_S}"

    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], (N, 3))

    perm = inv = None
    if image_hw is not None:
        H, W = image_hw
        if H % 8 == 0 and W % 32 == 0 and H * W == N:
            pb, inv_ = _strip_perm(H, W)
            perm = jnp.asarray(pb)
            inv = jnp.asarray(inv_)
            dirs = jnp.take(dirs, perm, axis=0)
            origin = jnp.take(origin, perm, axis=0)
            if start_t is not None:
                start_t = jnp.take(jnp.asarray(start_t, f32), perm)

    # identical preamble to render_rays_diff_window: slab fast-forward + seed
    d, step, delta, abs_delta = _build_ray(dirs)
    hi = jnp.asarray([Sx, Sy, Sz], f32)
    t1 = (0.0 - origin) * delta
    t2 = (hi[None, :] - origin) * delta
    t_entry = jnp.max(jnp.minimum(t1, t2), axis=1)
    t0 = jnp.maximum(t_entry - 1e-3, 0.0)
    if start_t is not None:
        t0 = jnp.maximum(t0, jax.lax.stop_gradient(jnp.asarray(start_t, f32)))
    origin_b = origin + t0[:, None] * d
    cell = jnp.floor(origin_b).astype(jnp.int32)
    tmax = _init_tmax(origin_b, cell, step, delta, abs_delta)
    istep = step.astype(jnp.int32)

    tile = _ROWS * _LANES
    n_pad = (-N) % tile
    p = lambda a, fill=0: _pad_plane(a, n_pad, fill)
    planes = (
        p(cell[:, 0], _BIG), p(cell[:, 1], _BIG), p(cell[:, 2], _BIG),
        p(tmax[:, 0], 1.0), p(tmax[:, 1], 1.0), p(tmax[:, 2], 1.0),
        p(istep[:, 0], 1), p(istep[:, 1], 1), p(istep[:, 2], 1),
        p(abs_delta[:, 0], 1.0), p(abs_delta[:, 1], 1.0),
        p(abs_delta[:, 2], 1.0),
    )
    packed = _pack_fields(scene)
    field3 = packed.reshape(Sx, Sy, Sz * 4)

    op = _make_window_op((Sx, Sy, Sz), S, bool(interpret))
    sr, sg, sb, tend, esc = op(field3, *planes)
    surf = jnp.stack(
        [v.reshape(-1)[:N] for v in (sr, sg, sb)], axis=1
    )
    t_end = tend.reshape(-1)[:N]
    escaped = esc.reshape(-1)[:N] != 0

    # ---- exact fallback for escaped rays via the XLA window path
    n_esc = escaped.sum()
    K = max(tile, N // escape_div)

    def with_fallback(_):
        (idx,) = jnp.nonzero(escaped, size=K, fill_value=0)
        valid = jnp.arange(K) < n_esc
        sub_o = jnp.take(origin, idx, axis=0)
        sub_d = jnp.take(dirs, idx, axis=0)
        sub_t0 = jnp.take(t0, idx)
        rgb_f = render_rays_diff_window(
            scene, sub_o, sub_d, num_steps=S, sun_dir=sun_dir, sky=False,
            start_t=sub_t0, accum="dedup", enumerate_mode="vec",
        )
        # T_end of the fallback rays, for the sky term
        from ..render.diff import transmittance

        t_f = transmittance(scene, sub_o + sub_t0[:, None] * sub_d, sub_d,
                            num_steps=S)
        safe = jnp.where(valid, idx, N)
        surf2 = surf.at[safe].set(rgb_f, mode="drop")
        tend2 = t_end.at[safe].set(t_f, mode="drop")
        return surf2, tend2

    def full_xla(_):
        rgb_f = render_rays_diff_window(
            scene, origin, dirs, num_steps=S, sun_dir=sun_dir, sky=False,
            start_t=t0, accum="dedup", enumerate_mode="vec",
        )
        from ..render.diff import transmittance

        t_f = transmittance(scene, origin + t0[:, None] * d, dirs,
                            num_steps=S)
        return rgb_f, t_f

    surf, t_end = jax.lax.cond(
        n_esc > 0,
        lambda _: jax.lax.cond(n_esc <= K, with_fallback, full_xla, 0),
        lambda _: (surf, t_end),
        0,
    )

    rgb = surf
    if sky:
        sun = jnp.asarray(sun_dir, f32)
        sun = sun / jnp.linalg.norm(sun)
        rgb = rgb + t_end[:, None] * skybox(d, sun)
    if inv is not None:
        rgb = jnp.take(rgb, inv, axis=0)
    return rgb
