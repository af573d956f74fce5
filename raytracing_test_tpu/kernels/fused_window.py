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
    each group's 24-step window almost always fits a 32x32x64-cell
    axis-aligned box of the field (guided windows hug one surface patch);
  - per-group box ORIGINS are computed on the XLA side from a closed-form
    per-axis crossing-count bound (O(N), not O(N*S)) and enter the kernel
    as SMEM scalars — measured Mosaic rules (PROBE_r04): DMA slice offsets
    must be scalars not derived from in-kernel sliced/masked reductions,
    and the minormost DMA dimension must not carry a dynamic offset at all
    (hence the field's 4D (Sx, Sy, Sz/32, 128) layout: the z offset is an
    integer index of a non-minormost dim; two DMAs fill the box's z halves);
  - the box is DMA'd HBM->VMEM once per group (1 MB); every sample fetch is
    then an in-VMEM MXU one-hot matmul over the box's (x,y) rows — the only
    fast arbitrary in-kernel lookup on this chip (CLAUDE.md). f32 exactness
    comes from a hi+lo bf16 split of the box (one-hot products are exact;
    the f32 accumulation reconstructs to ~1 ulp — the splat lineage's
    established contract). Samples pick their z half by masked one-hots, so
    the 64-deep box costs the same MXU work as a 32-deep one;
  - the BACKWARD re-marches the same window (re-march strategy, SURVEY §7
    layer 5 / low_res.frag:309-315 flipped) and accumulates per-sample
    gradients into a VMEM gradient box with the transposed one-hot matmul,
    then merges the box into the HBM gradient field with an in-kernel DMA
    read-modify-write. TPU grid steps execute sequentially on the core, so
    the read-modify-write needs no atomics and NEVER touches XLA's
    element-serialized scatter (the wall that killed the retired r02-r03
    MXU box-splat lineage — VERIFY_r03 s3);
  - rays whose window leaves their group's box (depth discontinuities,
    wrapped far-out sky seeds) "escape": the kernel zeroes their
    contributions and flags them, and the XLA window path (dedup
    accumulator) re-renders exactly those rays — the fused path is
    therefore bit-honest for every ray.

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
_B = 32            # box x/y edge (cells), origin aligned to 8
_BZ = 64           # box z edge: two 32-cell z blocks (origin aligned to 32)
_ZB = 32           # z cells per field block (minormost dim = 32 z * 4 ch)
_C4 = _ZB * 4      # 128: field block lane width
_BIG = 1 << 20
_CHUNK_S = 4       # window steps fetched per one-hot matmul chunk


def _enumerate_planes(cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                      S, shape3):
    """Unrolled in-kernel twin of render/diff._enumerate_window's scan: per
    step record (wrapped cell, dt, inside) BEFORE advancing, with the
    reference tie-break (x iff strictly smallest, else y<z, else z —
    renderer._argmin_axis)."""
    Sx, Sy, Sz = shape3
    t_cur = jnp.zeros_like(tx)
    recs = []
    for _ in range(S):
        mx = (tx < ty) & (tx < tz)
        my = (~mx) & (ty < tz)
        mz = ~(mx | my)
        t_n = jnp.where(mx, tx, jnp.where(my, ty, tz))
        dt = jnp.maximum(t_n - t_cur, 0.0)
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        # masks travel as i32: sub-8-sublane slices/concats of i1 arrays
        # fail to legalize in Mosaic (CLAUDE.md; PROBE_r04 bisect)
        inside = ((wx < Sx) & (wy < Sy) & (wz < Sz)).astype(jnp.int32)
        recs.append((wx, wy, wz, dt, inside))
        cx = jnp.where(mx, cx + isx, cx)
        cy = jnp.where(my, cy + isy, cy)
        cz = jnp.where(mz, cz + isz, cz)
        tx = jnp.where(mx, tx + ax, tx)
        ty = jnp.where(my, ty + ay, ty)
        tz = jnp.where(mz, tz + az, tz)
        t_cur = t_n
    return recs


def _fetch_chunk(boxA_hi, boxA_lo, boxB_hi, boxB_lo, lxy, lz, valid):
    """One-hot fetch of (8,128) sample lanes from the VMEM box halves.

    lxy: i32 (8,128) = lx*B + ly in [0, B^2) (or <0 for no-match);
    lz: i32 (8,128) local z in [0, BZ) (or <0); valid i32 (8,128).
    Returns (sigma, alb_r, alb_g, alb_b) f32 (8,128), zero where invalid.
    """
    i32 = jnp.int32
    ar = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B * _B), 2)
    oh = (lxy[:, :, None] == ar).astype(jnp.bfloat16).reshape(
        _ROWS * _LANES, _B * _B
    )

    def mm(o, b):
        return jax.lax.dot_general(
            o, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    linesA = (mm(oh, boxA_hi) + mm(oh, boxA_lo)).reshape(
        _ROWS, _LANES, _C4)
    linesB = (mm(oh, boxB_hi) + mm(oh, boxB_lo)).reshape(
        _ROWS, _LANES, _C4)
    arc = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _C4), 2)
    # Mosaic rule (PROBE_r04): never broadcast a 2D bool inside where —
    # materialize the per-sample z at 3D with a broadcast add first
    lz3 = lz[:, :, None] + 0 * arc
    lines = jnp.where(lz3 >= _ZB, linesB, linesA)
    # invalid samples carry col=-1 (matches nothing) instead of a bool mask
    zcol = jnp.where(lz >= 0, lz & (_ZB - 1), -1)
    zsel = (arc >> 2) == zcol[:, :, None]
    vals = []
    for c in range(4):
        m = zsel & ((arc & 3) == c)
        v = jnp.where(m, lines, 0.0).sum(axis=2)
        vals.append(jnp.where(valid > 0, v, 0.0))
    return vals


def _accum_chunk(gbox, lxy, lz, gvec):
    """Transpose of _fetch_chunk: accumulate per-sample gradient rows into
    the (B*B, 2*C4) f32 gradient box. gvec: 4 x f32 (8,128) (masked)."""
    i32 = jnp.int32
    f32 = jnp.float32
    arc = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _C4), 2)
    zcol = jnp.where(lz >= 0, lz & (_ZB - 1), -1)
    zsel = (arc >> 2) == zcol[:, :, None]
    V = jnp.zeros((_ROWS, _LANES, _C4), f32)
    for c in range(4):
        m = zsel & ((arc & 3) == c)
        V = jnp.where(m, gvec[c][:, :, None], V)
    lz3 = lz[:, :, None] + 0 * arc  # no 2D-bool broadcast (PROBE_r04)
    VA = jnp.where(lz3 >= _ZB, 0.0, V).reshape(_ROWS * _LANES, _C4)
    VB = jnp.where(lz3 >= _ZB, V, 0.0).reshape(_ROWS * _LANES, _C4)
    ar = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _B * _B), 2)
    oh = (lxy[:, :, None] == ar).astype(jnp.bfloat16).reshape(
        _ROWS * _LANES, _B * _B
    )

    def mmT(v):
        v_hi = v.astype(jnp.bfloat16)
        v_lo = (v - v_hi.astype(f32)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, v_hi, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + jax.lax.dot_general(
            oh, v_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    gbA, gbB = gbox
    return gbA + mmT(VA), gbB + mmT(VB)


def _local_coords(recs_g, ox, oy, oz):
    """Per-step local box coords + masks for one group (all masks i32).
    Returns per-step (lxy, lz, contrib) + the group's escaped i32 plane."""
    escaped = None
    out = []
    for wx, wy, wz, dt, inside in recs_g:
        lx = wx - ox
        ly = wy - oy
        lz = wz - oz
        inbox = (
            (lx >= 0) & (lx < _B) & (ly >= 0) & (ly < _B)
            & (lz >= 0) & (lz < _BZ)
        ).astype(jnp.int32)
        esc_s = inside * (1 - inbox)
        escaped = esc_s if escaped is None else (escaped | esc_s)
        contrib = inside * inbox
        lxy = jnp.where(contrib > 0, lx * _B + ly, -1)
        lzc = jnp.where(contrib > 0, lz, -1)
        out.append((lxy, lzc, contrib))
    return out, escaped


def _box_read(ref4, boxA, boxB, sem, ox, oy, ozb):
    """Two DMAs HBM->VMEM filling the box's z halves (minormost dim of the
    4D field is fully copied — no dynamic offset there, PROBE_r04)."""
    d1 = pltpu.make_async_copy(
        ref4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb], boxA, sem
    )
    d1.start()
    d1.wait()
    d2 = pltpu.make_async_copy(
        ref4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb + 1], boxB, sem
    )
    d2.start()
    d2.wait()


def _box_write(ref4, boxA, boxB, sem, ox, oy, ozb):
    d1 = pltpu.make_async_copy(
        boxA, ref4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb], sem
    )
    d1.start()
    d1.wait()
    d2 = pltpu.make_async_copy(
        boxB, ref4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb + 1], sem
    )
    d2.start()
    d2.wait()


def _group_coords(recs, g, org):
    """Per-group origin unpack + local coords. Origins arrive bit-packed,
    ONE i32 per group: SMEM is ~16-32 KB and an unpacked (G*NG, 4) table
    broke the compile beyond G=256 (PROBE_r04)."""
    i = pl.program_id(0)
    gi = i * _NG + g
    v = org[gi]
    ox = (v & 127) << 3
    oy = ((v >> 7) & 127) << 3
    ozb = (v >> 14) & 31
    has_any = ((v >> 19) & 1) > 0
    gsl = slice(g * _SUBG, (g + 1) * _SUBG)
    recs_g = [tuple(p[gsl] for p in r[:3]) + (r[3][gsl], r[4][gsl])
              for r in recs]
    loc, escaped = _local_coords(recs_g, ox, oy, ozb * _ZB)
    return gi, gsl, (ox, oy, ozb, has_any), recs_g, loc, escaped


def _group_fetch(recs, g, org, field4, boxA, boxB, sem, S):
    """Shared per-group stage: box DMA + chunked one-hot fetch.
    Returns (recs_g, loc, escaped, sig/alr/alg/alb per-step lists)."""
    f32 = jnp.float32
    gi, gsl, (ox, oy, ozb, has_any), recs_g, loc, escaped = _group_coords(
        recs, g, org)

    @pl.when(has_any)
    def _():
        _box_read(field4, boxA, boxB, sem, ox, oy, ozb)

    bA = boxA[:].reshape(_B * _B, _C4)
    bB = boxB[:].reshape(_B * _B, _C4)
    bA_hi = bA.astype(jnp.bfloat16)
    bA_lo = (bA - bA_hi.astype(f32)).astype(jnp.bfloat16)
    bB_hi = bB.astype(jnp.bfloat16)
    bB_lo = (bB - bB_hi.astype(f32)).astype(jnp.bfloat16)

    sig, alr, alg, alb = [], [], [], []
    for c0 in range(0, S, _CHUNK_S):
        lxy = jnp.concatenate([loc[c0 + k][0] for k in range(_CHUNK_S)])
        lz = jnp.concatenate([loc[c0 + k][1] for k in range(_CHUNK_S)])
        vd = jnp.concatenate([loc[c0 + k][2] for k in range(_CHUNK_S)])

        def fetch(_):
            return tuple(
                _fetch_chunk(bA_hi, bA_lo, bB_hi, bB_lo, lxy, lz, vd)
            )

        def zeros(_):
            z = jnp.zeros((_ROWS, _LANES), f32)
            return z, z, z, z

        v0, v1, v2, v3 = jax.lax.cond(has_any, fetch, zeros, 0)
        for vals, acc in ((v0, sig), (v1, alr), (v2, alg), (v3, alb)):
            for k in range(_CHUNK_S):
                acc.append(vals[k * _SUBG : (k + 1) * _SUBG])
    return gi, gsl, (ox, oy, ozb, has_any), recs_g, loc, escaped, (
        sig, alr, alg, alb)


def _fwd_kernel(org, cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                field4,
                osr, osg, osb, otend, oesc, rsig, ralr, ralg, ralb,
                boxA, boxB, sem,
                *, shape3, S):
    f32 = jnp.float32
    recs = _enumerate_planes(
        cx[:], cy[:], cz[:], tx[:], ty[:], tz[:],
        isx[:], isy[:], isz[:], ax[:], ay[:], az[:], S, shape3,
    )
    for g in range(_NG):
        (_, gsl, _, recs_g, loc, escaped,
         (sig, alr, alg, alb)) = _group_fetch(
            recs, g, org, field4, boxA, boxB, sem, S)

        # sequential compositing (same recurrence as the XLA window's
        # exp-of-cumsum formulation up to fp reassociation); the fetched
        # rows also stream out as residuals so the backward never touches
        # the field again (re-march without re-fetch)
        trans = jnp.ones((_SUBG, _LANES), f32)
        acc = [jnp.zeros((_SUBG, _LANES), f32) for _ in range(3)]
        for s in range(S):
            r0 = s * _ROWS + g * _SUBG
            rsig[r0 : r0 + _SUBG] = sig[s]
            ralr[r0 : r0 + _SUBG] = alr[s]
            ralg[r0 : r0 + _SUBG] = alg[s]
            ralb[r0 : r0 + _SUBG] = alb[s]
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
        oesc[gsl] = escaped


def _bwd_kernel(org, cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                gr, gg, gb, gt, rsig, ralr, ralg, ralb,
                grad_in,
                grad_out,
                boxA, boxB, gboxA, gboxB, sem,
                *, shape3, S):
    del grad_in  # aliased with grad_out; all access goes through grad_out
    f32 = jnp.float32
    recs = _enumerate_planes(
        cx[:], cy[:], cz[:], tx[:], ty[:], tz[:],
        isx[:], isy[:], isz[:], ax[:], ay[:], az[:], S, shape3,
    )
    for g in range(_NG):
        _, gsl, (ox, oy, ozb, has_any), recs_g, loc, escaped = (
            _group_coords(recs, g, org))
        # fetched field rows arrive as residuals from the forward kernel —
        # the backward touches the field ONLY through the gradient merge
        sig = [rsig[s * _ROWS + g * _SUBG : s * _ROWS + (g + 1) * _SUBG]
               for s in range(S)]
        alr = [ralr[s * _ROWS + g * _SUBG : s * _ROWS + (g + 1) * _SUBG]
               for s in range(S)]
        alg = [ralg[s * _ROWS + g * _SUBG : s * _ROWS + (g + 1) * _SUBG]
               for s in range(S)]
        alb = [ralb[s * _ROWS + g * _SUBG : s * _ROWS + (g + 1) * _SUBG]
               for s in range(S)]
        live = 1 - escaped  # escaped rays' grads flow via the XLA fallback

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
            m = (loc[s][2] * live).astype(f32)
            gvecs[s] = (
                g_sig * m,
                ws[s] * g_r * m,
                ws[s] * g_g * m,
                ws[s] * g_b * m,
            )
            suffix = suffix + ws[s] * As[s]

        # accumulate the group's gradient box with transposed one-hot matmuls
        gboxA[:] = jnp.zeros((_B * _B, _C4), f32)
        gboxB[:] = jnp.zeros((_B * _B, _C4), f32)
        for c0 in range(0, S, _CHUNK_S):
            lxy = jnp.concatenate([loc[c0 + k][0] for k in range(_CHUNK_S)])
            lz = jnp.concatenate([loc[c0 + k][1] for k in range(_CHUNK_S)])
            gv = [
                jnp.concatenate([gvecs[c0 + k][c] for k in range(_CHUNK_S)])
                for c in range(4)
            ]

            def accum(gbx):
                return _accum_chunk(gbx, lxy, lz, gv)

            gboxA[:], gboxB[:] = jax.lax.cond(
                has_any, accum, lambda gbx: gbx, (gboxA[:], gboxB[:])
            )

        # merge: in-kernel DMA read-modify-write (grid steps are sequential
        # on the TPU core, so this needs no atomics and no XLA scatter)
        @pl.when(has_any)
        def _():
            _box_read(grad_out, boxA, boxB, sem, ox, oy, ozb)
            boxA[:] = boxA[:] + gboxA[:].reshape(_B, _B, _C4)
            boxB[:] = boxB[:] + gboxB[:].reshape(_B, _B, _C4)
            _box_write(grad_out, boxA, boxB, sem, ox, oy, ozb)


# --------------------------------------------------------------------------
# host-side op with custom VJP


@functools.lru_cache(maxsize=8)
def _make_window_op(shape3, S, interpret):
    """(field4, org, 12 ray planes) -> (surf_r, surf_g, surf_b, t_end,
    escaped). Planes are (G*_ROWS, 128) arrays; org is i32 (G*_NG,)
    bit-packed box origins. The custom VJP differentiates w.r.t. field4
    ONLY (zeros for org and the ray planes)."""
    Sx, Sy, Sz = shape3
    Zb = Sz // _ZB
    ray_specs = [
        pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)) for _ in range(12)
    ]
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def fwd_call(field4, org, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(_fwd_kernel, shape3=shape3, S=S)
        res_shape = (G * S * _ROWS, _LANES)
        res_spec = pl.BlockSpec((S * _ROWS, _LANES), lambda i: (i, 0))
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[smem_spec] + ray_specs + [any_spec],
            out_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))] * 5
            + [res_spec] * 4,
            out_shape=[
                jax.ShapeDtypeStruct(planes[0].shape, dt)
                for dt in (jnp.float32,) * 4 + (jnp.int32,)
            ] + [jax.ShapeDtypeStruct(res_shape, jnp.float32)] * 4,
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(org, *planes, field4)

    def bwd_call(org, gr, gg, gb, gt, res4, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(_bwd_kernel, shape3=shape3, S=S)
        zeros = jnp.zeros((Sx, Sy, Zb, _C4), jnp.float32)
        res_spec = pl.BlockSpec((S * _ROWS, _LANES), lambda i: (i, 0))
        (grad,) = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[smem_spec] + ray_specs
            + [pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))] * 4
            + [res_spec] * 4
            + [any_spec],
            out_specs=[any_spec],
            out_shape=[jax.ShapeDtypeStruct((Sx, Sy, Zb, _C4), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_B * _B, _C4), jnp.float32),
                pltpu.VMEM((_B * _B, _C4), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={21: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(org, *planes, gr, gg, gb, gt, *res4, zeros)
        return grad

    @jax.custom_vjp
    def op(field4, org, *planes):
        return tuple(fwd_call(field4, org, *planes))[:5]

    def op_fwd(field4, org, *planes):
        outs = tuple(fwd_call(field4, org, *planes))
        return outs[:5], (org, planes, outs[5:])

    def op_bwd(res, g):
        org, planes, res4 = res
        gr, gg, gb, gt, _ = g
        grad = bwd_call(org, gr, gg, gb, gt, res4, *planes)
        return (grad, jnp.zeros_like(org)) + tuple(
            jnp.zeros_like(p) for p in planes
        )

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
    return Sx >= _B and Sy >= _B and Sz >= _BZ and Sz % _ZB == 0


def _box_origins(cell, istep, abs_delta, S, shape3, n_pad):
    """Per-group box origins (ox, oy, ozb, has) i32[G*_NG, 4], XLA-side.

    Per-ray window extent from a conservative closed-form crossing-count
    bound: axis a takes at most floor(S * rate_a) + 3 of the first S
    crossings (rate = merge density of the three arithmetic progressions).
    Exactness is NOT required — the kernel's in-box test escapes any ray
    the box fails to cover."""
    i32 = jnp.int32
    Sx, Sy, Sz = shape3
    inv = 1.0 / abs_delta
    rate = inv / inv.sum(axis=1, keepdims=True)
    n_ax = jnp.minimum(S, jnp.floor(S * rate).astype(i32) + 3)
    lo = cell + jnp.where(istep < 0, -n_ax, 0)
    hi = cell + jnp.where(istep > 0, n_ax, 0)
    shp = jnp.asarray([Sx, Sy, Sz], i32)
    valid = jnp.all(hi >= 0, axis=1) & jnp.all(lo < shp[None, :], axis=1)
    lo = jnp.clip(lo, 0, shp[None, :] - 1)
    lo = jnp.where(valid[:, None], lo, _BIG)
    if n_pad:
        lo = jnp.concatenate([lo, jnp.full((n_pad, 3), _BIG, i32)])
    glo = lo.reshape(-1, _SUBG * _LANES, 3).min(axis=1)  # [G*_NG, 3]
    has = (glo[:, 0] < _BIG).astype(i32)
    ox = jnp.clip(glo[:, 0] & ~7, 0, Sx - _B)
    oy = jnp.clip(glo[:, 1] & ~7, 0, Sy - _B)
    ozb = jnp.clip(glo[:, 2] >> 5, 0, Sz // _ZB - 2)
    # bit-pack (SMEM budget): ox/8 (7b) | oy/8 (7b) | ozb (5b) | has (1b)
    return (ox >> 3) | ((oy >> 3) << 7) | (ozb << 14) | (has << 19)


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
    return_aux: bool = False,
    escape_cap: int = None,
    fallback: bool = True,
    overflow: str = "full",
):
    """Drop-in for render/diff.render_rays_diff_window (accum='fused'):
    volumetric window render whose forward fetch and backward accumulation
    run in the Pallas kernel pair above. Field gradients only (ray-geometry
    cotangents are zero — use accum='dedup' for camera-pose fits).

    ``escape_div``: escaped-ray budget N/escape_div for the compact XLA
    fallback; more escapes than that re-renders the frame on the XLA path
    (exactness over speed, lax.cond'd). ``escape_cap`` overrides the budget
    directly (tests)."""
    from ..render.diff import (
        render_rays_diff_window, transmittance, _pack_fields,
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
        rgb = render_rays_diff_window(
            scene, origin, dirs, num_steps=num_steps, sun_dir=sun_dir,
            sky=sky, start_t=start_t, accum="dedup", enumerate_mode="vec",
        )
        if return_aux:
            zi = jnp.zeros((), jnp.int32)
            return rgb, {"escaped": jnp.zeros(N, bool), "n_escaped": zi,
                         "t_end": jnp.zeros(N, f32)}
        return rgb
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
    dead = None
    if start_t is not None:
        st = jax.lax.stop_gradient(jnp.asarray(start_t, f32))
        t0 = jnp.maximum(t0, st)
        from ..render.diff import MISS_SEED_MIN

        dead = st >= MISS_SEED_MIN
    origin_b = origin + t0[:, None] * d
    cell = jnp.floor(origin_b).astype(jnp.int32)
    if dead is not None:
        # miss-sentinel rays render pure sky (shared r04 semantics with the
        # XLA window, render/diff.py MISS_SEED_MIN): park at wrapped cell
        # 1023 so every sample is outside the window — this also removes the
        # wrapped-sky-ray escapes (most of the 0.45% at the bench camera)
        cell = jnp.where(dead[:, None], 1023, cell)
    tmax = _init_tmax(origin_b, cell, step, delta, abs_delta)
    istep = step.astype(jnp.int32)

    tile = _ROWS * _LANES
    n_pad = (-N) % tile
    org = _box_origins(cell, istep, abs_delta, S, (Sx, Sy, Sz), n_pad)
    p = lambda a, fill=0: _pad_plane(a, n_pad, fill)
    planes = (
        p(cell[:, 0], _BIG), p(cell[:, 1], _BIG), p(cell[:, 2], _BIG),
        p(tmax[:, 0], 1.0), p(tmax[:, 1], 1.0), p(tmax[:, 2], 1.0),
        p(istep[:, 0], 1), p(istep[:, 1], 1), p(istep[:, 2], 1),
        p(abs_delta[:, 0], 1.0), p(abs_delta[:, 1], 1.0),
        p(abs_delta[:, 2], 1.0),
    )
    packed = _pack_fields(scene)
    field4 = packed.reshape(Sx, Sy, Sz // _ZB, _C4)

    op = _make_window_op((Sx, Sy, Sz), S, bool(interpret))
    G = planes[0].shape[0] // _ROWS
    MAXG = 1024  # SMEM origin budget (16 KB packed) per pallas_call
    if G <= MAXG:
        sr, sg, sb, tend, esc = op(field4, org, *planes)
    else:
        parts = []
        for g0 in range(0, G, MAXG):
            g1 = min(G, g0 + MAXG)
            o = org[g0 * _NG : g1 * _NG]
            ps = [p[g0 * _ROWS : g1 * _ROWS] for p in planes]
            parts.append(op(field4, o, *ps))
        sr, sg, sb, tend, esc = (
            jnp.concatenate([p[k] for p in parts]) for k in range(5)
        )
    surf = jnp.stack([v.reshape(-1)[:N] for v in (sr, sg, sb)], axis=1)
    t_end = tend.reshape(-1)[:N]
    escaped = esc.reshape(-1)[:N] != 0

    # ---- exact fallback for escaped rays via the XLA window path
    n_esc = escaped.sum()
    K = escape_cap if escape_cap else max(min(N, _LANES), N // escape_div)

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
        safe = jnp.where(valid, idx, N)
        surf2 = surf.at[safe].set(rgb_f, mode="drop")
        if not sky:  # t_end unused: skip the escaped-ray transmittance march
            return surf2, t_end
        t_f = transmittance(
            scene, sub_o + sub_t0[:, None] * sub_d, sub_d, num_steps=S
        )
        tend2 = t_end.at[safe].set(t_f, mode="drop")
        return surf2, tend2

    def full_xla(_):
        rgb_f = render_rays_diff_window(
            scene, origin, dirs, num_steps=S, sun_dir=sun_dir, sky=False,
            start_t=t0, accum="dedup", enumerate_mode="vec",
        )
        if not sky:
            return rgb_f, t_end
        t_f = transmittance(
            scene, origin + t0[:, None] * d, dirs, num_steps=S
        )
        return rgb_f, t_f

    if fallback:
        if overflow == "full":
            # exact everywhere: > K escapes re-render the frame on XLA.
            # NOTE: this doubles the program; the tunneled remote compiler
            # cannot build it at 1024^2 (PROBE_r04) — use overflow="compact"
            # there and size escape_div generously (escapes were 0.45% at the
            # bench camera vs the 6.25% default budget).
            surf, t_end = jax.lax.cond(
                n_esc > 0,
                lambda _: jax.lax.cond(n_esc <= K, with_fallback, full_xla, 0),
                lambda _: (surf, t_end),
                0,
            )
        else:
            # compact-only, STRAIGHT-LINE: escapes > 0 at essentially every
            # real camera, and lax.cond's residual plumbing under grad cost
            # ~100 ms at 1024^2 (VERIFY_r04) — run the compact fallback
            # unconditionally (zero escapes render K dummy rays, masked out
            # by `valid`). Escapes beyond K keep their kernel values (and
            # zero field grads) — aux["n_escaped"] vs K makes the drop loud.
            surf, t_end = with_fallback(0)

    rgb = surf
    if sky:
        sun = jnp.asarray(sun_dir, f32)
        sun = sun / jnp.linalg.norm(sun)
        rgb = rgb + t_end[:, None] * skybox(d, sun)
    if inv is not None:
        rgb = jnp.take(rgb, inv, axis=0)
    if return_aux:
        return rgb, {"escaped": escaped, "n_escaped": n_esc, "t_end": t_end}
    return rgb


def render_window_fused_dp(
    scene,
    origin,
    dirs,
    mesh,
    num_steps: int = 24,
    sun_dir=(2.0, 1.0, 4.0),
    sky: bool = True,
    start_t=None,
    image_hw=None,
    interpret=None,
    escape_div: int = 16,
    overflow: str = "full",
):
    """Data-parallel fused window render: rays (+ seeds) sharded over the
    mesh's "data" axis via ``shard_map``, the field replicated. The escape
    fallback runs per shard (escapes are per-ray — no collectives needed).
    Differentiable w.r.t. the field: the field enters as an UNMAPPED
    shard_map operand, so its cotangent is psum'ed over the data axis by the
    shard_map transpose — the dp gradient all-reduce, explicit-collectives
    style (asserted vs single-device in tests/test_fused_window.py).
    ``image_hw`` remaps to 8x32-pixel strips globally, then shards whole
    strips."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS
    from ..render.diff import DiffScene

    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    N = dirs.shape[0]
    n = mesh.shape[DATA_AXIS]

    inv = None
    if image_hw is not None:
        H, W = image_hw
        if H % 8 == 0 and W % 32 == 0 and H * W == N:
            pb, inv_ = _strip_perm(H, W)
            inv = jnp.asarray(inv_)
            perm = jnp.asarray(pb)
            dirs = jnp.take(dirs, perm, axis=0)
            if origin.ndim == 2:
                origin = jnp.take(origin, perm, axis=0)
            if start_t is not None:
                start_t = jnp.take(jnp.asarray(start_t, f32), perm)
    assert N % n == 0, f"{N} rays not divisible by {n} data shards"
    if start_t is None:
        start_t = jnp.zeros(N, f32)
    start_t = jnp.asarray(start_t, f32)
    shared_origin = origin.ndim == 1
    origin_arg = origin if not shared_origin else jnp.zeros((N, 1), f32)

    def local(density, albedo, dirs_blk, seed_blk, origin_blk):
        o = origin_blk if not shared_origin else origin
        return render_window_fused(
            DiffScene(density, albedo), o, dirs_blk, num_steps=num_steps,
            sun_dir=sun_dir, sky=sky, start_t=seed_blk, interpret=interpret,
            escape_div=escape_div, overflow=overflow,
        )

    f = functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )(local)
    rgb = f(scene.density, scene.albedo, dirs, start_t, origin_arg)
    if inv is not None:
        rgb = jnp.take(rgb, inv, axis=0)
    return rgb
