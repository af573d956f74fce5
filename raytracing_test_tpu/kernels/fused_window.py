"""Fused window forward+backward kernel — the headline differentiable path.

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
    the f32 accumulation reconstructs to ~1 ulp);
  - r05 cost structure: the one-hot fetch matmuls are proportional to the
    BOX BYTES per sample (2 x 256 KB x hi/lo per 24 samples/ray ~= 127 ms/M
    rays at MXU peak — the r04 kernel's measured wall). Two levers cut that:
    (a) TRANSMITTANCE EARLY-OUT — compositing runs interleaved with the
    fetch, and each 4-step chunk's fetch+select (and the backward's
    accumulate) runs under a lax.cond that skips once every live sample's
    transmittance is < 1e-6 (guided windows saturate ~6-10 steps in; an
    in-kernel skipped cond costs ~0 — PROBE_r03 p3). Dropped contributions
    and gradients are bounded by 1e-6 relative — far inside the dedup
    anchor's own 1e-4 noise contract. (b) Z-HALF PREDICATION — per-half
    one-hots built from half-masked indices under per-half conds, so a
    chunk whose samples sit in one 32-z half (most of them) pays half the
    matmuls, and the z-half select reduces to lines = linesA + linesB;
  - the BACKWARD re-marches the same window (re-march strategy, SURVEY §7
    layer 5 / low_res.frag:309-315 flipped) from the forward's streamed
    residual rows and accumulates per-sample gradients into a VMEM gradient
    box with the transposed one-hot matmul, then merges the box into the
    HBM gradient field with an in-kernel DMA read-modify-write. TPU grid
    steps execute sequentially on the core, so the read-modify-write needs
    no atomics and NEVER touches XLA's element-serialized scatter;
  - rays whose window leaves their group's box (depth discontinuities)
    "escape": the kernel zeroes their contributions and flags them, and the
    XLA window path re-renders exactly those rays (compacted at 8-lane
    granularity — a full-width nonzero over 1M rays cost a measured 38 ms)
    — the fused path is therefore bit-honest for every ray.

Gradient scope (r05): the custom VJP differentiates w.r.t. the FIELD
(density + albedo) AND the ray geometry: the backward returns real
cotangents for the tmax/abs_delta planes (dL/d dt_s = g_od_s * sigma_s,
chain-ruled through the crossing recurrence t = tmax_a + k*abs_a), so
camera-pose fits run on this engine too.

Shading (r05): ``shading=True`` multiplies each sample's albedo by the
reference's face intensity (calcLightIntensity, low_res.frag:242-252)
computed in-kernel from the segment's entry axis — the per-axis intensity
is a per-ray constant of (sun, step sign), selected per step by the entry
masks the enumeration already carries. Soft sun shadows (``shadow_steps``)
stay XLA-side, driven by the kernel's streamed w-sum/t-expectation planes
(the expected-hit-point formulation of render/diff.py, stop-gradient'd
exactly like the XLA twin).

Reference anchors: the window being fetched is the linearization of the
per-step lookup in low_res.frag:493-532; the march loop re-marched by the
backward is low_res.frag:309-315; shading is calcLightIntensity
(low_res.frag:242-252) + the back-face rule (:368).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.log import debug

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
# early-out threshold: a chunk whose live samples all carry transmittance
# below this skips its fetch/select/accumulate entirely (dropped weights and
# gradients are < _TRANS_EPS relative — inside every parity budget)
_TRANS_EPS = 1e-6

_WARNED = set()


def _warn_once(key: str, msg: str) -> None:
    if key not in _WARNED:
        _WARNED.add(key)
        debug(1, msg)


def _entry0_masks(tx, ty, tz, ax, ay, az):
    """Entry-axis masks of the first record (argmin of tmax - abs, as in
    the XLA twin — renderer._argmin_axis tie-break)."""
    i32 = jnp.int32
    px_, py_, pz_ = tx - ax, ty - ay, tz - az
    e0x = ((px_ < py_) & (px_ < pz_)).astype(i32)
    e0y = jnp.where(e0x > 0, 0, (py_ < pz_).astype(i32))
    return e0x, e0y


def _enum_chunk(dda, n, shape3, isx, isy, isz, ax, ay, az):
    """Advance the DDA carry by ``n`` crossings, recording per step
    (wrapped cell, dt, inside, EXIT-axis masks) BEFORE advancing, with the
    reference tie-break (x iff strictly smallest, else y<z, else z).
    Chunk-local so only the 9-plane carry stays live across chunks — the
    r05-measured per-step floor (~2.7 ms/M/step) was cross-phase liveness,
    not arithmetic. Masks travel as i32 (sub-8-sublane i1 slices fail to
    legalize in Mosaic — CLAUDE.md)."""
    Sx, Sy, Sz = shape3
    i32 = jnp.int32
    cx, cy, cz, tx, ty, tz, t_cur = dda
    recs = []
    for _ in range(n):
        mx = (tx < ty) & (tx < tz)
        my = (~mx) & (ty < tz)
        mz = ~(mx | my)
        t_n = jnp.where(mx, tx, jnp.where(my, ty, tz))
        dt = jnp.maximum(t_n - t_cur, 0.0)
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        inside = ((wx < Sx) & (wy < Sy) & (wz < Sz)).astype(i32)
        recs.append((wx, wy, wz, dt, inside,
                     mx.astype(i32), my.astype(i32)))
        cx = jnp.where(mx, cx + isx, cx)
        cy = jnp.where(my, cy + isy, cy)
        cz = jnp.where(mz, cz + isz, cz)
        tx = jnp.where(mx, tx + ax, tx)
        ty = jnp.where(my, ty + ay, ty)
        tz = jnp.where(mz, tz + az, tz)
        t_cur = t_n
    return recs, (cx, cy, cz, tx, ty, tz, t_cur)


def _axis_intensity(sun_a, istep_plane):
    """Per-ray face intensity for one entry axis (calcLightIntensity +
    back-face rule, low_res.frag:242-252,368): the entry face normal is
    -step on that axis; lam = sun . normal."""
    lam = sun_a * (-istep_plane.astype(jnp.float32))
    return jnp.where(lam > 0, jnp.minimum(lam + 0.55, 1.0),
                     jnp.float32(0.3))


def _local_coords_fw(recs, oxp, oyp, ozp, escaped):
    """Per-step local box coords + masks at FULL (8,128) width (all four
    groups at once — the per-group box origins arrive broadcast as row
    planes). All masks i32. Returns per-step (lxy, lz, contrib) and the
    updated escaped plane."""
    out = []
    for wx, wy, wz, dt, inside, _emx, _emy in recs:
        lx = wx - oxp
        ly = wy - oyp
        lz = wz - ozp
        inbox = (
            (lx >= 0) & (lx < _B) & (ly >= 0) & (ly < _B)
            & (lz >= 0) & (lz < _BZ)
        ).astype(jnp.int32)
        escaped = escaped | (inside * (1 - inbox))
        contrib = inside * inbox
        lxy = jnp.where(contrib > 0, lx * _B + ly, -1)
        lzc = jnp.where(contrib > 0, lz, -1)
        out.append((lxy, lzc, contrib))
    return out, escaped


def _unpack_org(org, g):
    """Per-group origin unpack (scalars). Origins arrive bit-packed, ONE
    i32 per group: SMEM is ~16-32 KB and an unpacked (G*NG, 4) table broke
    the compile beyond G=256 (PROBE_r04)."""
    gi = pl.program_id(0) * _NG + g
    v = org[gi]
    ox = (v & 127) << 3
    oy = ((v >> 7) & 127) << 3
    ozb = (v >> 14) & 31
    has_any = ((v >> 19) & 1) > 0
    return ox, oy, ozb, has_any


def _origin_planes(org):
    """Broadcast the four groups' box origins (and has-box flags) to
    (8,128) row planes so the local-coordinate pass runs once at full width
    instead of per group."""
    oxs, oys, ozs, hs, has = [], [], [], [], []
    for g in range(_NG):
        ox, oy, ozb, has_any = _unpack_org(org, g)
        oxs.append(jnp.full((_SUBG, _LANES), ox, jnp.int32))
        oys.append(jnp.full((_SUBG, _LANES), oy, jnp.int32))
        ozs.append(jnp.full((_SUBG, _LANES), ozb * _ZB, jnp.int32))
        hs.append(jnp.full((_SUBG, _LANES), has_any.astype(jnp.int32)))
        has.append(has_any)
    return (jnp.concatenate(oxs), jnp.concatenate(oys),
            jnp.concatenate(ozs), jnp.concatenate(hs), has)


def _mm(oh, b):
    return jax.lax.dot_general(
        oh, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mmT(oh, v):
    return jax.lax.dot_general(
        oh, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _load_boxes(field4, org, btmp, btmp2, bhiA, bloA, bhiB, bloB, sem):
    """DMA the four group boxes HBM->VMEM and store persistent bf16 hi/lo
    splits (one f32 landing buffer reused). Dead groups keep garbage in
    their split slots — safe because every consumer masks by contrib."""
    f32 = jnp.float32
    has = []
    for g in range(_NG):
        ox, oy, ozb, has_any = _unpack_org(org, g)
        has.append(has_any)

        @pl.when(has_any)
        def _(g=g, ox=ox, oy=oy, ozb=ozb):
            # both z-half transfers in flight together (pairwise overlap;
            # btmp2 costs 0.5 MB vs serializing two DMA latencies)
            d1 = pltpu.make_async_copy(
                field4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb], btmp, sem)
            d2 = pltpu.make_async_copy(
                field4.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb + 1], btmp2,
                sem)
            d1.start()
            d2.start()
            d1.wait()
            b = btmp[:].reshape(_B * _B, _C4)
            hi = b.astype(jnp.bfloat16)
            bhiA[g] = hi
            bloA[g] = (b - hi.astype(f32)).astype(jnp.bfloat16)
            d2.wait()
            b = btmp2[:].reshape(_B * _B, _C4)
            hi = b.astype(jnp.bfloat16)
            bhiB[g] = hi
            bloB[g] = (b - hi.astype(f32)).astype(jnp.bfloat16)
    return has


def _chunk_block(planes, g):
    """(8,128) block for group g over the chunk's 4 steps, sliced out of
    chunk-local full-width per-step planes (rows [2g, 2g+2) of each)."""
    rows = slice(g * _SUBG, (g + 1) * _SUBG)
    return jnp.concatenate([p[rows] for p in planes])


def _fetch_group_chunk(loc, g, gate_g, bhiA, bloA, bhiB, bloB):
    """One group-chunk one-hot fetch from the resident box splits ->
    4 value planes in the chunk's (4-step x 2-row) layout, masked.

    Three-way gating (measured r05: a skipped in-kernel cond costs ~0.1 us,
    while each half's hi+lo matmul pair costs ~2.7 us at peak): the fetch
    skips per (group, z-half) — half-masked one-hots make the halves'
    contributions disjoint, so lines = linesA + linesB with no z-half
    select pass — and the channel select skips when the whole group chunk
    is dead."""
    f32 = jnp.float32
    i32 = jnp.int32
    lxy = _chunk_block([l[0] for l in loc], g)
    lz = _chunk_block([l[1] for l in loc], g)
    vd = _chunk_block([l[2] for l in loc], g)
    selA = (lz >= 0) & (lz < _ZB)
    selB = lz >= _ZB
    gA = gate_g & jnp.any(selA)
    gB = gate_g & jnp.any(selB)

    def mk_half(lxy_h, hi, lo):
        def f(_):
            arr = jax.lax.broadcasted_iota(
                i32, (_ROWS, _LANES, _B * _B), 2)
            oh = (lxy_h[:, :, None] == arr).astype(jnp.bfloat16).reshape(
                _ROWS * _LANES, _B * _B)
            return _mm(oh, hi) + _mm(oh, lo)
        return f

    def fzero(_):
        return jnp.zeros((_ROWS * _LANES, _C4), f32)

    linesA = jax.lax.cond(
        gA, mk_half(jnp.where(selA, lxy, -1), bhiA[g], bloA[g]), fzero, 0)
    linesB = jax.lax.cond(
        gB, mk_half(jnp.where(selB, lxy, -1), bhiB[g], bloB[g]), fzero, 0)

    def sel(_):
        lines = (linesA + linesB).reshape(_ROWS, _LANES, _C4)
        arc = jax.lax.broadcasted_iota(i32, (_ROWS, _LANES, _C4), 2)
        zcol = jnp.where(lz >= 0, lz & (_ZB - 1), -1)
        zsel = (arc >> 2) == zcol[:, :, None]
        out = []
        for c in range(4):
            m = zsel & ((arc & 3) == c)
            v = jnp.where(m, lines, 0.0).sum(axis=2)
            # the vd mask also scrubs garbage from dead groups' box slots
            out.append(jnp.where(vd > 0, v, 0.0))
        return tuple(out)

    def selz(_):
        z = jnp.zeros((_ROWS, _LANES), f32)
        return z, z, z, z

    return list(jax.lax.cond(gA | gB, sel, selz, 0))


def _fwd_kernel(org, sunv, cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                field4,
                osr, osg, osb, otend, oesc, owsum, otexp,
                rsig, ralr, ralg, ralb,
                btmp, btmp2, bhiA, bloA, bhiB, bloB, sem,
                *, shape3, S, shading):
    f32 = jnp.float32
    i32 = jnp.int32
    cxv, cyv, czv = cx[:], cy[:], cz[:]
    isxv, isyv, iszv = isx[:], isy[:], isz[:]
    axv, ayv, azv = ax[:], ay[:], az[:]
    if shading:
        Ix = _axis_intensity(sunv[0], isxv)
        Iy = _axis_intensity(sunv[1], isyv)
        Iz = _axis_intensity(sunv[2], iszv)

    oxp, oyp, ozp, hasp, _ = _origin_planes(org)
    _load_boxes(field4, org, btmp, btmp2, bhiA, bloA, bhiB, bloB, sem)

    # gate mask: rays that can still contribute — in a boxed group and not
    # parked at the dead-seed cell (parked sky rays keep trans = 1 forever)
    parked = ((cxv == 1023) & (cyv == 1023) & (czv == 1023)).astype(i32)
    gmask = (hasp > 0) & (parked == 0)

    trans = jnp.ones((_ROWS, _LANES), f32)
    acc = [jnp.zeros((_ROWS, _LANES), f32) for _ in range(3)]
    wsum = jnp.zeros((_ROWS, _LANES), f32)
    texp = jnp.zeros((_ROWS, _LANES), f32)
    tc = jnp.zeros((_ROWS, _LANES), f32)
    ent_mx, ent_my = _entry0_masks(tx[:], ty[:], tz[:], axv, ayv, azv)
    escaped = jnp.zeros((_ROWS, _LANES), i32)
    dda = (cxv, cyv, czv, tx[:], ty[:], tz[:], jnp.zeros((_ROWS, _LANES), f32))

    for c0 in range(0, S, _CHUNK_S):
        # chunk-local enumeration: only the 7-plane DDA carry (plus the
        # compositing state) lives across chunks — full-window liveness was
        # the r05-measured per-step floor (~2.7 ms/M/step of spill traffic)
        recs, dda = _enum_chunk(
            dda, _CHUNK_S, shape3, isxv, isyv, iszv, axv, ayv, azv)
        loc, escaped = _local_coords_fw(recs, oxp, oyp, ozp, escaped)
        # early-out per (group, chunk): saturated groups (trans < eps) and
        # sky groups skip their fetch; skipped samples stream zero
        # residuals (the backward replays the same gates)
        vals = []
        for g in range(_NG):
            rows = slice(g * _SUBG, (g + 1) * _SUBG)
            gate_g = jnp.any((trans[rows] > _TRANS_EPS) & gmask[rows])
            vals.append(_fetch_group_chunk(
                loc, g, gate_g, bhiA, bloA, bhiB, bloB))
        # rearrange group-chunk blocks -> step-major full-width planes
        chunk = []
        for c in range(4):
            for k in range(_CHUNK_S):
                chunk.append(jnp.concatenate(
                    [vals[g][c][k * _SUBG:(k + 1) * _SUBG]
                     for g in range(_NG)]))

        for k in range(_CHUNK_S):
            s = c0 + k
            sig_s = chunk[k]
            al = [chunk[(c + 1) * _CHUNK_S + k] for c in range(3)]
            rr = s * _ROWS
            rsig[rr : rr + _ROWS] = sig_s
            ralr[rr : rr + _ROWS] = al[0]
            ralg[rr : rr + _ROWS] = al[1]
            ralb[rr : rr + _ROWS] = al[2]
            dt = recs[k][3]
            e = jnp.exp(-sig_s * dt)
            w = trans * (1.0 - e)
            if shading:
                inten = jnp.where(
                    ent_mx > 0, Ix, jnp.where(ent_my > 0, Iy, Iz))
                wi = w * inten
            else:
                wi = w
            acc[0] = acc[0] + wi * al[0]
            acc[1] = acc[1] + wi * al[1]
            acc[2] = acc[2] + wi * al[2]
            wsum = wsum + w
            texp = texp + w * (tc + 0.5 * dt)
            tc = tc + dt
            trans = trans * e
            ent_mx, ent_my = recs[k][5], recs[k][6]

    osr[:] = acc[0]
    osg[:] = acc[1]
    osb[:] = acc[2]
    otend[:] = trans
    oesc[:] = escaped
    owsum[:] = wsum
    otexp[:] = texp


def _bwd_kernel(org, sunv, cx, cy, cz, tx, ty, tz, isx, isy, isz, ax, ay, az,
                gr, gg, gb, gt, fsr, fsg, fsb, ftend, fesc,
                rsig, ralr, ralg, ralb,
                grad_in,
                grad_out, ptx_o, pty_o, ptz_o, pax_o, pay_o, paz_o,
                btmp, btmp2, gboxA, gboxB, sem,
                *, shape3, S, shading):
    del grad_in  # aliased with grad_out; all access goes through grad_out
    f32 = jnp.float32
    i32 = jnp.int32
    cxv, cyv, czv = cx[:], cy[:], cz[:]
    isxv, isyv, iszv = isx[:], isy[:], isz[:]
    axv, ayv, azv = ax[:], ay[:], az[:]
    if shading:
        Ix = _axis_intensity(sunv[0], isxv)
        Iy = _axis_intensity(sunv[1], isyv)
        Iz = _axis_intensity(sunv[2], iszv)

    oxp, oyp, ozp, hasp, _ = _origin_planes(org)
    parked = ((cxv == 1023) & (cyv == 1023) & (czv == 1023)).astype(i32)
    gmask = (hasp > 0) & (parked == 0)

    g_r, g_g, g_b, g_T = gr[:], gg[:], gb[:], gt[:]
    # the reverse sweep's suffix_s = sum_{j>s} w_j A_j is computed FORWARD
    # as Total - prefix, where Total = surf . cotangent comes free from the
    # saved forward outputs — so the whole backward is ONE chunk-local pass
    # with O(1) live state (no stored per-step Ts/ws/As)
    total = fsr[:] * g_r + fsg[:] * g_g + fsb[:] * g_b
    t_end = ftend[:]
    tg = t_end * g_T

    # escaped rays' grads flow via the XLA fallback; the mask is a saved
    # forward output (no re-enumeration needed)
    livef = (1 - fesc[:]).astype(f32)

    trans = jnp.ones((_ROWS, _LANES), f32)
    prefix = jnp.zeros((_ROWS, _LANES), f32)
    ent_mx, ent_my = _entry0_masks(tx[:], ty[:], tz[:], axv, ayv, azv)
    # pose accumulation state (one-step-delayed subtraction: the crossing
    # after step s carries cotangent h_s - h_{s+1} on step s's exit axis)
    cxc = jnp.zeros((_ROWS, _LANES), i32)
    cyc = jnp.zeros((_ROWS, _LANES), i32)
    czc = jnp.zeros((_ROWS, _LANES), i32)
    pfmx = pfmy = pfmz = jnp.zeros((_ROWS, _LANES), f32)
    pqx = pqy = pqz = jnp.zeros((_ROWS, _LANES), f32)
    ptx = pty = ptz = jnp.zeros((_ROWS, _LANES), f32)
    pax = pay = paz = jnp.zeros((_ROWS, _LANES), f32)

    gboxA[...] = jnp.zeros((_NG, _B * _B, _C4), f32)
    gboxB[...] = jnp.zeros((_NG, _B * _B, _C4), f32)
    dda = (cxv, cyv, czv, tx[:], ty[:], tz[:],
           jnp.zeros((_ROWS, _LANES), f32))
    for c0 in range(0, S, _CHUNK_S):
        recs, dda = _enum_chunk(
            dda, _CHUNK_S, shape3, isxv, isyv, iszv, axv, ayv, azv)
        loc, _ = _local_coords_fw(recs, oxp, oyp, ozp,
                                  jnp.zeros((_ROWS, _LANES), i32))
        # per-group gates from the chunk-START transmittance (must replay
        # the forward's gating exactly; trans mutates in the loop below)
        gates = []
        for g in range(_NG):
            rows = slice(g * _SUBG, (g + 1) * _SUBG)
            gates.append(
                jnp.any((trans[rows] > _TRANS_EPS) & gmask[rows]))
        gvecs = []
        for k in range(_CHUNK_S):
            s = c0 + k
            rr = s * _ROWS
            sig_s = rsig[rr : rr + _ROWS]
            al = [ralr[rr : rr + _ROWS], ralg[rr : rr + _ROWS],
                  ralb[rr : rr + _ROWS]]
            dt = recs[k][3]
            e = jnp.exp(-sig_s * dt)
            w = trans * (1.0 - e)
            if shading:
                inten = jnp.where(
                    ent_mx > 0, Ix, jnp.where(ent_my > 0, Iy, Iz))
            else:
                inten = jnp.float32(1.0)
            A = (al[0] * g_r + al[1] * g_g + al[2] * g_b) * inten
            wA = w * A
            prefix = prefix + wA
            # g_od = T e A - suffix - t_end gT; suffix = total - prefix_incl
            g_od = trans * e * A - (total - prefix) - tg
            m = loc[k][2].astype(f32) * livef
            gvecs.append((
                g_od * dt * m,
                w * g_r * inten * m,
                w * g_g * inten * m,
                w * g_b * inten * m,
            ))
            # dL/d dt_s = g_od_s * sigma_s; chain to the crossing values:
            # B_{k+1} = tmax_a + c_a * abs_a on step k's exit axis
            h = g_od * sig_s * livef
            emx, emy = recs[k][5], recs[k][6]
            fmx = emx.astype(f32)
            fmy = emy.astype(f32)
            fmz = (1 - emx - emy).astype(f32)
            ptx = ptx + h * (fmx - pfmx)
            pty = pty + h * (fmy - pfmy)
            ptz = ptz + h * (fmz - pfmz)
            qx = fmx * cxc.astype(f32)
            qy = fmy * cyc.astype(f32)
            qz = fmz * czc.astype(f32)
            pax = pax + h * (qx - pqx)
            pay = pay + h * (qy - pqy)
            paz = paz + h * (qz - pqz)
            pfmx, pfmy, pfmz = fmx, fmy, fmz
            pqx, pqy, pqz = qx, qy, qz
            cxc = cxc + emx
            cyc = cyc + emy
            czc = czc + (1 - emx - emy)
            trans = trans * e
            ent_mx, ent_my = recs[k][5], recs[k][6]

        # per-group gated accumulation (shared V build, both halves split by
        # one where pass; measured r05: finer per-half gating cost MORE —
        # 320 vs 298 ms — the duplicated V/one-hot builds beat the savings)
        for g in range(_NG):
            lxy = _chunk_block([l[0] for l in loc], g)
            lz = _chunk_block([l[1] for l in loc], g)
            rows = slice(g * _SUBG, (g + 1) * _SUBG)
            gv = [jnp.concatenate(
                [gvecs[k][c][rows] for k in range(_CHUNK_S)])
                for c in range(4)]

            @pl.when(gates[g])
            def _(g=g, lxy=lxy, lz=lz, gv=gv):
                arc = jax.lax.broadcasted_iota(
                    i32, (_ROWS, _LANES, _C4), 2)
                zcol = jnp.where(lz >= 0, lz & (_ZB - 1), -1)
                zsel = (arc >> 2) == zcol[:, :, None]
                V = jnp.zeros((_ROWS, _LANES, _C4), f32)
                for c in range(4):
                    mm_ = zsel & ((arc & 3) == c)
                    V = jnp.where(mm_, gv[c][:, :, None], V)
                lz3 = lz[:, :, None] + 0 * arc
                VA = jnp.where(lz3 >= _ZB, 0.0, V).reshape(
                    _ROWS * _LANES, _C4)
                VB = jnp.where(lz3 >= _ZB, V, 0.0).reshape(
                    _ROWS * _LANES, _C4)
                arr = jax.lax.broadcasted_iota(
                    i32, (_ROWS, _LANES, _B * _B), 2)
                oh = (lxy[:, :, None] == arr).astype(jnp.bfloat16).reshape(
                    _ROWS * _LANES, _B * _B)

                def hilo(v):
                    v_hi = v.astype(jnp.bfloat16)
                    v_lo = (v - v_hi.astype(f32)).astype(jnp.bfloat16)
                    return _mmT(oh, v_hi) + _mmT(oh, v_lo)

                gboxA[g] = gboxA[g] + hilo(VA)
                gboxB[g] = gboxB[g] + hilo(VB)

    ptx_o[:] = ptx
    pty_o[:] = pty
    ptz_o[:] = ptz
    pax_o[:] = pax
    pay_o[:] = pay
    paz_o[:] = paz

    # merge: in-kernel DMA read-modify-write (grid steps are sequential
    # on the TPU core, so this needs no atomics and no XLA scatter)
    for g in range(_NG):
        ox, oy, ozb, has_any = _unpack_org(org, g)

        @pl.when(has_any)
        def _(g=g, ox=ox, oy=oy, ozb=ozb):
            # both z-half RMWs in flight together (their cells are disjoint
            # z-blocks); GROUPS stay sequential — adjacent groups' boxes
            # overlap, so cross-group read-after-write order is load-bearing
            d1 = pltpu.make_async_copy(
                grad_out.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb], btmp, sem)
            d3 = pltpu.make_async_copy(
                grad_out.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb + 1], btmp2,
                sem)
            d1.start()
            d3.start()
            d1.wait()
            d3.wait()
            btmp[:] = btmp[:] + gboxA[g].reshape(_B, _B, _C4)
            btmp2[:] = btmp2[:] + gboxB[g].reshape(_B, _B, _C4)
            d2 = pltpu.make_async_copy(
                btmp, grad_out.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb], sem)
            d4 = pltpu.make_async_copy(
                btmp2, grad_out.at[pl.ds(ox, _B), pl.ds(oy, _B), ozb + 1],
                sem)
            d2.start()
            d4.start()
            d2.wait()
            d4.wait()


# --------------------------------------------------------------------------
# host-side op with custom VJP


@functools.lru_cache(maxsize=8)
def _make_window_op(shape3, S, interpret, shading):
    """(field4, org, sunv, 12 ray planes) -> (surf_r, surf_g, surf_b, t_end,
    escaped, w_sum, t_exp). Planes are (G*_ROWS, 128) arrays; org is i32
    (G*_NG,) bit-packed box origins; sunv is the normalized sun f32[3]. The
    custom VJP differentiates w.r.t. field4 AND the tmax/abs_delta planes
    (camera-pose path); cell/istep planes are integral (zero cotangent)."""
    Sx, Sy, Sz = shape3
    Zb = Sz // _ZB
    ray_specs = [
        pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)) for _ in range(12)
    ]
    plane_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def fwd_call(field4, org, sunv, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(
            _fwd_kernel, shape3=shape3, S=S, shading=shading)
        res_shape = (G * S * _ROWS, _LANES)
        res_spec = pl.BlockSpec((S * _ROWS, _LANES), lambda i: (i, 0))
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[smem_spec, smem_spec] + ray_specs + [any_spec],
            out_specs=[plane_spec] * 7 + [res_spec] * 4,
            out_shape=[
                jax.ShapeDtypeStruct(planes[0].shape, dt)
                for dt in (jnp.float32,) * 4 + (jnp.int32,)
                + (jnp.float32,) * 2
            ] + [jax.ShapeDtypeStruct(res_shape, jnp.float32)] * 4,
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.bfloat16),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.bfloat16),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.bfloat16),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(org, sunv, *planes, field4)

    def bwd_call(org, sunv, gr, gg, gb, gt, fouts5, res4, *planes):
        G = planes[0].shape[0] // _ROWS
        kern = functools.partial(
            _bwd_kernel, shape3=shape3, S=S, shading=shading)
        zeros = jnp.zeros((Sx, Sy, Zb, _C4), jnp.float32)
        res_spec = pl.BlockSpec((S * _ROWS, _LANES), lambda i: (i, 0))
        outs = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[smem_spec, smem_spec] + ray_specs
            + [plane_spec] * 9
            + [res_spec] * 4
            + [any_spec],
            out_specs=[any_spec] + [plane_spec] * 6,
            out_shape=[jax.ShapeDtypeStruct((Sx, Sy, Zb, _C4), jnp.float32)]
            + [jax.ShapeDtypeStruct(planes[0].shape, jnp.float32)] * 6,
            scratch_shapes=[
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_B, _B, _C4), jnp.float32),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.float32),
                pltpu.VMEM((_NG, _B * _B, _C4), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={27: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(org, sunv, *planes, gr, gg, gb, gt, *fouts5, *res4, zeros)
        return outs

    @jax.custom_vjp
    def op(field4, org, sunv, *planes):
        return tuple(fwd_call(field4, org, sunv, *planes))[:7]

    def op_fwd(field4, org, sunv, *planes):
        outs = tuple(fwd_call(field4, org, sunv, *planes))
        return outs[:7], (org, sunv, planes, outs[:5], outs[7:])

    def op_bwd(resids, g):
        org, sunv, planes, fouts5, res4 = resids
        gr, gg, gb, gt = g[0], g[1], g[2], g[3]
        # g[4] (escaped) is integral; g[5]/g[6] (w_sum, t_exp) feed only the
        # stop-gradient'd shadow hit point — ignored, matching the XLA twin.
        grad, ptx, pty, ptz, pax, pay, paz = bwd_call(
            org, sunv, gr, gg, gb, gt, fouts5, res4, *planes)
        zp = lambda k: jnp.zeros_like(planes[k])
        return (grad, jnp.zeros_like(org), jnp.zeros_like(sunv),
                zp(0), zp(1), zp(2),
                ptx, pty, ptz,
                zp(6), zp(7), zp(8),
                pax, pay, paz)

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
    shading: bool = False,
    shadow_steps: int = 0,
):
    """Drop-in for render/diff.render_rays_diff_window (accum='fused'):
    volumetric window render whose forward fetch and backward accumulation
    run in the Pallas kernel pair above. Differentiable w.r.t. the field
    AND the ray geometry (origin/dirs — the camera-pose path).

    ``shading`` applies the reference face intensity in-kernel;
    ``shadow_steps > 0`` adds the XLA-side soft sun-shadow factor driven by
    the kernel's streamed expected-hit-point planes (matches the XLA twin).

    ``escape_div``: escaped-ray budget N/escape_div for the compact XLA
    fallback (compacted at 8-lane granularity); more escapes than that
    either re-render the whole frame on the XLA path (overflow='full') or
    keep their kernel values with zero field grads (overflow='compact' —
    the drop is visible in aux['n_escaped'] vs aux['escape_capacity'] and
    aux['grads_dropped']). ``escape_cap`` overrides the budget (tests)."""
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
    S = int(num_steps)
    use_kernel = window_supported((Sx, Sy, Sz))
    if not use_kernel:
        _warn_once(
            f"shape{(Sx, Sy, Sz)}",
            f"fused window: world shape {(Sx, Sy, Sz)} unsupported "
            f"(needs Sx,Sy >= {_B}, Sz >= {_BZ} and Sz % {_ZB} == 0); "
            "falling back to the XLA dedup window",
        )
    elif S % _CHUNK_S != 0:
        _warn_once(
            f"steps{S}",
            f"fused window: num_steps {S} not a multiple of {_CHUNK_S}; "
            "falling back to the XLA dedup window",
        )
        use_kernel = False
    if not use_kernel:
        rgb = render_rays_diff_window(
            scene, origin, dirs, num_steps=num_steps, sun_dir=sun_dir,
            sky=sky, start_t=start_t, accum="dedup", enumerate_mode="vec",
            shading=shading, shadow_steps=shadow_steps,
        )
        if return_aux:
            zi = jnp.zeros((), jnp.int32)
            # w_sum=1: the XLA window is the exact accumulator of record;
            # prox patch-up (render_rays_guided_prox) has nothing to fix here
            return rgb, {"escaped": jnp.zeros(N, bool), "n_escaped": zi,
                         "t_end": jnp.zeros(N, f32),
                         "w_sum": jnp.ones(N, f32),
                         "escape_capacity": jnp.zeros((), jnp.int32),
                         "grads_dropped": jnp.zeros((), bool)}
        return rgb

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
        else:
            _warn_once(
                f"hw{(H, W)}",
                f"fused window: image_hw {(H, W)} fails the strip "
                "divisibility test (H % 8, W % 32); rays stay row-major — "
                "expect heavy escapes (performance cliff, exactness kept)",
            )

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

    sun = jnp.asarray(sun_dir, f32)
    sun = sun / jnp.linalg.norm(sun)

    tile = _ROWS * _LANES
    n_pad = (-N) % tile
    org = _box_origins(cell, istep, abs_delta, S, (Sx, Sy, Sz), n_pad)
    p = lambda a, fill=0: _pad_plane(a, n_pad, fill)
    # padded rays park at wrapped cell 1023 (outside every window), exactly
    # like dead-seed rays — a _BIG fill would wrap (&1023) to cell 0 and
    # alias real field cells in the in-kernel masks
    planes = (
        p(cell[:, 0], 1023), p(cell[:, 1], 1023), p(cell[:, 2], 1023),
        p(tmax[:, 0], 1.0), p(tmax[:, 1], 1.0), p(tmax[:, 2], 1.0),
        p(istep[:, 0], 1), p(istep[:, 1], 1), p(istep[:, 2], 1),
        p(abs_delta[:, 0], 1.0), p(abs_delta[:, 1], 1.0),
        p(abs_delta[:, 2], 1.0),
    )
    packed = _pack_fields(scene)
    field4 = packed.reshape(Sx, Sy, Sz // _ZB, _C4)

    op = _make_window_op((Sx, Sy, Sz), S, bool(interpret), bool(shading))
    G = planes[0].shape[0] // _ROWS
    MAXG = 1024  # SMEM origin budget (16 KB packed) per pallas_call
    if G <= MAXG:
        sr, sg, sb, tend, esc, wsum, texp = op(field4, org, sun, *planes)
    else:
        parts = []
        for g0 in range(0, G, MAXG):
            g1 = min(G, g0 + MAXG)
            o = org[g0 * _NG : g1 * _NG]
            ps = [pp[g0 * _ROWS : g1 * _ROWS] for pp in planes]
            parts.append(op(field4, o, sun, *ps))
        sr, sg, sb, tend, esc, wsum, texp = (
            jnp.concatenate([pt[k] for pt in parts]) for k in range(7)
        )
    surf = jnp.stack([v.reshape(-1)[:N] for v in (sr, sg, sb)], axis=1)
    t_end = tend.reshape(-1)[:N]
    escaped = esc.reshape(-1)[:N] != 0

    if shadow_steps:
        # expected hit point from the kernel's streamed planes (the XLA
        # twin's formulation, render/diff.py): stop-gradient'd like there
        w_sum = wsum.reshape(-1)[:N]
        t_hit = texp.reshape(-1)[:N] / jnp.maximum(w_sum, 1e-8)
        ph = origin_b + jax.lax.stop_gradient(t_hit)[:, None] * d
        t_sun = transmittance(
            scene, jax.lax.stop_gradient(ph) + sun[None, :] * 0.75,
            jnp.broadcast_to(sun[None, :], (N, 3)), num_steps=shadow_steps,
        )
        surf = surf * (0.3 + 0.7 * t_sun)[:, None]

    # ---- exact fallback for escaped rays via the XLA window path.
    # Compaction runs at 8-lane granularity: nonzero over N/8 octet flags
    # (a full-width 1M nonzero measured 38 ms — VERIFY_r04 ad-hoc log);
    # non-escaped octet neighbors are re-rendered but NOT written back
    # (their cotangents stay with the kernel — no double counting).
    esc8 = escaped.reshape(-1, 8).any(axis=1)
    n_esc = escaped.sum()
    n_esc8 = esc8.sum()
    K = escape_cap if escape_cap else max(min(N, _LANES), N // escape_div)
    K8 = max(K // 8, 16)
    if not fallback:
        dropped = n_esc > 0  # no fallback: every escape drops its grads
    elif overflow == "full":
        dropped = jnp.zeros((), bool)  # overflow re-renders: always exact
    else:
        dropped = n_esc8 > K8

    def with_fallback(_):
        (idx8,) = jnp.nonzero(esc8, size=K8, fill_value=0)
        valid8 = jnp.arange(K8) < n_esc8
        idx = (idx8[:, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)
        keep = jnp.repeat(valid8, 8) & jnp.take(escaped, idx)
        sub_o = jnp.take(origin, idx, axis=0)
        sub_d = jnp.take(dirs, idx, axis=0)
        sub_t0 = jnp.take(t0, idx)
        rgb_f = render_rays_diff_window(
            scene, sub_o, sub_d, num_steps=S, sun_dir=sun_dir, sky=False,
            start_t=sub_t0, accum="dedup", enumerate_mode="vec",
            shading=shading, shadow_steps=shadow_steps,
        )
        safe = jnp.where(keep, idx, N)
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
            shading=shading, shadow_steps=shadow_steps,
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
                lambda _: jax.lax.cond(
                    n_esc8 <= K8, with_fallback, full_xla, 0),
                lambda _: (surf, t_end),
                0,
            )
        else:
            # compact-only, STRAIGHT-LINE: escapes > 0 at essentially every
            # real camera, and lax.cond's residual plumbing under grad cost
            # ~100 ms at 1024^2 (VERIFY_r04) — run the compact fallback
            # unconditionally (zero escapes render K dummy rays, masked out
            # by `keep`). Escaped octets beyond K8 keep their kernel values
            # (and zero field grads) — aux['grads_dropped'] makes the drop
            # loud; bench.py and the fit loop surface it.
            surf, t_end = with_fallback(0)

    rgb = surf
    if sky:
        rgb = rgb + t_end[:, None] * skybox(d, sun)
    if inv is not None:
        rgb = jnp.take(rgb, inv, axis=0)
    if return_aux:
        # per-ray aux in NATURAL ray order (the kernel computes in strip
        # order; callers index these against their own rays/seeds)
        esc_n, tend_n, wsum_n = escaped, t_end, wsum.reshape(-1)[:N]
        if inv is not None:
            esc_n = jnp.take(esc_n, inv)
            tend_n = jnp.take(tend_n, inv)
            wsum_n = jnp.take(wsum_n, inv)
        return rgb, {
            "escaped": esc_n, "n_escaped": n_esc, "t_end": tend_n,
            "w_sum": wsum_n,
            "escape_capacity": jnp.asarray(K8 * 8, jnp.int32),
            "grads_dropped": dropped,
        }
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
    shading: bool = False,
    shadow_steps: int = 0,
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
            escape_div=escape_div, overflow=overflow, shading=shading,
            shadow_steps=shadow_steps,
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
