"""Fused single-invocation march kernel — the round-3 performance path.

One ``pallas_call`` executes the ENTIRE render march per ray tile: hierarchical
empty-space skips, per-voxel fine steps inside surface bricks, the
reflect/refract material state machine (incl. the animated water surface), and
the inline sun-shadow march — the same one-pass-per-pixel structure as the
reference kernel (low_res.frag:256-393: march :309-315, materials :317-333,
shadow :373-391) re-expressed for the TPU's vector units.

Why fused: the round-2 split kernels (brick_kernels.py) paid a measured
~28 ms/M-lanes *per Pallas invocation* (PROBE_r03) and re-entered the kernel
through XLA glue for every row fetch and material event; at 512² that overhead
alone exceeded the whole march's compute. Here per-lane state lives in vector
registers/VMEM for the kernel's lifetime, every voxel/brick lookup is an
in-VMEM MXU one-hot matmul over the core/fused_tables.py tables (~0.3-3 ms per
1M lanes per iteration, vs ~10 ms for an XLA gather at full width), and each
ray tile exits its while-loop the moment all its rays settle — spatially
coherent 64x64-pixel tiles make that early exit effective where the XLA paths
pay worst-lane lockstep until compaction thresholds.

Semantics: identical to render/fast.py (the oracle-validated fast path) —
same DDA arithmetic, tie-breaking, material_step math, exit rules, and budget
semantics; parity is enforced by tests/test_fused.py across the material
coverage matrix. Shading stays in XLA (render/renderer.shade consumes the
kernel's outputs), so the shading code path is literally shared with the
validated renderers.

Mosaic survival notes (CLAUDE.md): i1 loop carries are carried as i32; all
matmuls pass preferred_element_type; iotas are >=2D; tables ship as bf16
(byte values <= 255 are exact in bf16).
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
from ..core.fused_tables import FusedTables, build_fused_tables
from ..core.types import Properties

_LANES = 128
_TILE_ROWS = 32  # rays per tile = 32*128 = 4096 = one 64x64 pixel block
_RF = 2  # row chunk for the one-hot lookups (bounds VMEM intermediates:
# the (RF,128,·) one-hot/m1 buffers are the kernel's VMEM peak — RF=8 put the
# 512^2 kernel 2.85M over the 16M scoped-vmem limit on the v5e, and RF=4 sat
# so close to 16M that operand-layout shifts (e.g. adding start_t upstream)
# pushed it 212K over; RF=2 buys ~1.4M headroom, measured cost-neutral)
_ITER_CAP = 4096
_BIG = 1 << 20
_MAX_JUMP = 512

# scal_i layout
_SI_YMAX, _SI_BUDGET, _SI_SH_BUDGET = 0, 1, 2
_SI_W_HIT, _SI_W_EVT, _SI_W_REFL, _SI_W_LIQ, _SI_W_REFR, _SI_W_SHHIT = 3, 4, 5, 6, 7, 8
# scal_f layout: time, sun[3], sun_step[3], sun_delta[3], sun_abs[3]
_SF_TIME, _SF_SUN, _SF_SSTEP, _SF_SDELTA, _SF_SABS = 0, 1, 4, 7, 10


# --------------------------------------------------------------------------
# in-kernel lookup machinery


def _row_m1(tab_ref, row_idx):
    """One-hot row fetch: tab_ref (A,256) bf16, row_idx (RF,128) i32 in [0,A)
    -> m1 (RF,128,256) BF16 = tab[row_idx]. One full-K matmul: K = A up to
    ~1280 keeps the MXU pipeline full (nine K=128 bank matmuls measured 7.4 vs
    3.6 ms/iter/M — PROBE_r03). bf16 holds byte values exactly and halves the
    m1 bandwidth through the selects (the measured select cost at f32 doubled
    the whole lookup)."""
    A = tab_ref.shape[0]
    ar = jax.lax.broadcasted_iota(jnp.int32, (_RF, _LANES, A), 2)
    oh = (row_idx[:, :, None] == ar).astype(jnp.bfloat16)
    # Mosaic requires a 32-bit matmul accumulator; the cast back to bf16 is
    # one cheap pass and halves the m1 bandwidth through the selects
    return jax.lax.dot_general(
        oh.reshape(_RF * _LANES, A),
        tab_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16).reshape(_RF, _LANES, 256)


def _sel_byte(m1, col, ar256):
    """Select byte ``col`` (i32 in [0,256)) from each lane's bf16 row (exact:
    one-hot select of values <= 255)."""
    return (
        jnp.where(col[:, :, None] == ar256, m1, jnp.bfloat16(0.0))
        .sum(axis=2, dtype=jnp.float32)
        .astype(jnp.int32)
    )


def _word_bit(word, m):
    """Bit ``m`` (0..15) of the SMEM i32 LUT word, as a bool mask."""
    return ((jax.lax.shift_right_logical(word, m)) & 1) > 0


def _popcount(x):
    """SWAR popcount of non-negative i32 lanes."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    x = x + (x >> 8)
    x = x + (x >> 16)
    return x & 0x3F


def _zrun(byte, k, iez):
    """Run of zero bits in ``byte`` (u8 in i32 lanes) adjacent to bit ``k``
    in direction ``iez`` (+1: bits k+1.., -1: bits k-1..). The byte is a
    brick z-column of the 512-bit occupancy row, so this is the number of
    consecutive AIR voxels ahead of the ray along z within the brick —
    computed with pure i32 bit tricks on values already in registers
    (VERDICT r03/r04 task: multi-voxel stepping off the occupancy row)."""
    t_up = jax.lax.shift_right_logical(byte, k + 1)
    # ctz via popcount of the trailing-zero mask; t_up == 0 gives mask 0xFF
    # -> popcount 8, correctly capped by 7 - k
    run_up = jnp.minimum(_popcount(((t_up & (-t_up)) - 1) & 0xFF), 7 - k)
    t_dn = byte & ((1 << k) - 1)
    y = t_dn
    y = y | (y >> 1)
    y = y | (y >> 2)
    y = y | (y >> 4)
    run_dn = k - _popcount(y)  # k - bitlength(bits below k)
    return jnp.where(iez > 0, run_up, run_dn)


# --------------------------------------------------------------------------
# the kernel


def _fused_kernel(
    scal_i,  # SMEM i32[9]
    scal_f,  # SMEM f32[13]
    meta_ref, mask_ref, multi_ref,  # bf16 VMEM tables
    cx0, cy0, cz0, tx0, ty0, tz0, dx0, dy0, dz0,
    sx0, sy0, sz0, ax0, ay0, az0, px0, py0, pz0, val0,
    omat0, omat, ocx, ocy, ocz, ola, orefl, oshad, ost,
    odx, ody, odz, osx, osy, osz, oox, ooy, ooz, olt, ocr, ocg, ocb, oit,
    *,
    shape3, bgrid, air0, enable_materials, enable_shadows, prox_stop=False,
):
    Sx, Sy, Sz = shape3
    Bx, By, Bz = bgrid
    f32, i32 = jnp.float32, jnp.int32
    R = _TILE_ROWS
    y_max = scal_i[_SI_YMAX]
    budget = scal_i[_SI_BUDGET]
    sh_budget = scal_i[_SI_SH_BUDGET]
    w_hit = scal_i[_SI_W_HIT]
    w_evt = scal_i[_SI_W_EVT]
    w_refl = scal_i[_SI_W_REFL]
    w_liq = scal_i[_SI_W_LIQ]
    w_refr = scal_i[_SI_W_REFR]
    w_shhit = scal_i[_SI_W_SHHIT]
    time_s = scal_f[_SF_TIME]
    sun = [scal_f[_SF_SUN + k] for k in range(3)]
    sun_s = [scal_f[_SF_SSTEP + k] for k in range(3)]
    sun_dl = [scal_f[_SF_SDELTA + k] for k in range(3)]
    sun_ab = [scal_f[_SF_SABS + k] for k in range(3)]

    def resolve(cx, cy, cz, act, dirs=None):
        """(R,128) cells -> (m, vr, d_pri, d_sh, uni, xe, ye, zr). m =
        material id at the voxel (0 outside the window); vr = in-brick air
        license radius; d_pri / d_sh = brick-level licenses (>=1 only on
        jumpable bricks); (xe, ye, zr) = the MASKED-brick anisotropic air
        license (r05): when ``dirs`` = (iex, iey, iez) is given and the lane
        sits on an AIR voxel of a masked brick, the advance may jump the box
        [cx, cx+xe*iex] x [cy, cy+ye*iey] x [cz, cz+zr*iez] in one step —
        licensed by the occupancy bits already fetched (the current z-column
        byte plus the ray-forward +x/+y/diagonal column bytes of the SAME
        256-byte mask row), instead of one fine step per iteration
        (low_res.frag:520-524 generalized below brick level).

        Two phases: the brick-meta fetch runs every iteration (one K=128
        matmul per half-tile); the POOL fetches — the expensive matmuls — run
        under a single lax.cond that fires only when some ACTIVE lane actually
        sits in a masked/multi brick, so empty-space approach iterations, sky
        tiles and straggler tails skip them entirely. ``act`` masks settled
        lanes to the air class so a tile with one straggler stops paying for
        the 4095 finished lanes parked on surface bricks."""
        wx, wy, wz = cx & 1023, cy & 1023, cz & 1023
        in_w = (wx < Sx) & (wy < Sy) & (wz < Sz) & act
        blin = ((wx >> 3) * By + (wy >> 3)) * Bz + (wz >> 3)
        blin = jnp.where(in_w, blin, 0)
        vox = ((wx & 7) * 8 + (wy & 7)) * 8 + (wz & 7)

        # phase A: meta u16 per lane, half-tile chunks (VMEM-bounded)
        MF = 4  # meta chunk rows: 8 -> 4 buys ~1 M scoped-vmem headroom
        # (the full-feature kernel OOM'd at 16.18M for some operand layouts
        # — e.g. the plain render_image_fused path — already in r04;
        # measured r05: cost-neutral, same total matmul FLOPs)
        v16s = []
        for c in range(R // MF):
            sl = slice(c * MF, (c + 1) * MF)
            bl = blin[sl]
            ar = jax.lax.broadcasted_iota(i32, (MF, _LANES, meta_ref.shape[0]), 2)
            oh = ((bl >> 7)[:, :, None] == ar).astype(jnp.bfloat16)
            m1 = jax.lax.dot_general(
                oh.reshape(MF * _LANES, meta_ref.shape[0]), meta_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).reshape(MF, _LANES, 256)
            ar256 = jax.lax.broadcasted_iota(i32, (MF, _LANES, 256), 2)
            col0 = (bl * 2) & 255
            lo = (jnp.where(col0[:, :, None] == ar256, m1, jnp.bfloat16(0.0))
                  .sum(axis=2, dtype=jnp.float32).astype(i32))
            hi = (jnp.where((col0 + 1)[:, :, None] == ar256, m1, jnp.bfloat16(0.0))
                  .sum(axis=2, dtype=jnp.float32).astype(i32))
            v16s.append(lo | (hi << 8))
        v16 = jnp.concatenate(v16s, axis=0)
        v16 = jnp.where(in_w, v16, 0)
        cls = v16 >> 14

        # phase B: pool fetches (one cond for the whole tile)
        def pools(_):
            ar256 = jax.lax.broadcasted_iota(i32, (_RF, _LANES, 256), 2)
            kbs, ubs = [], []
            for c in range(R // _RF):
                sl = slice(c * _RF, (c + 1) * _RF)
                cls_c, v_c, vox_c = cls[sl], v16[sl], vox[sl]
                kslot = jnp.where(cls_c == 2, (v_c >> 4) & 0x3FF, 0)
                kbyte = kslot * 64 + (vox_c >> 3)
                m1k = _row_m1(mask_ref, kbyte >> 8)
                col0 = kbyte & 255
                kb_c = _sel_byte(m1k, col0, ar256)
                kbs.append(kb_c)
                # NOTE (r05, measured on-chip): extending the license with
                # neighbor-column bytes costs one extra _sel_byte per
                # neighbor and blew the 16M scoped-vmem stack (+2.16M for
                # the 2x2 xy neighborhood, +1.41M even for +x alone at
                # RF=2) — the license therefore stays z-only, computed from
                # the lane's own column byte with zero extra VMEM
                uslot = jnp.where(cls_c == 3, v_c & 0x3FFF, 0)
                ubs.append(_sel_byte(_row_m1(multi_ref, uslot), vox_c >> 1, ar256))
            return jnp.concatenate(kbs, axis=0), jnp.concatenate(ubs, axis=0)

        def no_pools(_):
            z = jnp.zeros((R, _LANES), i32)
            return z, z

        kb, ub = jax.lax.cond(jnp.any(cls >= 2), pools, no_pools, 0)
        kbit = (jax.lax.shift_right_logical(kb, vox & 7)) & 1
        nib = (jax.lax.shift_right_logical(ub, (vox & 1) << 2)) & 0xF
        is_lic = (cls == 3) & (nib >= air0)
        m = jnp.where(
            cls == 0, 0,
            jnp.where(
                cls == 1, v16 & 15,
                jnp.where(cls == 2, jnp.where(kbit > 0, v16 & 15, 0),
                          jnp.where(is_lic, 0, nib)),
            ),
        )
        vr = jnp.where(is_lic, nib - air0 + 1, 0)
        d_pri = jnp.where(cls == 0, v16 & 31, 0)
        d_sh = jnp.where(cls <= 1, (v16 >> 5) & 31, 0)
        if dirs is None:
            # literal Nones, not zeros planes: the full-feature kernel sits
            # within ~200 KB of the 16 M scoped-vmem limit and even three
            # (R,128) zero arrays tip it over (measured r05)
            xe = ye = zr = None
        else:
            iez = dirs[2]
            k = vox & 7
            airk = (cls == 2) & (kbit == 0) & in_w
            xe = jnp.zeros((R, _LANES), i32)
            ye = xe
            zr = jnp.where(airk, _zrun(kb, k, iez), 0)
        # prox-stop (r05 seed mode): the lane's voxel lies in a masked/multi
        # SURFACE brick — derived from cls already in registers, zero VMEM
        prox = (cls >= 2) & in_w if prox_stop else None
        return m, vr, d_pri, d_sh, cls == 1, xe, ye, zr, prox

    def axis_count(t_m, t, a, n, is_exit):
        c = jnp.where(t_m >= t, jnp.floor((t_m - t) / a).astype(i32) + 1, 0)
        c = jnp.minimum(c, n - 1)
        c = jnp.where(is_exit, n, c)
        return jnp.maximum(c, 0)

    def tie_break(ta, tb, tc):
        ma = (ta < tb) & (ta < tc)
        mb = ~ma & (tb < tc)
        mc = ~(ma | mb)
        return ma, mb, mc, jnp.where(ma, ta, jnp.where(mb, tb, tc))

    def to_shadow(gate, st8):
        """Hit-lane transition: save hit state; qualified lanes rebuild the ray
        toward the sun and take the forced pre-step (fast._shadow_march_fast),
        others finish. gate lanes must have mat != 0 set already."""
        (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
         ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
         st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh) = st8
        hcx = jnp.where(gate, cx, hcx)
        hcy = jnp.where(gate, cy, hcy)
        hcz = jnp.where(gate, cz, hcz)
        hla = jnp.where(gate, la, hla)
        hlt = jnp.where(gate, lt, hlt)
        hitf = jnp.where(gate, 1, hitf)
        s_la = jnp.where(la == 0, sx, jnp.where(la == 1, sy, sz))
        sun_la = jnp.where(la == 0, sun[0], jnp.where(la == 1, sun[1], sun[2]))
        facing = (sun_la * -s_la) > 0
        go = gate & facing & (refl == 0) if enable_shadows else gate & False
        ph = jnp.where(gate, jnp.where(go, 1, 2), ph)
        if enable_shadows:
            # shadow DDA init at the hit point, exiting through the hit face
            px = ox + lt * dx
            py = oy + lt * dy
            pz = oz + lt * dz
            stx = sun_ab[0] - (px + jnp.minimum(sun_s[0], 0.0) - cx.astype(f32)) * sun_dl[0]
            sty = sun_ab[1] - (py + jnp.minimum(sun_s[1], 0.0) - cy.astype(f32)) * sun_dl[1]
            stz = sun_ab[2] - (pz + jnp.minimum(sun_s[2], 0.0) - cz.astype(f32)) * sun_dl[2]
            stx = stx - jnp.where(la == 0, sun_ab[0], 0.0)
            sty = sty - jnp.where(la == 1, sun_ab[1], 0.0)
            stz = stz - jnp.where(la == 2, sun_ab[2], 0.0)
            # forced first step (the hit block itself is not re-tested)
            mx, my, mz, t_m = tie_break(stx, sty, stz)
            isx = jnp.where(sun_s[0] > 0, 1, -1)
            isy = jnp.where(sun_s[1] > 0, 1, -1)
            isz = jnp.where(sun_s[2] > 0, 1, -1)
            cx = jnp.where(go & mx, cx + isx, cx)
            cy = jnp.where(go & my, cy + isy, cy)
            cz = jnp.where(go & mz, cz + isz, cz)
            stx = jnp.where(go & mx, stx + sun_ab[0], stx)
            sty = jnp.where(go & my, sty + sun_ab[1], sty)
            stz = jnp.where(go & mz, stz + sun_ab[2], stz)
            tx = jnp.where(go, stx, tx)
            ty = jnp.where(go, sty, ty)
            tz = jnp.where(go, stz, tz)
            la = jnp.where(go, jnp.where(mx, 0, jnp.where(my, 1, 2)), la)
            lt = jnp.where(go, t_m, lt)
            st_sh = jnp.where(go, 1, st_sh)
        return (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
                ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
                st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh)

    def material_plane(st8, is_refl_e, is_refr_e, m_liq):
        """renderer.material_step on plane state (masked lanes only)."""
        (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
         ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
         st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh) = st8
        px = ox + lt * dx
        py = oy + lt * dy
        pz = oz + lt * dz
        l0, l1, l2 = la == 0, la == 1, la == 2
        # ---- reflection (reflectRay, low_res.frag:178-194)
        dx = jnp.where(is_refl_e & l0, -dx, dx)
        dy = jnp.where(is_refl_e & l1, -dy, dy)
        dz = jnp.where(is_refl_e & l2, -dz, dz)
        sx = jnp.where(is_refl_e & l0, -sx, sx)
        sy = jnp.where(is_refl_e & l1, -sy, sy)
        sz = jnp.where(is_refl_e & l2, -sz, sz)
        tx = jnp.where(is_refl_e & l0, tx - adx, tx)
        ty = jnp.where(is_refl_e & l1, ty - ady, ty)
        tz = jnp.where(is_refl_e & l2, tz - adz, tz)
        ox = jnp.where(is_refl_e, px - lt * dx, ox)
        oy = jnp.where(is_refl_e, py - lt * dy, oy)
        oz = jnp.where(is_refl_e, pz - lt * dz, oz)
        cr = jnp.where(is_refl_e, cr * 0.94, cr)
        cg = jnp.where(is_refl_e, cg * 0.94, cg)
        cb = jnp.where(is_refl_e, cb * 0.94, cb)
        refl = jnp.where(is_refl_e, 1, refl)
        # ---- refraction (refractRay, low_res.frag:198-240)
        cr = jnp.where(is_refr_e, cr * jnp.where(m_liq, 0.94, 0.95), cr)
        cg = jnp.where(is_refr_e, cg * jnp.where(m_liq, 0.97, 0.95), cg)
        cb = jnp.where(is_refr_e, cb * jnp.where(m_liq, 1.0, 0.95), cb)
        bend = is_refr_e & (ior != 1.1)
        nx = jnp.where(l0, sx, 0.0)
        ny = jnp.where(l1, sy, 0.0)
        nz = jnp.where(l2, sz, 0.0)
        wob = jnp.sin((time_s + px * 0.2 - pz * 0.1) * 10.0) * 0.2
        nx = jnp.where(bend & m_liq, nx + wob, nx)
        nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        nn = jnp.where(nn > 0, nn, 1.0)
        nx, ny, nz = nx / nn, ny / nn, nz / nn
        rr = ior / 1.1
        c1 = nx * dx + ny * dy + nz * dz
        flip = c1 < 0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)
        c1 = jnp.abs(c1)
        c2 = jnp.sqrt(jnp.maximum(1.0 - rr * rr * (1.0 - c1 * c1), 0.0))
        k = rr * c1 - c2
        bdx = rr * dx + k * nx
        bdy = rr * dy + k * ny
        bdz = rr * dz + k * nz
        # _build_ray on the bent direction (sanitize + step/delta/abs)
        eps = jnp.float32(1e-12)
        bdx = jnp.where(jnp.abs(bdx) < eps, eps, bdx)
        bdy = jnp.where(jnp.abs(bdy) < eps, eps, bdy)
        bdz = jnp.where(jnp.abs(bdz) < eps, eps, bdz)
        bsx = jnp.where(bdx < 0, -1.0, 1.0)
        bsy = jnp.where(bdy < 0, -1.0, 1.0)
        bsz = jnp.where(bdz < 0, -1.0, 1.0)
        bdlx, bdly, bdlz = 1.0 / bdx, 1.0 / bdy, 1.0 / bdz
        bax, bay, baz = jnp.abs(bdlx), jnp.abs(bdly), jnp.abs(bdlz)
        btx = bax - (px + jnp.minimum(bsx, 0.0) - cx.astype(f32)) * bdlx
        bty = bay - (py + jnp.minimum(bsy, 0.0) - cy.astype(f32)) * bdly
        btz = baz - (pz + jnp.minimum(bsz, 0.0) - cz.astype(f32)) * bdlz
        dx = jnp.where(bend, bdx, dx)
        dy = jnp.where(bend, bdy, dy)
        dz = jnp.where(bend, bdz, dz)
        sx = jnp.where(bend, bsx, sx)
        sy = jnp.where(bend, bsy, sy)
        sz = jnp.where(bend, bsz, sz)
        adx = jnp.where(bend, bax, adx)
        ady = jnp.where(bend, bay, ady)
        adz = jnp.where(bend, baz, adz)
        tx = jnp.where(bend, btx, tx)
        ty = jnp.where(bend, bty, ty)
        tz = jnp.where(bend, btz, tz)
        ox = jnp.where(bend, px, ox)
        oy = jnp.where(bend, py, oy)
        oz = jnp.where(bend, pz, oz)
        lt = jnp.where(bend, 0.0, lt)
        ior = jnp.where(is_refr_e, 1.1, ior)
        return (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
                ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
                st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh)

    def step_once(carry):
        st8, nit, it = carry[:-2], carry[-2], carry[-1]
        st8 = tuple(st8)
        (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
         ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
         st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh) = st8

        in_pri = ph == 0
        in_sh = ph == 1
        # phase-effective step signs BEFORE resolve, for the anisotropic
        # masked-brick license: lanes that change phase or bend this
        # iteration either do not advance (hit transitions set marching
        # False) or sit on solid voxels (material events -> no air license),
        # so license directions always match the advance directions
        # the masked-air z license is enabled only for the lean
        # (materials/shadows off) kernel — the full-feature kernel sits
        # within ~200 KB of the 16 M scoped-vmem limit (measured r05) and
        # even the license's early step-sign planes push it over
        use_lic = not (enable_materials or enable_shadows)
        if use_lic:
            exp_ = jnp.where(in_sh, sun_s[0], sx)
            eyp_ = jnp.where(in_sh, sun_s[1], sy)
            ezp_ = jnp.where(in_sh, sun_s[2], sz)
            lic_dirs = (jnp.where(exp_ > 0, 1, -1),
                        jnp.where(eyp_ > 0, 1, -1),
                        jnp.where(ezp_ > 0, 1, -1))
        else:
            lic_dirs = None
        m, vr, d_pri, d_sh, uni, xe, ye, zre, proxp = resolve(
            cx, cy, cz, ph < 2, lic_dirs)

        # ---- classification (primary: frag:317-328; shadow: frag:383-389)
        hit_p = in_pri & _word_bit(w_hit, m)
        evt = in_pri & _word_bit(w_evt, m)
        if prox_stop:
            # seed mode: settle at first ENTRY into a surface brick instead
            # of chasing the exact in-brick hit — the 24-step guided window
            # covers a whole 8^3-brick traversal (<= 22 axis crossings) from
            # the entry crossing, and rays whose surface still lies beyond
            # the window are patched exactly downstream (diff.py prox
            # orchestration). Air voxels of the stop brick export a sentinel
            # nonzero mat so aux['hit'] stays true for the seed consumer.
            hit_p = hit_p | (in_pri & proxp)
            mat = jnp.where(in_pri, jnp.where(proxp & (m == 0), 1, m), mat)
        else:
            mat = jnp.where(in_pri, m, mat)
        mat_sh = jnp.where(in_sh, m, mat_sh)
        hit_s = in_sh & _word_bit(w_shhit, m)
        ph = jnp.where(hit_s, 2, ph)

        st8 = (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
               ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
               st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh)

        # ---- hit lanes -> shadow phase (or done)
        st8 = to_shadow(hit_p, st8)

        # ---- material events (reflect/refract) on still-marching lanes
        wjump = jnp.zeros((R, _LANES), jnp.bool_)
        m_liq = _word_bit(w_liq, m)
        if enable_materials:
            is_refl_e = evt & _word_bit(w_refl, m)
            is_refr_e = evt & ~_word_bit(w_refl, m)
            st8 = material_plane(st8, is_refl_e, is_refr_e, m_liq)
            # uniform refractive VOLUME (a water/glass-filled brick): instead
            # of one voxel step per iteration through it, advance through the
            # whole brick box in one AABB advance and apply the per-voxel tint
            # of the skipped cells afterwards (left-fold, bit-exact vs the
            # sequential path). Guarded so the budget cannot expire mid-jump
            # (<= 24 crossings traverse an 8^3 brick).
            st_now = st8[28]
            wjump = is_refr_e & uni & ((budget - st_now) > 24)

        (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
         ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
         st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh) = st8

        # phase-effective step/abs (shadow lanes march along the sun ray)
        in_sh2 = ph == 1
        ex = jnp.where(in_sh2, sun_s[0], sx)
        ey = jnp.where(in_sh2, sun_s[1], sy)
        ez = jnp.where(in_sh2, sun_s[2], sz)
        ax_ = jnp.where(in_sh2, sun_ab[0], adx)
        ay_ = jnp.where(in_sh2, sun_ab[1], ady)
        az_ = jnp.where(in_sh2, sun_ab[2], adz)
        iex = jnp.where(ex > 0, 1, -1)
        iey = jnp.where(ey > 0, 1, -1)
        iez = jnp.where(ez > 0, 1, -1)

        # ---- exit rules (window slab / sky) on lanes still marching
        opx, onx = cx >= Sx, cx < 0
        opy, ony = cy >= Sy, cy < 0
        opz, onz = cz >= Sz, cz < 0
        inside = ~(opx | onx | opy | ony | opz | onz)
        away = (
            (opx & (ex > 0)) | (onx & (ex < 0))
            | (opy & (ey > 0)) | (ony & (ey < 0))
            | (opz & (ez > 0)) | (onz & (ez < 0))
        )
        sky = (cy > y_max) & (ey > 0)
        marching = (in_pri & ~hit_p) | (in_sh & ~hit_s)
        marching = marching & (ph != 2)
        ph = jnp.where(marching & (away | sky), 2, ph)
        march = marching & ~(away | sky)

        # ---- box bounds: brick license (phase-dep), voxel license, or slab
        D = jnp.where(in_sh2, d_sh, d_pri)
        D = jnp.where(wjump & ~in_sh2, 1, D)  # water jump: own-brick box
        use_b = D >= 1
        bx, by, bz = (cx & 1023) >> 3, (cy & 1023) >> 3, (cz & 1023) >> 3
        rb = D - 1
        # per-axis voxel license extents: the multi-brick Chebyshev radius
        # (vr, isotropic) plus the masked-brick forward z-run (zre,
        # ray-directional) — the two are disjoint by brick class
        if use_lic:
            vrxl = vr + jnp.where(lic_dirs[0] < 0, xe, 0)
            vrxh = vr + jnp.where(lic_dirs[0] > 0, xe, 0)
            vryl = vr + jnp.where(lic_dirs[1] < 0, ye, 0)
            vryh = vr + jnp.where(lic_dirs[1] > 0, ye, 0)
            vrzl = vr + jnp.where(lic_dirs[2] < 0, zre, 0)
            vrzh = vr + jnp.where(lic_dirs[2] > 0, zre, 0)
        else:
            vrxl = vrxh = vryl = vryh = vrzl = vrzh = vr
        lox = jnp.where(inside, jnp.where(use_b, (bx - rb) << 3, cx - vrxl),
                        jnp.where(opx, Sx, -_BIG))
        hix = jnp.where(inside, jnp.where(use_b, ((bx + rb + 1) << 3) - 1, cx + vrxh),
                        jnp.where(onx, -1, _BIG))
        loy = jnp.where(inside, jnp.where(use_b, (by - rb) << 3, cy - vryl),
                        jnp.where(opy, Sy, -_BIG))
        hiy = jnp.where(inside, jnp.where(use_b, ((by + rb + 1) << 3) - 1, cy + vryh),
                        jnp.where(ony, -1, _BIG))
        loz = jnp.where(inside, jnp.where(use_b, (bz - rb) << 3, cz - vrzl),
                        jnp.where(opz, Sz, -_BIG))
        hiz = jnp.where(inside, jnp.where(use_b, ((bz + rb + 1) << 3) - 1, cz + vrzh),
                        jnp.where(onz, -1, _BIG))

        nx = jnp.clip(jnp.where(ex > 0, hix + 1 - cx, cx - lox + 1), 1, _MAX_JUMP)
        ny = jnp.clip(jnp.where(ey > 0, hiy + 1 - cy, cy - loy + 1), 1, _MAX_JUMP)
        nz = jnp.clip(jnp.where(ez > 0, hiz + 1 - cz, cz - loz + 1), 1, _MAX_JUMP)
        tex = tx + (nx - 1).astype(f32) * ax_
        tey = ty + (ny - 1).astype(f32) * ay_
        tez = tz + (nz - 1).astype(f32) * az_
        mx, my, mz, t_m = tie_break(tex, tey, tez)
        ccx = axis_count(t_m, tx, ax_, nx, mx)
        ccy = axis_count(t_m, ty, ay_, ny, my)
        ccz = axis_count(t_m, tz, az_, nz, mz)

        cx = jnp.where(march, cx + ccx * iex, cx)
        cy = jnp.where(march, cy + ccy * iey, cy)
        cz = jnp.where(march, cz + ccz * iez, cz)
        tx = jnp.where(march, tx + ccx.astype(f32) * ax_, tx)
        ty = jnp.where(march, ty + ccy.astype(f32) * ay_, ty)
        tz = jnp.where(march, tz + ccz.astype(f32) * az_, tz)
        la = jnp.where(march, jnp.where(mx, 0, jnp.where(my, 1, 2)), la)
        lt = jnp.where(march, t_m, lt)
        cc = ccx + ccy + ccz
        st = st + jnp.where(march & ~in_sh2, cc, 0)
        st_sh = st_sh + jnp.where(march & in_sh2, cc, 0)

        # water-jump tint of the skipped in-brick cells: the sequential path
        # multiplies the refractive tint once per cell entered inside the
        # brick (cc - 1 of them); replay as the same left-fold of multiplies
        if enable_materials:
            wj = wjump & march & ~in_sh2
            k = jnp.where(wj, cc - 1, 0)
            t_r = jnp.where(m_liq, jnp.float32(0.94), jnp.float32(0.95))
            t_g = jnp.where(m_liq, jnp.float32(0.97), jnp.float32(0.95))
            t_b = jnp.where(m_liq, jnp.float32(1.0), jnp.float32(0.95))
            for j in range(24):
                mm = j < k
                cr = jnp.where(mm, cr * t_r, cr)
                cg = jnp.where(mm, cg * t_g, cg)
                cb = jnp.where(mm, cb * t_b, cb)

        # ---- budget freezes; frozen primary lanes still shadow (fast parity)
        froze_p = march & ~in_sh2 & (st >= budget)
        froze_s = march & in_sh2 & (st_sh >= sh_budget)
        ph = jnp.where(froze_s, 2, ph)
        st8 = (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
               ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
               st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh)
        st8 = to_shadow(froze_p & (mat != 0), st8)
        ph = st8[27]
        ph = jnp.where(froze_p & (mat == 0), 2, ph)
        st8 = st8[:27] + (ph,) + st8[28:]

        progressed = march | hit_p
        it = jnp.where(jnp.any(progressed), it + 1, _ITER_CAP)
        return st8 + (nit + 1, it)

    def cond(carry):
        return carry[-1] < _ITER_CAP

    # ---- initial state + start-cell specials (low_res.frag:299-307)
    cx, cy, cz = cx0[:], cy0[:], cz0[:]
    valid = val0[:] != 0
    m0 = resolve(cx, cy, cz, valid)[0]
    refr0 = _word_bit(w_refr, m0) & (m0 != 0)
    raw0 = (m0 != 0) & ~refr0
    ph_i = jnp.where(raw0 | ~valid, 2, 0).astype(i32)
    zi = jnp.zeros((R, _LANES), i32)
    zf = jnp.zeros((R, _LANES), f32)
    init = (
        cx, cy, cz, tx0[:], ty0[:], tz0[:], dx0[:], dy0[:], dz0[:],
        sx0[:], sy0[:], sz0[:], ax0[:], ay0[:], az0[:], px0[:], py0[:], pz0[:],
        zf,  # lt
        zi,  # la
        jnp.ones((R, _LANES), f32), jnp.ones((R, _LANES), f32),
        jnp.ones((R, _LANES), f32),  # color_mod
        jnp.where(refr0, 1.1, 1.0).astype(f32),  # ior
        jnp.where(raw0, m0, 0),  # mat
        zi,  # refl
        zi,  # hitf
        ph_i,
        zi, zi,  # st, st_sh
        cx, cy, cz,  # hit cell
        zi, zf,  # hla, hlt
        zi,  # mat_sh
        jnp.zeros((), i32),  # nit (true iteration count, diagnostics)
        jnp.zeros((), i32),  # it (settle-jumps to _ITER_CAP)
    )
    def body2(carry):
        # two march steps per while trip: the loop cond's cross-lane any() is
        # a scalar sync — amortize it (settled lanes make the extra step a
        # fully-masked no-op; kernel A measured this worth ~1.2x)
        return step_once(step_once(carry))

    out = jax.lax.while_loop(cond, body2, init)
    (cx, cy, cz, tx, ty, tz, dx, dy, dz, sx, sy, sz, adx, ady, adz,
     ox, oy, oz, lt, la, cr, cg, cb, ior, mat, refl, hitf, ph,
     st, st_sh, hcx, hcy, hcz, hla, hlt, mat_sh) = out[:-2]

    h = hitf != 0
    omat0[:] = m0
    omat[:] = mat
    ocx[:] = jnp.where(h, hcx, cx)
    ocy[:] = jnp.where(h, hcy, cy)
    ocz[:] = jnp.where(h, hcz, cz)
    ola[:] = jnp.where(h, hla, la)
    orefl[:] = refl
    oshad[:] = (mat_sh != 0).astype(i32)
    ost[:] = st
    odx[:], ody[:], odz[:] = dx, dy, dz
    osx[:], osy[:], osz[:] = sx, sy, sz
    oox[:], ooy[:], ooz[:] = ox, oy, oz
    olt[:] = jnp.where(h, hlt, lt)
    ocr[:], ocg[:], ocb[:] = cr, cg, cb
    oit[:] = jnp.zeros((R, _LANES), i32) + out[-2]


# --------------------------------------------------------------------------
# host wrapper


def _planes(a, n_pad, fill=0):
    if n_pad:
        a = jnp.concatenate([a, jnp.full((n_pad,), fill, a.dtype)])
    return a.reshape(-1, _LANES)


def _luts(scene: Scene, cfg: RenderConfig):
    """16-bit LUT words over material ids (jit-traceable from scene.flags)."""
    fl = scene.flags
    P = fl.shape[0]
    fl16 = jnp.concatenate([fl, jnp.zeros(16, fl.dtype)])[:16] if P < 16 else fl[:16]
    ids = jnp.arange(16, dtype=jnp.int32)
    solid = ids > 0
    f7 = fl16 & 0x7
    refl_b = solid & (f7 == 0x3)
    refr_b = solid & (f7 == 0x5)
    if cfg.enable_materials:
        hit_b = solid & ~refl_b & ~refr_b
        evt_b = refl_b | refr_b
    else:
        hit_b = solid
        evt_b = jnp.zeros_like(solid)
    liq_b = (fl16 & int(Properties.LIQUID)) > 0
    refrf_b = (fl16 & int(Properties.REFRACTIVE)) > 0
    shhit_b = solid & ~liq_b

    def word(mask):
        return (mask.astype(jnp.int32) << ids).sum()

    return word(hit_b), word(evt_b), word(refl_b), word(liq_b), word(refrf_b), word(shhit_b)


def pallas_supported() -> bool:
    from .support import pallas_supported as _ps

    return _ps()


_OUT_DTYPES = (
    [jnp.int32] * 9 + [jnp.float32] * 13 + [jnp.int32]
)


def fused_march_call(scene, ft: FusedTables, s, cfg: RenderConfig, time_s, interpret,
                     prox_stop=False):
    """Run the fused kernel on a fast._init_state-style _March ``s``.
    Returns the dict of per-lane outputs (unpadded)."""
    assert not (prox_stop and (cfg.enable_materials or cfg.enable_shadows)), (
        "prox_stop is a seed-mode flag: lean kernel only")
    N = s.cell.shape[0]
    tile = _TILE_ROWS * _LANES
    n_pad = (-N) % tile
    NP = N + n_pad
    f32 = jnp.float32

    sun = jnp.asarray(cfg.sun_dir, f32)
    sun = sun / jnp.linalg.norm(sun)
    eps = jnp.float32(1e-12)
    sun_sane = jnp.where(jnp.abs(sun) < eps, eps, sun)
    sun_step = jnp.where(sun_sane < 0, -1.0, 1.0)
    sun_delta = 1.0 / sun_sane
    sun_abs = jnp.abs(sun_delta)
    if time_s is None:
        time_s = cfg.time
    scal_f = jnp.concatenate(
        [jnp.asarray(time_s, f32).reshape(1), sun_sane, sun_step, sun_delta, sun_abs]
    )
    w_hit, w_evt, w_refl, w_liq, w_refr, w_shhit = _luts(scene, cfg)
    scal_i = jnp.stack(
        [
            jnp.asarray(scene.y_max, jnp.int32),
            jnp.asarray(cfg.max_steps, jnp.int32),
            jnp.asarray(cfg.shadow_steps, jnp.int32),
            w_hit, w_evt, w_refl, w_liq, w_refr, w_shhit,
        ]
    )

    p = lambda a, fill=0: _planes(a, n_pad, fill)
    ins = (
        p(s.cell[:, 0]), p(s.cell[:, 1]), p(s.cell[:, 2]),
        p(s.tmax[:, 0]), p(s.tmax[:, 1]), p(s.tmax[:, 2]),
        p(s.dir[:, 0], 1.0), p(s.dir[:, 1], 1.0), p(s.dir[:, 2], 1.0),
        p(s.step[:, 0], 1.0), p(s.step[:, 1], 1.0), p(s.step[:, 2], 1.0),
        p(s.abs_delta[:, 0], 1.0), p(s.abs_delta[:, 1], 1.0), p(s.abs_delta[:, 2], 1.0),
        p(s.seg_origin[:, 0]), p(s.seg_origin[:, 1]), p(s.seg_origin[:, 2]),
        p(jnp.ones(N, jnp.int32)),  # valid
    )

    kern = functools.partial(
        _fused_kernel,
        shape3=tuple(ft.shape3),
        bgrid=tuple(ft.bgrid),
        air0=ft.air0,
        enable_materials=cfg.enable_materials,
        enable_shadows=cfg.enable_shadows,
        prox_stop=prox_stop,
    )
    ray_spec = pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tabs = [jnp.asarray(t, jnp.float32).astype(jnp.bfloat16)
            for t in (ft.meta, ft.mask, ft.multi)]
    tab_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0)) for t in tabs]
    outs = pl.pallas_call(
        kern,
        grid=(NP // tile,),
        in_specs=[smem_spec, smem_spec] + tab_specs + [ray_spec] * 19,
        out_specs=[ray_spec] * 23,
        out_shape=[
            jax.ShapeDtypeStruct((NP // _LANES, _LANES), dt) for dt in _OUT_DTYPES
        ],
        interpret=interpret,
    )(scal_i, scal_f, *tabs, *ins)
    o = [x.reshape(-1)[:N] for x in outs]
    return {
        "mat0": o[0], "mat": o[1],
        "cell": jnp.stack(o[2:5], axis=1),
        "la": o[5], "refl": o[6] != 0, "shad": o[7] != 0, "steps": o[8],
        "dir": jnp.stack(o[9:12], axis=1),
        "step": jnp.stack(o[12:15], axis=1),
        "seg_origin": jnp.stack(o[15:18], axis=1),
        "lt": o[18],
        "color_mod": jnp.stack(o[19:22], axis=1),
        "tile_iters": o[22],  # per-tile while-loop trips (perf diagnostics)
    }


def _block_perm(H, W):
    """Row-major pixel order -> (bh x bw) pixel blocks of exactly one kernel
    tile each (and the inverse), as index maps."""
    bw = 64
    bh = (_TILE_ROWS * _LANES) // bw
    idx = np.arange(H * W).reshape(H, W)
    blocks = idx.reshape(H // bh, bh, W // bw, bw).transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(blocks)
    inv[blocks] = np.arange(H * W)
    return blocks, inv


def render_rays_fused(
    scene: Scene,
    ft: FusedTables,
    origin,
    dirs,
    cfg: RenderConfig,
    start_t=None,
    time_s=None,
    interpret=None,
    image_hw=None,
    prox_stop=False,
):
    """Fused-kernel render of arbitrary rays -> (rgb [N,3], aux).

    Semantics of render/fast.py (the oracle-validated path); shading runs the
    SHARED renderer.shade on the kernel's outputs. ``image_hw=(H, W)`` remaps
    rays into 64x64 pixel blocks so each kernel tile is spatially coherent
    (per-tile early exit then tracks local scene depth, not the global worst
    ray).
    """
    from ..render import fast as _fast
    from ..render.renderer import shade, _March, _onehot

    if interpret is None:
        interpret = not pallas_supported()
    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    N = dirs.shape[0]
    if time_s is None:
        time_s = cfg.time

    perm = inv = None
    if image_hw is not None:
        H, W = image_hw
        bh, bw = (_TILE_ROWS * _LANES) // 64, 64
        if H % bh == 0 and W % bw == 0 and H * W == N:
            pb, inv_ = _block_perm(H, W)
            perm = jnp.asarray(pb)
            inv = jnp.asarray(inv_)
            dirs = jnp.take(dirs, perm, axis=0)
            if origin.ndim == 2:
                origin = jnp.take(origin, perm, axis=0)
            if start_t is not None:
                start_t = jnp.take(jnp.asarray(start_t, f32), perm)

    s = _fast._init_state(origin, dirs, jnp.ones(N, f32), start_t=start_t)
    o = fused_march_call(scene, ft, s, cfg, time_s, interpret,
                         prox_stop=prox_stop)

    mat0 = o["mat0"]
    flags0 = jnp.take(scene.flags, mat0)
    refr0 = (flags0 & int(Properties.REFRACTIVE)) > 0
    raw0 = (mat0 != 0) & ~refr0

    d = o["dir"]
    abs_delta = jnp.abs(1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d))
    state = _March(
        mat=o["mat"],
        cell=o["cell"],
        dir=d,
        step=o["step"],
        abs_delta=abs_delta,
        tmax=jnp.zeros((N, 3), f32),
        seg_origin=o["seg_origin"],
        last_t=o["lt"],
        last_axis=o["la"],
        color_mod=o["color_mod"],
        ior=jnp.ones(N, f32),
        reflected=o["refl"],
        done=jnp.ones(N, bool),
        steps=o["steps"],
    )
    sun = jnp.asarray(cfg.sun_dir, f32)
    sun = sun / jnp.linalg.norm(sun)
    shad = o["shad"]

    col, aux = shade(scene, state, raw0, mat0, sun, cfg,
                     lambda p, cell, la, step, active: shad & active)
    aux["tile_iters"] = o["tile_iters"]
    if inv is not None:
        col = jnp.take(col, inv, axis=0)
        aux = {k: jnp.take(v, inv, axis=0) for k, v in aux.items()}
    return col, aux


def seed_depth_fused(
    scene: Scene,
    ft: FusedTables,
    origin,
    dirs,
    image_hw,
    coarse_factor: int = 4,
    margin: float = 3.0,
    prox: bool = False,
    time_jitter=None,
    interpret=None,
    max_steps: int = None,
):
    """Window-seed depths from the fused march (the C11 progressive scheme;
    shared by bench.py, the verify harness, and the fused train step): a
    1/coarse_factor-resolution march seeds a full-resolution march whose
    first-solid depths become guided-window seeds (1e6 = sky sentinel,
    consumed by render/diff.py MISS_SEED_MIN semantics).

    ``prox`` (r05): both passes stop at first ENTRY into a surface brick
    instead of fine-stepping to the exact in-brick hit — a 24-step window
    covers a whole 8^3-brick traversal (<= 22 axis crossings) from the entry
    crossing, so the march skips its most expensive phase; rays whose
    surface still lies beyond the window (grazing rays) must be patched by
    the caller (render/diff.py render_rays_guided_prox) — the window kernel
    reports them via aux['w_sum']. Use a small ``margin`` (~0.5) with prox:
    every world unit of margin spends up to ~3 window crossings.

    ``time_jitter``: optional traced scalar mixed into the ray directions
    (1 + 1e-6*t) — measurement hygiene for the memoizing tunnel backend.
    """
    from ..config import RenderConfig
    from ..render import progressive

    f32 = jnp.float32
    H, W = image_hw
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    assert origin.ndim == 1, "seed_depth_fused: camera images share one origin"
    if time_jitter is not None:
        dirs = dirs * (1.0 + 1e-6 * time_jitter)
    cf = coarse_factor
    kw = {} if max_steps is None else {"max_steps": max_steps}
    rc = RenderConfig(width=W // cf, height=H // cf,
                      enable_materials=False, enable_shadows=False, **kw)
    rn = RenderConfig(width=W, height=H,
                      enable_materials=False, enable_shadows=False, **kw)
    cdirs = dirs.reshape(H, W, 3)[cf // 2::cf, cf // 2::cf].reshape(-1, 3)
    _, caux = render_rays_fused(
        scene, ft, origin, cdirs, rc, interpret=interpret,
        image_hw=(H // cf, W // cf), prox_stop=prox)
    o = origin[None, :]
    ct = jnp.linalg.norm(caux["hit_pos"] - o, axis=1)
    depth = jnp.where(caux["hit"], ct, 1e6).reshape(H // cf, W // cf)
    st = progressive.seed_from_depth(depth, cf, H, W)
    _, aux = render_rays_fused(
        scene, ft, origin, dirs, rn, interpret=interpret,
        image_hw=(H, W), start_t=st, prox_stop=prox)
    t_hit = jnp.linalg.norm(aux["hit_pos"] - o, axis=1)
    return jnp.where(aux["hit"], jnp.maximum(t_hit - margin, 0.0), 1e6)


def render_rays_fused_dp(
    scene, ft, origin, dirs, cfg, mesh, time_s=None, interpret=None,
    image_hw=None,
):
    """Data-parallel fused render: rays sharded over the mesh's "data" axis
    via ``shard_map`` (a Pallas call is a custom call XLA cannot partition,
    so dp is explicit — SURVEY §5.8's "rays/tiles sharded via shard_map").
    Scene + tables replicate through closure capture; rays are pure dp, so
    the result is bit-exact vs the single-device kernel (asserted in
    tests/test_fused.py). ``image_hw`` applies the 64x64-pixel block remap
    GLOBALLY, then shards whole tiles (per-shard spatial coherence equals
    the single-device kernel's).

    Returns (col, aux) with the seed-relevant aux fields (hit, hit_pos).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    f32 = jnp.float32
    origin = jnp.asarray(origin, f32)
    dirs = jnp.asarray(dirs, f32)
    N = dirs.shape[0]
    n = mesh.shape[DATA_AXIS]

    perm = inv = None
    if image_hw is not None:
        H, W = image_hw
        bh, bw = (_TILE_ROWS * _LANES) // 64, 64
        if H % bh == 0 and W % bw == 0 and H * W == N:
            pb, inv_ = _block_perm(H, W)
            perm = jnp.asarray(pb)
            inv = jnp.asarray(inv_)
            dirs = jnp.take(dirs, perm, axis=0)
            if origin.ndim == 2:
                origin = jnp.take(origin, perm, axis=0)
    assert N % n == 0, f"{N} rays not divisible by {n} data shards"

    shared_origin = origin.ndim == 1

    def local(dirs_blk, origin_blk):
        o = origin_blk if not shared_origin else origin
        col, aux = render_rays_fused(
            scene, ft, o, dirs_blk, cfg, time_s=time_s, interpret=interpret
        )
        return col, aux["hit"], aux["hit_pos"]

    origin_arg = origin if not shared_origin else jnp.zeros((N, 1), f32)
    f = functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS, None)),
        check_vma=False,
    )(local)
    col, hit, hit_pos = f(dirs, origin_arg)
    if inv is not None:
        col = jnp.take(col, inv, axis=0)
        hit = jnp.take(hit, inv)
        hit_pos = jnp.take(hit_pos, inv, axis=0)
    return col, {"hit": hit, "hit_pos": hit_pos}


def render_image_fused(scene, ft, camera, cfg, time_s=None, interpret=None):
    from ..render.camera import ray_directions

    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    col, _ = render_rays_fused(
        scene, ft, camera.pos, dirs, cfg, time_s=time_s, interpret=interpret,
        image_hw=(cfg.height, cfg.width),
    )
    img = col.reshape(cfg.height, cfg.width, 3)
    if cfg.crosshair:
        yy = jnp.arange(cfg.height, dtype=jnp.float32)[:, None]
        xx = jnp.arange(cfg.width, dtype=jnp.float32)[None, :]
        mrow, mcol = cfg.mouse_px
        d2 = (yy - mrow) ** 2 + (xx - mcol) ** 2
        img = jnp.where((d2 <= 9.0)[:, :, None], 1.0, img)
    return img


def tables_for_scene(scene: Scene) -> FusedTables:
    """Build FusedTables from a device Scene (pulls the grid to host once)."""
    return build_fused_tables(np.asarray(scene.mat), np.asarray(scene.flags))
