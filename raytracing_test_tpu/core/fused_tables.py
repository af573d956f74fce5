"""Table set for the fused single-invocation march kernel (kernels/fused_march).

The round-2 kernels (kernels/brick_kernels.py) split the march into per-round
Pallas invocations with XLA glue (row gathers, material re-entry); the measured
per-invocation floor (~28 ms per 1M lanes, PROBE_r03) made that structure the
bottleneck. The fused kernel keeps the ENTIRE march — empty-space brick jumps,
per-voxel fine steps, reflect/refract events, and the sun-shadow march — inside
one kernel, which requires every lookup it performs to be expressible as an
in-VMEM MXU one-hot matmul (the only fast in-kernel lookup on this chip; see
CLAUDE.md). This module builds those tables host-side (numpy):

  - ``meta``: one u16 per 8^3 brick, stored as an f32 byte table. Encodes the
    brick CLASS plus everything the march needs per class:
      class 0 AIR     : bits[0:5) Chebyshev distance d>=1 to the nearest
                        occupied brick (license = d-1 bricks — the tree-bitmap
                        empty-space skip of low_res.frag:520-524, hierarchical);
                        bits[5:10) same with LIQUID bricks counted as air (the
                        shadow march skips liquid, low_res.frag:382-387)
      class 1 UNIFORM : bits[0:4) the single material id filling the brick;
                        bits[5:10) shadow distance (>=1 for liquid-only bricks:
                        shadow rays jump straight through water volumes)
      class 2 MASKED  : one non-air material + air. bits[0:4) material id,
                        bits[4:14) slot into the occupancy-bit pool
      class 3 MULTI   : >=2 materials. bits[0:14) slot into the nibble pool
  - ``mask``: per-MASKED-brick 512-bit voxel occupancy (64 B/brick rows).
  - ``multi``: per-MULTI-brick 4-bit voxel codes (256 B/brick rows): 0 = air,
    1..air0-1 = material ids, air0+r = air holding a GLOBAL Chebyshev all-air
    license of radius r+1 voxels (from the same distance transform as
    Scene.grid_enc) — so grazing rays skip air pockets inside surface bricks.

Pool sizes (default 256x128x256 world): 2716 occupied bricks = 868 uniform +
705 masked + 1143 multi; tables total ~420 KB — VMEM-resident for the whole
render. Class/flag decisions (hit / reflect / refract / liquid) happen in-kernel
via 16-bit SMEM LUT words over material ids, so the builder only needs ids.

Constraints (callers fall back to render/fast.py when unmet): grid dims
divisible by 8; material ids <= 13 (the masked/uniform 4-bit field, minus air
and at least one spare license code).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

BRICK_SHIFT = 3  # 8^3 bricks
BS = 1 << BRICK_SHIFT
DIST_CAP = 31  # 5-bit license fields
MAX_MASKED = 1024  # 10-bit slot; overflow bricks promote to MULTI
MAX_MULTI = 16384  # 14-bit slot

CLS_AIR, CLS_UNIFORM, CLS_MASKED, CLS_MULTI = 0, 1, 2, 3


class FusedTables(NamedTuple):
    """MXU one-hot byte tables (f32, rows of 256 bytes) + static layout ints.

    Close over this object at jit boundaries (like a config) rather than
    passing it as a traced argument — the int fields are static kernel
    parameters.
    """

    meta: np.ndarray  # f32 [Am, 256]: brick u16s, byte i at [i>>8, i&255]
    mask: np.ndarray  # f32 [Ak, 256]: masked-brick 64 B occupancy rows
    multi: np.ndarray  # f32 [Au, 256]: multi-brick 256 B nibble rows
    air0: int  # first nibble code meaning "air with license"; 16 = none
    bgrid: Tuple[int, int, int]
    shape3: Tuple[int, int, int]
    n_masked: int
    n_multi: int


def _pad_rows(bytes_flat: np.ndarray, row_pad: int = 128) -> np.ndarray:
    """u8[n] -> f32[A, 256] with A padded to a multiple of ``row_pad``."""
    n = bytes_flat.shape[0]
    rows = max((n + 255) // 256, 1)
    rows = ((rows + row_pad - 1) // row_pad) * row_pad
    out = np.zeros(rows * 256, np.float32)
    out[:n] = bytes_flat.astype(np.float32)
    return out.reshape(rows, 256)


def _chebyshev(occ: np.ndarray, cap: int) -> np.ndarray:
    from ..ops.mxu_lookup import chebyshev_distance_field

    return chebyshev_distance_field(occ, cap=cap)


def build_fused_tables(grid: np.ndarray, flags: np.ndarray) -> FusedTables:
    """Dense material grid + palette flags -> FusedTables.

    Raises ValueError for unsupported worlds (caller falls back to the XLA
    fast path): dims not divisible by 8, or material ids > 13.
    """
    from ..core.types import Properties
    from .flatten import build_grid_enc

    grid = np.asarray(grid, np.uint8)
    Sx, Sy, Sz = grid.shape
    if Sx % BS or Sy % BS or Sz % BS:
        raise ValueError(f"grid shape {grid.shape} not divisible by {BS}")
    max_mat = int(grid.max(initial=0))
    if max_mat > 13:
        raise ValueError(f"material ids up to {max_mat} exceed the 4-bit budget")
    air0 = max_mat + 2  # >= 1 spare license code (air0 <= 15)

    Bx, By, Bz = Sx >> BRICK_SHIFT, Sy >> BRICK_SHIFT, Sz >> BRICK_SHIFT
    nb = Bx * By * Bz
    if nb > MAX_MULTI * 8:
        raise ValueError(f"{nb} bricks exceed the meta-table budget")

    # per-brick voxel rows, vox index (dx*8 + dy)*8 + dz
    g = grid.reshape(Bx, BS, By, BS, Bz, BS)
    rows = np.ascontiguousarray(g.transpose(0, 2, 4, 1, 3, 5)).reshape(nb, BS**3)

    occ = (rows > 0).any(axis=1)
    full = (rows > 0).all(axis=1)
    liquid_ids = (np.asarray(flags) & int(Properties.LIQUID)) > 0
    hard = (rows > 0) & ~liquid_ids[rows]
    occ_hard = hard.any(axis=1)

    nd = np.zeros(nb, np.int32)
    for m in range(1, max_mat + 1):
        nd += (rows == m).any(axis=1)
    uniform = occ & full & (nd == 1)
    masked = occ & ~full & (nd == 1)
    multi = occ & (nd >= 2)

    # 5-bit distance licenses at brick granularity
    d_pri = _chebyshev(occ.reshape(Bx, By, Bz), cap=DIST_CAP).reshape(nb)
    d_sh = _chebyshev(occ_hard.reshape(Bx, By, Bz), cap=DIST_CAP).reshape(nb)
    d_pri = np.minimum(d_pri, DIST_CAP).astype(np.uint16)
    d_sh = np.minimum(d_sh, DIST_CAP).astype(np.uint16)

    # slot assignment (masked overflow promotes to multi)
    masked_idx = np.nonzero(masked)[0]
    if masked_idx.shape[0] > MAX_MASKED:
        promote = masked_idx[MAX_MASKED:]
        masked[promote] = False
        multi[promote] = True
        masked_idx = masked_idx[:MAX_MASKED]
    multi_idx = np.nonzero(multi)[0]
    if multi_idx.shape[0] > MAX_MULTI:
        raise ValueError(f"{multi_idx.shape[0]} multi bricks exceed the slot budget")

    meta = np.zeros(nb, np.uint16)
    # AIR (class 0): primary + shadow licenses
    air_b = ~occ
    meta[air_b] = (d_pri[air_b] & 31) | ((d_sh[air_b] & 31) << 5)
    # UNIFORM (class 1): material + shadow license (liquid-only volumes)
    um = rows[uniform, 0].astype(np.uint16)
    meta[uniform] = (1 << 14) | um | ((d_sh[uniform] & 31) << 5)
    # MASKED (class 2): material + slot
    mm = rows[masked_idx].max(axis=1).astype(np.uint16)
    meta[masked_idx] = (
        (2 << 14) | mm | (np.arange(masked_idx.shape[0], dtype=np.uint16) << 4)
    )
    # MULTI (class 3): slot
    meta[multi_idx] = (3 << 14) | np.arange(multi_idx.shape[0], dtype=np.uint16)

    meta_bytes = np.zeros(nb * 2, np.uint8)
    meta_bytes[0::2] = (meta & 0xFF).astype(np.uint8)
    meta_bytes[1::2] = (meta >> 8).astype(np.uint8)

    # masked pool: 64 B occupancy rows (bit v of byte v>>3 = voxel v occupied)
    n_masked = masked_idx.shape[0]
    mask_bytes = np.zeros(max(n_masked, 1) * 64, np.uint8)
    if n_masked:
        bits = (rows[masked_idx] > 0).reshape(n_masked, 64, 8)
        mask_bytes[: n_masked * 64] = (
            (bits << np.arange(8, dtype=np.uint8)[None, None, :]).sum(axis=2)
        ).reshape(-1)

    # multi pool: 256 B nibble rows; air voxels carry global Chebyshev licenses
    n_multi = multi_idx.shape[0]
    multi_bytes = np.zeros(max(n_multi, 1) * 256, np.uint8)
    if n_multi:
        codes = rows[multi_idx].astype(np.uint8)  # material ids as-is
        if air0 <= 15:
            enc = build_grid_enc(grid)  # air cells: 128 + d (d in 1,2,4,...)
            encb = enc.reshape(Bx, BS, By, BS, Bz, BS)
            enc_rows = np.ascontiguousarray(
                encb.transpose(0, 2, 4, 1, 3, 5)
            ).reshape(nb, BS**3)[multi_idx]
            air_v = codes == 0
            r = np.minimum(enc_rows.astype(np.int32) - 128 - 1, 15 - air0)
            lic = air_v & (r >= 1)
            codes[lic] = (air0 + r[lic] - 1).astype(np.uint8)
        nib = codes.reshape(n_multi, 256, 2)
        multi_bytes[: n_multi * 256] = (nib[:, :, 0] | (nib[:, :, 1] << 4)).reshape(-1)

    return FusedTables(
        meta=_pad_rows(meta_bytes),
        mask=_pad_rows(mask_bytes),
        multi=_pad_rows(multi_bytes),
        air0=int(air0),
        bgrid=(Bx, By, Bz),
        shape3=(Sx, Sy, Sz),
        n_masked=int(n_masked),
        n_multi=int(n_multi),
    )
