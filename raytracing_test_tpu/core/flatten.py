"""Flattening: host world -> device-resident render structure.

The reference mirrors its pointer-free node pools into GPU SSBOs with per-slab
dirty tracking (voxel_allocator.hpp:38-78) and the shader walks the tree per
pixel per step (low_res.frag:493-532). That per-ray pointer-chasing descent is
the worst possible shape for a TPU's vector units, so the device structure here
is gather-friendly instead:

  - ``mat``: dense uint8 material-id grid over a window of the 1024^3 address
    space (0 = air). One dynamic gather per ray per DDA step.
  - palette arrays (``albedo`` f32[P,3], ``flags`` i32[P], ``metadata`` f32[P]):
    tiny tables, gathered only when resolving hits.
  - ``macro``: occupancy of 4^3 cells (uint8), the analog of the reference
    tree's branch bitmaps (empty-space skip, low_res.frag:520-524), small enough
    to live in VMEM for the Pallas kernel and used for hierarchical DDA skips.

Semantic equivalence: the dense grid is exactly the rasterization of the sparse
tree over the window (multi-res leaves expand to their covered voxels); lookups
wrap coordinates with & 1023 like the reference's bit-digest addressing, and
anything outside the window is air.

Incremental mirroring: edits mark 8^3 bricks dirty in the host tree; ``apply_
dirty`` scatters just those bricks into the device arrays — the analog of the
reference's dirty-slab glBufferSubData upload.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .color import u64_to_unit_f32
from .tree import Palette, VoxelTree
from .types import WORLD_MASK

MACRO_SHIFT = 2  # macro cells are 4^3 voxels
BRICK_SHIFT = 3  # host dirty tracking granularity, 8^3


class Scene(NamedTuple):
    """Device-resident render scene. All fields are arrays (jit-friendly pytree).

    The grid window is anchored at the address-space origin; its extent is the
    (static) array shape. Alongside the raw material grid it carries the
    render-time acceleration structure used by render/fast.py:

      - ``brick_rows``: per 4^3 brick, the 64 voxel payloads (mat | flags<<8) as
        one gatherable row — fetching a whole brick costs one descriptor, ~3x
        cheaper per byte than scalar gathers on TPU.
      - ``brick_dist``: per-brick Chebyshev distance to the nearest occupied
        brick (4-bit, nibble-packed into u32 words stored as exact byte planes
        for the MXU one-hot lookup, ops/mxu_lookup.py). Distance 0 = occupied;
        d >= 1 licenses a one-shot jump through the (2d-1)^3-brick empty box —
        the hierarchical generalization of the reference tree's bitmap
        empty-space skip (low_res.frag:520-524).
      - ``y_max``: one above the highest solid voxel; everything above is
        provably air, enabling analytic sky skips.
    """

    mat: jax.Array  # uint8 [Sx, Sy, Sz] material ids, 0 = air
    macro: jax.Array  # uint8 [Sx/4, Sy/4, Sz/4] occupancy of 4^3 cells
    albedo: jax.Array  # f32 [P, 3] canonical unpacked color (color.py)
    flags: jax.Array  # i32 [P] property bitfields (leaf bit included)
    metadata: jax.Array  # f32 [P]
    brick_rows: jax.Array  # i32 [B, 64]: mat | flags<<8 per voxel, offset
    # layout ((x&3)<<4 | (y&3)<<2 | (z&3)); B = (Sx/4)(Sy/4)(Sz/4)
    brick_dist: jax.Array  # f32 [W, 4] nibble-packed brick distance field
    y_max: jax.Array  # i32 scalar: max solid y + 1

    @property
    def shape3(self) -> Tuple[int, int, int]:
        return self.mat.shape

    @property
    def brick_dims(self) -> Tuple[int, int, int]:
        Sx, Sy, Sz = self.mat.shape
        return Sx // 4, Sy // 4, Sz // 4


def build_macro(grid: np.ndarray) -> np.ndarray:
    """Occupancy of each 4^3 cell of the grid."""
    s = 1 << MACRO_SHIFT
    Sx, Sy, Sz = grid.shape
    g = grid.reshape(Sx // s, s, Sy // s, s, Sz // s, s)
    return (g.max(axis=(1, 3, 5)) > 0).astype(np.uint8)


def palette_arrays(pal: Palette, pad_to: int = 8):
    """Palette -> (albedo f32[P,3], flags i32[P], metadata f32[P]) numpy arrays."""
    n = max(len(pal), 1)
    P = max(pad_to, int(2 ** np.ceil(np.log2(n))))
    albedo = np.zeros((P, 3), dtype=np.float32)
    flags = np.zeros(P, dtype=np.int32)
    meta = np.zeros(P, dtype=np.float32)
    albedo[:n] = u64_to_unit_f32(pal.color)
    albedo[0] = 0.0  # air's sentinel color must not leak into shading
    flags[:n] = pal.flags
    flags[0] = 0
    meta[:n] = pal.metadata
    return albedo, flags, meta


def build_bricks(grid: np.ndarray, flags_tab: np.ndarray):
    """Dense grid -> (brick_rows i32[B,64], dist byte planes f32[W,4], y_max).

    Brick = 4^3, row offset layout (x&3)<<4 | (y&3)<<2 | (z&3); payload is
    mat | flags<<8. The 4-bit Chebyshev brick-distance field is nibble-packed
    little-endian over the brick linearization (bx*NBy + by)*NBz + bz.
    """
    from ..ops.mxu_lookup import (
        chebyshev_distance_field,
        pack_nibbles,
        pack_words_to_bytes_f32,
    )

    Sx, Sy, Sz = grid.shape
    assert Sx % 4 == Sy % 4 == Sz % 4 == 0, grid.shape
    nbx, nby, nbz = Sx // 4, Sy // 4, Sz // 4
    assert nbx * nby * nbz <= 131072, (
        "brick distance field exceeds the 16384-word MXU lookup table; use a "
        "smaller window or spatial sharding (parallel/spatial.py)"
    )
    g = (
        grid.reshape(nbx, 4, nby, 4, nbz, 4)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nbx * nby * nbz, 64)
    )
    rows = g.astype(np.int32) | (np.asarray(flags_tab, np.int32)[g] << 8)
    occupied = (g > 0).any(axis=1).reshape(nbx, nby, nbz)
    dist = chebyshev_distance_field(occupied)
    words = pack_nibbles(dist.reshape(-1))
    pad = 4096 if len(words) <= 4096 else 16384
    dist_planes = pack_words_to_bytes_f32(words, pad_to=pad)
    solid_y = np.nonzero(grid.any(axis=(0, 2)))[0]
    y_max = int(solid_y.max()) + 1 if len(solid_y) else 0
    return rows, dist_planes, np.int32(y_max)


def scene_from_grid(grid: np.ndarray, pal: Palette, device=None) -> Scene:
    """Build the device Scene from a dense material grid + palette."""
    albedo, flags, meta = palette_arrays(pal)
    rows, occ, y_max = build_bricks(grid, flags)
    put = (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray
    return Scene(
        mat=put(grid),
        macro=put(build_macro(grid)),
        albedo=put(albedo),
        flags=put(flags),
        metadata=put(meta),
        brick_rows=put(rows),
        brick_dist=put(occ),
        y_max=put(y_max),
    )


def scene_from_tree(tree: VoxelTree, pal: Palette, grid_shape, device=None) -> Scene:
    """Rasterize a tree window and build the Scene (full flatten)."""
    grid = rasterize_tree(tree, pal, grid_shape)
    return scene_from_grid(grid, pal, device)


def rasterize_tree(tree: VoxelTree, pal: Palette, grid_shape) -> np.ndarray:
    """Tree -> dense material-id grid over the window [0, shape)."""
    from .types import Block

    ext = max(grid_shape)
    flags, color, meta = tree.to_dense(ext)
    grid = np.zeros((ext,) * 3, dtype=np.uint8)
    solid = (flags & 1) == 1
    if solid.any():
        # dedupe (flags, color, meta) triples before the python palette loop
        f, c, m = flags[solid], color[solid], meta[solid]
        triples = np.stack([f.astype(np.int64), c.astype(np.int64), m.view(np.int32).astype(np.int64)], -1)
        uniq, inv = np.unique(triples, axis=0, return_inverse=True)
        uniq_ids = np.array(
            [
                pal.id_for(Block(int(uf), int(np.uint64(uc)), float(np.int32(um).view(np.float32))))
                for uf, uc, um in uniq
            ],
            dtype=np.uint8,
        )
        grid[solid] = uniq_ids[inv]
    return grid[: grid_shape[0], : grid_shape[1], : grid_shape[2]]


def apply_dirty(
    scene: Scene,
    tree: VoxelTree,
    pal: Palette,
    bricks: Sequence[Tuple[int, int, int]],
) -> Scene:
    """Incremental device update: re-rasterize only the dirty 8^3 bricks.

    The analog of updateSsboData's dirty-slab glBufferSubData path
    (voxel_allocator.hpp:38-78). Returns a new Scene (functional update); the
    palette tables are refreshed wholesale (they are tiny).
    """
    if not bricks:
        return scene
    mat = np.asarray(scene.mat).copy()
    Sx, Sy, Sz = mat.shape
    bs = 1 << BRICK_SHIFT
    from .types import Block  # local import to avoid cycle at module load

    for bx, by, bz in bricks:
        x0, y0, z0 = bx << BRICK_SHIFT, by << BRICK_SHIFT, bz << BRICK_SHIFT
        if x0 >= Sx or y0 >= Sy or z0 >= Sz or x0 < 0 or y0 < 0 or z0 < 0:
            continue
        for dx in range(min(bs, Sx - x0)):
            for dy in range(min(bs, Sy - y0)):
                for dz in range(min(bs, Sz - z0)):
                    blk = tree.get_block((x0 + dx, y0 + dy, z0 + dz))
                    mat[x0 + dx, y0 + dy, z0 + dz] = pal.id_for(blk) if not blk.is_air else 0
    albedo, flags, meta = palette_arrays(pal)
    rows, occ, y_max = build_bricks(mat, flags)
    return Scene(
        mat=jnp.asarray(mat),
        macro=jnp.asarray(build_macro(mat)),
        albedo=jnp.asarray(albedo),
        flags=jnp.asarray(flags),
        metadata=jnp.asarray(meta),
        brick_rows=jnp.asarray(rows),
        brick_dist=jnp.asarray(occ),
        y_max=jnp.asarray(y_max),
    )


def lookup_material(scene: Scene, x, y, z):
    """Vectorized material lookup at integer voxel coords (any int arrays).

    Coordinates wrap with & 1023 (the reference's address-digest behavior,
    tetrahexa_tree.cpp:127); anything outside the grid window is air (0).
    """
    Sx, Sy, Sz = scene.shape3
    xm = x & WORLD_MASK
    ym = y & WORLD_MASK
    zm = z & WORLD_MASK
    inside = (xm < Sx) & (ym < Sy) & (zm < Sz)
    xc = jnp.where(inside, xm, 0)
    yc = jnp.where(inside, ym, 0)
    zc = jnp.where(inside, zm, 0)
    m = scene.mat[xc, yc, zc]
    return jnp.where(inside, m, 0).astype(jnp.int32)
