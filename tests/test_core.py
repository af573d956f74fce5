"""Color packing, morton codes, and the host-side sparse tree."""

import numpy as np
import pytest

from raytracing_test_tpu.core import color
from raytracing_test_tpu.core.tree import Palette, VoxelTree
from raytracing_test_tpu.core.types import AIR_COLOR, Block, Properties
from raytracing_test_tpu.ops import morton


# ------------------------------------------------------------------- color

def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (100, 3))
    for r, g, b in rgb:
        packed = color.rgb_to_u64(int(r), int(g), int(b))
        out = color.u64_to_unit_f32(packed)
        np.testing.assert_allclose(out, [r / 255, g / 255, b / 255], atol=2e-3)


def test_pack_reference_values():
    # convertScale(255) = trunc(255/255 * (2^21-1)) = 2^21-1
    assert color.rgb_to_u64(255, 255, 255) == np.uint64(
        ((2**21 - 1) << 42) | ((2**21 - 1) << 21) | (2**21 - 1)
    )
    assert color.rgb_to_u64(0, 0, 0) == np.uint64(0)
    # unpack divides by 2^21 (COLOR_RANGE), not the mask
    w = color.u64_to_unit_f32(color.rgb_to_u64(255, 255, 255))
    np.testing.assert_allclose(w, (2**21 - 1) / 2**21, rtol=1e-6)


# ------------------------------------------------------------------- morton

def _interleave_ref(x, y, z):
    out = 0
    for k in range(5):  # five 2-bit digits per axis
        dx = (x >> (2 * k)) & 3
        dy = (y >> (2 * k)) & 3
        dz = (z >> (2 * k)) & 3
        out |= (dz << 4 | dy << 2 | dx) << (6 * k)
    return out


def test_morton_encode_matches_digit_interleave():
    rng = np.random.default_rng(1)
    for _ in range(100):
        x, y, z = (int(v) for v in rng.integers(0, 1024, 3))
        assert morton.morton_encode(x, y, z) == _interleave_ref(x, y, z)


def test_child_index_consistency():
    x, y, z = 123, 456, 789
    code = morton.morton_encode(x, y, z)
    digits = morton.morton_digits(code)
    for depth in range(5):
        assert digits[depth] == morton.child_index(x, y, z, depth)


# --------------------------------------------------------------------- tree

RED = Block(0, int(color.rgb_to_u64(255, 0, 0)))
GREEN = Block(0, int(color.rgb_to_u64(0, 255, 0)))
MIRROR = Block(int(Properties.REFLECTIVE), int(color.rgb_to_u64(255, 255, 255)), 0.94)


def test_put_get_unit():
    t = VoxelTree()
    t.put_block((5, 6, 7), RED, 6)
    b = t.get_block((5, 6, 7))
    assert b.color == RED.color and b.flags == RED.flags | 1
    assert t.get_block((5, 6, 8)).is_air
    assert t.get_block((4, 6, 7)).is_air


def test_multires_leaf_covers_region():
    t = VoxelTree()
    t.put_block((100, 20, 40), GREEN, 5)  # covers the aligned 4^3 region
    base = (100 & ~3, 20 & ~3, 40 & ~3)
    for d in ((0, 0, 0), (3, 3, 3), (1, 2, 0)):
        assert t.get_block(tuple(b + o for b, o in zip(base, d))).color == GREEN.color
    assert t.get_block((base[0] + 4, base[1], base[2])).is_air


def test_put_unit_inside_multires_splits():
    t = VoxelTree()
    t.put_block((64, 64, 64), GREEN, 4)  # 16^3 region
    t.put_block((65, 65, 65), RED, 6)  # overwrite one voxel inside it
    assert t.get_block((65, 65, 65)).color == RED.color
    assert t.get_block((64, 64, 64)).color == GREEN.color
    assert t.get_block((79, 79, 79)).color == GREEN.color


def test_overwrite_coarse_collapses_children():
    t = VoxelTree()
    for i in range(4):
        t.put_block((i, 0, 0), RED, 6)
    n_before = t.num_nodes
    t.put_block((0, 0, 0), GREEN, 4)  # coarse overwrite deletes the fine leaves
    assert t.get_block((3, 0, 0)).color == GREEN.color
    assert t.num_nodes <= n_before


def test_delete_block():
    t = VoxelTree()
    t.put_block((10, 10, 10), RED, 6)
    prev = t.delete_block((10, 10, 10), 6)
    assert prev.color == RED.color
    assert t.get_block((10, 10, 10)).is_air
    # deleting air is a no-op returning AIR
    assert t.delete_block((10, 10, 10), 6).is_air


def test_delete_inside_multires_splits():
    t = VoxelTree()
    t.put_block((8, 8, 8), GREEN, 5)
    t.delete_block((9, 9, 9), 6)
    assert t.get_block((9, 9, 9)).is_air
    assert t.get_block((8, 8, 8)).color == GREEN.color
    assert t.get_block((10, 10, 10)).color == GREEN.color


def test_vs_brute_force_random_ops():
    rng = np.random.default_rng(7)
    t = VoxelTree()
    dense = {}
    blocks = [RED, GREEN, MIRROR]
    for _ in range(300):
        op = rng.integers(0, 3)
        pos = tuple(int(v) for v in rng.integers(0, 32, 3))
        if op == 0:
            blk = blocks[int(rng.integers(0, 3))]
            t.put_block(pos, blk, 6)
            dense[pos] = blk
        elif op == 1:
            t.delete_block(pos, 6)
            dense.pop(pos, None)
        else:
            got = t.get_block(pos)
            want = dense.get(pos)
            if want is None:
                assert got.is_air
            else:
                assert got.color == want.color and got.flags == want.flags | 1


def test_from_dense_to_dense_roundtrip():
    rng = np.random.default_rng(3)
    pal = Palette()
    ids = [pal.id_for(b) for b in (RED, GREEN, MIRROR)]
    grid = np.zeros((16, 16, 16), np.uint8)
    # random sparse content + a solid uniform slab (tests leaf collapsing)
    pts = rng.integers(0, 16, (50, 3))
    for p in pts:
        grid[tuple(p)] = ids[int(rng.integers(0, 3))]
    grid[0:4, 0:4, 0:4] = ids[0]
    tree = VoxelTree.from_dense(grid, pal)
    flags, col, meta = tree.to_dense(16)
    for x in range(16):
        for y in range(16):
            for z in range(16):
                mid = grid[x, y, z]
                if mid == 0:
                    assert col[x, y, z] == AIR_COLOR
                else:
                    assert col[x, y, z] == int(pal.color[mid])


def test_wrap_addressing():
    t = VoxelTree()
    t.put_block((1023, 0, 0), RED, 6)
    assert t.get_block((-1, 0, 0)).color == RED.color  # -1 & 1023 == 1023


def test_dirty_bricks_tracked():
    t = VoxelTree()
    t.dirty_bricks.clear()
    t.put_block((9, 9, 9), RED, 6)
    assert (1, 1, 1) in t.dirty_bricks


def test_from_dense_non_cubic():
    """from_dense pads non-cubic grids with air (the CLI's default world
    window is 256x128x256; the python twin must accept it like the native
    runtime does)."""
    from raytracing_test_tpu.core.color import rgb_to_u64
    from raytracing_test_tpu.core.tree import Palette, VoxelTree
    from raytracing_test_tpu.core.types import Block

    pal = Palette()
    m = pal.id_for(Block(0, int(rgb_to_u64(10, 20, 30))))
    grid = np.zeros((16, 4, 8), np.uint16)
    grid[3, 2, 5] = m
    grid[0:4, 0:4, 0:4] = m  # a uniform 4^3 region -> multi-res leaf
    t = VoxelTree.from_dense(grid, pal)
    assert not t.get_block((3, 2, 5)).is_air
    assert not t.get_block((1, 1, 1)).is_air
    assert t.get_block((8, 3, 7)).is_air
    assert t.get_block((15, 3, 7)).is_air


def test_palette_overflow_degrades_gracefully():
    """Beyond 127 distinct materials the palette merges new blocks into the
    nearest same-flags material instead of raising (grid_enc reserves ids >=
    128 for air distances) — a long edit session keeps working."""
    from raytracing_test_tpu.core.color import rgb_to_u64, u64_to_unit_f32
    from raytracing_test_tpu.core.tree import Palette
    from raytracing_test_tpu.core.types import Block

    pal = Palette()
    for r in range(127):  # fill to the cap
        pal.id_for(Block(0, int(rgb_to_u64(r * 2, 0, 0))))
    assert len(pal) == 128
    # overflow: a reddish block must map to the nearest existing red
    i = pal.id_for(Block(0, int(rgb_to_u64(101, 0, 0))))
    assert 0 < i < 128
    got = u64_to_unit_f32(pal.color[i : i + 1])[0]
    assert abs(got[0] - 100 / 255) < 2 / 255 or abs(got[0] - 102 / 255) < 2 / 255
    # repeated lookups are stable
    assert pal.id_for(Block(0, int(rgb_to_u64(101, 0, 0)))) == i
