"""Terrain recipe parity vs the reference world_gen.cpp (golden heights dumped
by running the reference noise + recipe), and dense-grid column semantics."""

import numpy as np

from raytracing_test_tpu.config import WorldConfig
from raytracing_test_tpu.worldgen import terrain

GOLD = np.load("tests/golden/terrain_heights_golden.npz")["heights"]


def test_heightmap_matches_reference():
    h = terrain.heightmap(WorldConfig())
    np.testing.assert_array_equal(h, GOLD)


def test_column_structure():
    cfg = WorldConfig(grid_shape=(256, 64, 256), include_init_blocks=False)
    grid, pal = terrain.gen_world_grid(cfg)
    h = terrain.heightmap(cfg)
    grass = pal.id_for(terrain.GRASS)
    dirt = pal.id_for(terrain.DIRT)
    stone = pal.id_for(terrain.STONE)
    water = pal.id_for(terrain.WATER)

    # dry column: grass surface, 3 dirt, stone below, nothing above, y=0 empty
    xs, zs = np.nonzero(GOLD >= 20)
    x, z = int(xs[0]), int(zs[0])
    hh = int(h[x, z])
    assert grid[x, hh, z] == grass
    assert all(grid[x, hh - i, z] == dirt for i in (1, 2, 3))
    assert grid[x, hh - 4, z] == stone
    assert grid[x, 0, z] == 0
    assert np.all(grid[x, hh + 1 :, z] == 0)

    # wet column: water down to h+1, dirt surface
    xs, zs = np.nonzero(GOLD < 20)
    assert len(xs) > 0, "reference world has water"
    x, z = int(xs[0]), int(zs[0])
    hh = int(h[x, z])
    assert grid[x, hh, z] == dirt
    assert np.all(grid[x, hh + 1 : cfg.water_level + 1, z] == water)
    assert np.all(grid[x, cfg.water_level + 1 :, z] == 0)


def test_init_blocks_stamped():
    cfg = WorldConfig()
    grid, pal = terrain.gen_world_grid(cfg)
    # (10,100,10) is REFLECTIVE flags=2 (above terrain, not overwritten)
    m = grid[10, 100, 10]
    assert m != 0
    assert int(pal.flags[m]) & 0x2
    # smoke block at (20,10,200) level 5 covers a 4^3 region from (20,8,200)
    m2 = grid[20, 8, 200]
    assert m2 != 0 and int(pal.flags[m2]) & 0x4


def test_tree_view_matches_grid():
    cfg = WorldConfig(width=40, length=40, grid_shape=(64, 64, 64), include_init_blocks=False)
    grid, pal = terrain.gen_world_grid(cfg)
    tree = terrain.gen_world_tree(cfg, grid, pal)
    rng = np.random.default_rng(1)
    for _ in range(200):
        x, y, z = (int(v) for v in rng.integers(0, 64, 3))
        blk = tree.get_block((x, y, z))
        mid = grid[x, y, z]
        if mid == 0:
            assert blk.is_air
        else:
            assert blk.color == int(pal.color[mid])
            assert blk.flags == int(pal.flags[mid]) | 1
