"""Native C++ runtime vs the pure-python twin (tree semantics, noise parity,
worldgen equivalence, dense export)."""

import numpy as np
import pytest

from raytracing_test_tpu.config import WorldConfig
from raytracing_test_tpu.core.color import rgb_to_u64
from raytracing_test_tpu.core.tree import VoxelTree
from raytracing_test_tpu.core.types import Block, Properties
from raytracing_test_tpu.native import runtime as native
from raytracing_test_tpu.worldgen import terrain
from raytracing_test_tpu.worldgen.opensimplex import OpenSimplex2D

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason=f"native build failed: {native.build_error()}"
)

RED = Block(0, int(rgb_to_u64(200, 0, 0)))
GREEN = Block(0, int(rgb_to_u64(0, 200, 0)))
MIRROR = Block(int(Properties.REFLECTIVE), int(rgb_to_u64(255, 255, 255)), 0.94)


def test_noise_matches_python():
    rng = np.random.default_rng(0)
    for seed in (42, 64, 100, 12345):
        py = OpenSimplex2D(seed)
        for _ in range(50):
            x, y = rng.uniform(-50, 50, 2)
            assert native.noise2(seed, x, y) == pytest.approx(py.eval(x, y), abs=1e-15)


def test_tree_random_ops_match_python():
    rng = np.random.default_rng(3)
    nt = native.NativeVoxelTree()
    pt = VoxelTree()
    blocks = [RED, GREEN, MIRROR]
    for _ in range(500):
        op = rng.integers(0, 3)
        pos = tuple(int(v) for v in rng.integers(0, 64, 3))
        lvl = int(rng.choice([5, 6, 6, 6]))
        if op == 0:
            b = blocks[int(rng.integers(0, 3))]
            nt.put_block(pos, b, lvl)
            pt.put_block(pos, b, lvl)
        elif op == 1:
            nt.delete_block(pos, lvl)
            pt.delete_block(pos, lvl)
        else:
            a, b = nt.get_block(pos), pt.get_block(pos)
            assert a == b, (pos, a, b)
    # full sweep at the end
    for _ in range(300):
        pos = tuple(int(v) for v in rng.integers(0, 64, 3))
        assert nt.get_block(pos) == pt.get_block(pos)


def test_native_worldgen_matches_python_grid():
    cfg = WorldConfig(width=64, length=64, grid_shape=(64, 64, 64))
    py_grid, py_pal = terrain.gen_world_grid(cfg)

    nt = native.NativeVoxelTree()
    nt.gen_world(cfg)
    grid, pf, pc, pm = nt.export_dense(cfg.grid_shape)

    # same occupancy
    np.testing.assert_array_equal(grid > 0, py_grid > 0)
    # same materials voxel-by-voxel (palette ids may be permuted)
    for _ in range(500):
        rng = np.random.default_rng(7)
        xs = rng.integers(0, 64, (500, 3))
        for x, y, z in xs:
            a = grid[x, y, z]
            b = py_grid[x, y, z]
            if b == 0:
                assert a == 0
            else:
                assert pc[a] == np.uint64(py_pal.color[b])
                assert pf[a] == np.uint32(int(py_pal.flags[b]) | 1)
        break


def test_dirty_tracking():
    nt = native.NativeVoxelTree()
    nt.clear_dirty()
    nt.put_block((9, 9, 9), RED, 6)
    assert (1, 1, 1) in nt.dirty_bricks()
    nt.clear_dirty()
    assert nt.dirty_bricks() == []


def test_native_worldgen_speed():
    import time

    cfg = WorldConfig()  # the full 200x200 reference world
    nt = native.NativeVoxelTree()
    t0 = time.perf_counter()
    nt.gen_world(cfg)
    dt = time.perf_counter() - t0
    assert nt.num_nodes > 10000
    assert dt < 5.0, f"native worldgen too slow: {dt:.2f}s"
