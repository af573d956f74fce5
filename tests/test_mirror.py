"""Incremental device mirroring (core/mirror.py): the incrementally-updated
Scene must equal a from-scratch rebuild field-for-field, and the per-edit
host work must be local (box-sized), not O(world)."""

import time

import numpy as np
import pytest

from raytracing_test_tpu.config import RenderConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.core.mirror import SceneMirror, y_brick_counts
from raytracing_test_tpu.core.types import Block
from raytracing_test_tpu.core.color import rgb_to_u64
from raytracing_test_tpu.worldgen import terrain


def _assert_scene_equal(a, b):
    for name in (
        "mat", "macro", "grid_enc", "brick_mat", "brick_dist",
        "brick_nib", "brick_nib_shadow", "albedo", "flags", "metadata",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
        )
    assert int(a.y_max) == int(b.y_max)


def _edit(grid, mirror, pal, cells_and_mats):
    """Apply voxel edits to the host grid and sync incrementally."""
    bricks = sorted({(x >> 3, y >> 3, z >> 3) for (x, y, z), _ in cells_and_mats})
    old = {b: y_brick_counts(grid, b) for b in bricks}
    for (x, y, z), m in cells_and_mats:
        grid[x, y, z] = m
    return mirror.apply_bricks(bricks, old)


@pytest.mark.parametrize("shape", [(256, 128, 256), (64, 64, 64)])
def test_incremental_equals_full_rebuild(shape):
    wcfg = WorldConfig(width=min(shape[0], 96), length=min(shape[2], 96), grid_shape=shape)
    grid, pal = terrain.gen_world_grid(wcfg)
    mirror = SceneMirror(grid, pal)

    mid = int(pal.id_for(Block(0, int(rgb_to_u64(200, 30, 30)))))
    yt = shape[1] - 10  # tower height (new y_max!)
    # place a tower, punch a hole, edit at a window border
    edits = [
        [((40, yt, 40), mid), ((40, yt + 1, 40), mid)],
        [((40, int(grid[40, :, 41].nonzero()[0].max()), 41), 0)],
        [((shape[0] - 1, 5, shape[2] - 1), mid)],
        [((0, 3, 0), 0)],
    ]
    for batch in edits:
        scene = _edit(grid, mirror, pal, batch)
        full = flatten.scene_from_grid(grid, pal)
        _assert_scene_equal(scene, full)

    # deleting the tower must LOWER y_max again (exercise count maintenance)
    scene = _edit(grid, mirror, pal, [((40, yt, 40), 0), ((40, yt + 1, 40), 0)])
    full = flatten.scene_from_grid(grid, pal)
    _assert_scene_equal(scene, full)


def test_session_sync_incremental():
    from raytracing_test_tpu.app.session import WorldSession

    s = WorldSession(
        WorldConfig(width=48, length=48, grid_shape=(64, 64, 64)), use_native=False
    )
    s.pos = np.array([24.0, 45.0, 24.0])
    s.pitch = 60.0
    before = s.render(RenderConfig(width=24, height=24), highlight=False)
    placed = s.place(slot=0)
    assert placed is not None
    s.sync()
    full = flatten.scene_from_grid(s.grid, s.palette)
    _assert_scene_equal(s.scene, full)
    after = s.render(RenderConfig(width=24, height=24), highlight=False)
    assert np.abs(after - before).sum() > 0.01


def test_per_edit_host_work_is_local():
    """Host-side sync work must not scale with world size: time the numpy box
    recompute (device upload excluded — measured separately on hardware) at
    256^3-class vs 512-class windows."""
    times = {}
    for n, shape in ((128, (256, 128, 256)), (256, (512, 128, 512))):
        wcfg = WorldConfig(width=n, length=n, grid_shape=shape)
        grid, pal = terrain.gen_world_grid(wcfg)
        mirror = SceneMirror(grid, pal)
        mid = int(pal.id_for(Block(0, int(rgb_to_u64(1, 2, 3)))))
        _edit(grid, mirror, pal, [((40, 50, 40), mid)])  # warm the jit
        per = []
        for k in range(5):
            t0 = time.perf_counter()
            _edit(grid, mirror, pal, [((60 + k, 50, 60), mid)])
            per.append(time.perf_counter() - t0)
        times[shape[0]] = min(per)  # min: robust to host-load noise
    # 8x the voxels must not cost anywhere near 8x (allow 4x + slack for cache
    # effects, the tiny O(NB) nib-table rebuild, and shared-core timing noise)
    assert times[512] < times[256] * 4.0 + 0.1, times
