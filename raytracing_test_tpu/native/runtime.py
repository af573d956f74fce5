"""ctypes bindings for the native C++ voxel runtime.

Compiles native/src/voxel_runtime.cpp into a shared library on first use
(g++ -O2 -shared -fPIC) and exposes ``NativeVoxelTree`` with the same API as
the pure-python ``core.tree.VoxelTree``. Falls back cleanly if no compiler is
available (``is_available()`` -> False); callers then use the python twin.

The native path is the production host runtime: the reference's worldgen is a
~2M-insertion putBlock storm (world_gen.cpp:19-40), which runs in milliseconds
here versus tens of seconds in python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from ..core.types import AIR, Block

_SRC = os.path.join(os.path.dirname(__file__), "src", "voxel_runtime.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_voxel_runtime.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler / hang
        return str(e)
    if r.returncode != 0:
        return r.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vt_create.restype = ctypes.c_void_p
        lib.vt_destroy.argtypes = [ctypes.c_void_p]
        lib.vt_put_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint32, ctypes.c_uint64, ctypes.c_float, ctypes.c_int,
        ]
        lib.vt_get_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u32p, u64p, f32p,
        ]
        lib.vt_get_block.restype = ctypes.c_int
        lib.vt_delete_block.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
        lib.vt_delete_block.restype = ctypes.c_int
        lib.vt_num_nodes.argtypes = [ctypes.c_void_p]
        lib.vt_num_nodes.restype = ctypes.c_int
        lib.vt_export_dense.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u32p, u64p, f32p,
        ]
        lib.vt_export_dense.restype = ctypes.c_int
        lib.vt_dirty_count.argtypes = [ctypes.c_void_p]
        lib.vt_dirty_count.restype = ctypes.c_int
        lib.vt_get_dirty.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        lib.vt_clear_dirty.argtypes = [ctypes.c_void_p]
        lib.vt_noise2.argtypes = [ctypes.c_int64, ctypes.c_double, ctypes.c_double]
        lib.vt_noise2.restype = ctypes.c_double
        lib.vt_gen_world.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint32,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def noise2(seed: int, x: float, y: float) -> float:
    """Seed-exact OpenSimplex 2D eval from the native runtime."""
    lib = _load()
    assert lib is not None
    return lib.vt_noise2(seed, x, y)


class NativeVoxelTree:
    """Native-backed sparse voxel tree; API-compatible with core.tree.VoxelTree."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native runtime unavailable: {_build_error}")
        self._lib = lib
        self._t = lib.vt_create()

    def __del__(self):
        if getattr(self, "_t", None):
            self._lib.vt_destroy(self._t)
            self._t = None

    def put_block(self, pos, block: Block, level: int = 6) -> None:
        x, y, z = (int(v) for v in pos)
        self._lib.vt_put_block(
            self._t, x, y, z,
            ctypes.c_uint32(block.flags & 0xFFFFFFFF),
            ctypes.c_uint64(block.color & (2**64 - 1)),
            float(block.metadata), level,
        )

    def get_block(self, pos) -> Block:
        x, y, z = (int(v) for v in pos)
        f = ctypes.c_uint32()
        c = ctypes.c_uint64()
        m = ctypes.c_float()
        if self._lib.vt_get_block(self._t, x, y, z, ctypes.byref(f), ctypes.byref(c), ctypes.byref(m)):
            return Block(int(f.value), int(c.value), float(m.value))
        return AIR

    def delete_block(self, pos, level: int = 6) -> Block:
        prev = self.get_block(pos)
        self._lib.vt_delete_block(self._t, int(pos[0]), int(pos[1]), int(pos[2]), level)
        return prev

    @property
    def num_nodes(self) -> int:
        return self._lib.vt_num_nodes(self._t)

    # ------------------------------------------------------------ worldgen

    def gen_world(self, cfg) -> None:
        """Run the reference terrain recipe natively (per-voxel putBlock storm)."""
        from ..core.color import rgb_to_u64
        from ..core.types import Properties
        from ..worldgen.terrain import INIT_BLOCKS

        if cfg.include_init_blocks:
            for pos, blk, level in INIT_BLOCKS:
                self.put_block(pos, blk, level)
        self._lib.vt_gen_world(
            self._t, cfg.width, cfg.length,
            cfg.seeds[0], cfg.seeds[1], cfg.seeds[2],
            cfg.base_height, cfg.water_level,
            ctypes.c_uint64(int(rgb_to_u64(0, 150, 10))),
            ctypes.c_uint64(int(rgb_to_u64(45, 18, 0))),
            ctypes.c_uint64(int(rgb_to_u64(33, 33, 33))),
            ctypes.c_uint64(int(rgb_to_u64(0, 150, 10))),
            ctypes.c_uint32(int(Properties.REFRACTIVE | Properties.LIQUID)),
        )

    # ------------------------------------------------------------- flatten

    def export_dense(self, shape, max_palette: int = 256):
        """Rasterize to (grid u8[shape], pal_flags, pal_color, pal_meta)."""
        sx, sy, sz = shape
        grid = np.zeros((sx, sy, sz), dtype=np.uint8)
        pf = np.zeros(max_palette, dtype=np.uint32)
        pc = np.zeros(max_palette, dtype=np.uint64)
        pm = np.zeros(max_palette, dtype=np.float32)
        n = self._lib.vt_export_dense(
            self._t,
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sx, sy, sz, max_palette,
            pf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            pc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n < 0:
            raise RuntimeError(
                "palette overflow during dense export (>256 distinct blocks "
                "in the native tree); the python palette path degrades "
                "gracefully by nearest-color merging (core/tree.Palette) — "
                "rebuild the session with use_native=False for huge palettes"
            )
        return grid, pf[:n], pc[:n], pm[:n]

    def dirty_bricks(self) -> List[Tuple[int, int, int]]:
        n = self._lib.vt_dirty_count(self._t)
        buf = np.zeros(3 * n, dtype=np.int32)
        if n:
            self._lib.vt_get_dirty(self._t, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return [tuple(buf[3 * i : 3 * i + 3]) for i in range(n)]

    def clear_dirty(self) -> None:
        self._lib.vt_clear_dirty(self._t)
