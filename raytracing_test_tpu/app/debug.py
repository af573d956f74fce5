"""Debug output channels + pixel probe.

The reference's debug-frame system renders one of ~10 internal per-pixel
quantities instead of color and reads the pixel under the mouse back with
glReadPixels (main.cpp:21-43, low_res.frag:335-341). Here the renderer simply
returns its internals as named arrays (aux dict), so any channel is a render
away and probing is an index.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..config import RenderConfig
from ..core.flatten import Scene
from ..render import renderer
from ..render.camera import Camera, ray_directions

# the reference's channel names (main.cpp:21-33), mapped to aux keys
CHANNELS = {
    "hit_pos": "hit_pos",  # "ray hit pos"
    "steps": "steps",
    "cell": "cell",
    "normal": "normal",
    "mat": "mat",
    "hit": "hit",
    "last_axis": "last_axis",
    "reflected": "reflected",
}


def render_debug(
    scene: Scene, camera: Camera, cfg: RenderConfig
) -> Dict[str, np.ndarray]:
    """Render all debug channels as [H, W, ...] arrays."""
    dirs = ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees)
    col, aux = renderer.render_rays(scene, camera.pos, dirs, cfg)
    out = {"color": np.asarray(col).reshape(cfg.height, cfg.width, 3)}
    for name, key in CHANNELS.items():
        a = np.asarray(aux[key])
        out[name] = a.reshape((cfg.height, cfg.width) + a.shape[1:])
    return out


def probe_pixel(channels: Dict[str, np.ndarray], row: int, col: int) -> Dict[str, object]:
    """The dumpPixelData analog (main.cpp:35-43): every channel at one pixel."""
    return {name: np.asarray(arr[row, col]).tolist() for name, arr in channels.items()}
