"""Camera model: projection-plane ray generation, bit-matching the reference.

Reference (src/shaders/low_res.frag:279-288 + main.cpp:94):

    ppl  = cross(cameraDir, (0,1,0))                 # NOT normalized
    dir  = normalize(cameraDir
                     + ppl * -(projX * (fx - 0.5))
                     + cross(cameraDir, ppl) * (0.5 - fy) * projY)

with projX = tan(fov/2), projY = tan(fov/2) * H / W, and (fx, fy) the GL
fragment coordinate (pixel center / resolution, y measured from the BOTTOM).
Note cross(cameraDir, ppl) points *down* for y-up cameraDir, and the unnormalized
plane basis bakes a pitch-dependent scale into the frustum — both reproduced
as-is for parity.

The camera pose is a pytree of arrays, so renders differentiate cleanly w.r.t.
position and direction (new capability vs the reference).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..config import CameraConfig, RenderConfig


class Camera(NamedTuple):
    pos: jnp.ndarray  # f32[3]
    dir: jnp.ndarray  # f32[3] — stored as given; the reference never normalizes
    # the uniform either (globals.cpp:20 ships (1,0,1))


def make_camera(cfg: CameraConfig) -> Camera:
    return Camera(
        pos=jnp.asarray(cfg.pos, dtype=jnp.float32),
        dir=jnp.asarray(cfg.dir, dtype=jnp.float32),
    )


def yaw_pitch_dir(yaw_deg: float, pitch_deg: float):
    """Camera direction from yaw/pitch in the REFERENCE convention
    (src/input.cpp:19-28): dir = (cos p * sin y, -sin p, cos p * cos y).
    The single source of truth — app.session.Session.camera_dir delegates here."""
    p = math.radians(pitch_deg)
    y = math.radians(yaw_deg)
    return (
        math.cos(p) * math.sin(y),
        -math.sin(p),
        math.cos(p) * math.cos(y),
    )


def camera_from_yaw_pitch(pos, yaw_deg: float, pitch_deg: float) -> Camera:
    """Build a camera from yaw/pitch angles like the input handler
    (ref: src/input.cpp:19-28 rotateCamera conventions)."""
    d = yaw_pitch_dir(yaw_deg, pitch_deg)
    return Camera(pos=jnp.asarray(pos, jnp.float32), dir=jnp.asarray(d, jnp.float32))


def ray_directions(camera: Camera, width: int, height: int, fov_degrees: float = 90.0):
    """Per-pixel normalized ray directions, shape [height*width, 3].

    Row 0 of the output image is the TOP of the screen (numpy convention); the
    reference's gl_FragCoord y runs bottom-up, so fy is flipped here.
    """
    proj_x = math.tan(math.radians(fov_degrees / 2.0))
    proj_y = proj_x * height / width

    d = camera.dir
    up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    ppl = jnp.cross(d, up)  # unnormalized, as in the shader
    ppd = jnp.cross(d, ppl)  # points down for y-up d

    row = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height  # top -> bottom
    col = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    fy = 1.0 - row  # GL bottom-up fragment coordinate
    fx = col

    # dir = d - ppl * projX*(fx-0.5) + ppd * (0.5-fy)*projY
    cx = -(proj_x * (fx - 0.5))  # [W]
    cy = (0.5 - fy) * proj_y  # [H]
    dirs = (
        d[None, None, :]
        + ppl[None, None, :] * cx[None, :, None]
        + ppd[None, None, :] * cy[:, None, None]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.reshape(height * width, 3)
