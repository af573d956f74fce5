"""Hemisphere sampling directions for AO / diffuse GI.

The reference generates a 20-point Fibonacci-spiral table offline
(gen_hemisphare_distrib.py: phi = arccos(1 - (i+0.5)*0.85/N), theta = pi*(1+5^.5)
*(i+0.5)) and hardcodes it in the GLSL pass (light_scattering.frag:133-154).
Here the same table is computed at import time, in y-up convention (the
generator's cos(phi) "up" axis mapped to y).

For differentiable rendering, ``sample_hemisphere`` also provides stochastic
cosine-weighted directions from a JAX PRNG key (reparameterized — gradients flow
through the frame rotation).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fibonacci_hemisphere(n: int = 20, cap: float = 0.85) -> np.ndarray:
    """The reference's spiral table, y-up: [n, 3] float32."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - i * cap / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    x = np.cos(theta) * np.sin(phi)
    z = np.sin(theta) * np.sin(phi)
    y = np.cos(phi)  # the "up" component
    return np.stack([x, y, z], axis=-1).astype(np.float32)


HEMISPHERE_DIRS_20 = fibonacci_hemisphere(20, 0.85)


def tangent_frame(normal):
    """Orthonormal frame with ``normal`` as its y-axis.

    The reference's computeTransformMat (light_scattering.frag:124-131) uses
    up=(0,1,0) and NaNs out for vertical normals; axis-aligned voxel normals are
    ALWAYS one of ±x/±y/±z, so we pick the fallback axis branchlessly.
    normal: f32[..., 3] -> (t1, t2) each f32[..., 3] with t1 x t2 = frame.
    """
    n = normal
    vertical = jnp.abs(n[..., 1:2]) > 0.9
    up = jnp.where(vertical, jnp.asarray([1.0, 0.0, 0.0], n.dtype), jnp.asarray([0.0, 1.0, 0.0], n.dtype))
    t1 = jnp.cross(up, n)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


def sample_hemisphere(key, normal, n: int):
    """Stochastic cosine-weighted hemisphere directions around per-point
    normals — the differentiable counterpart of the fixed Fibonacci table
    (reparameterized: gradients flow through the tangent frame / normal).

    normal: f32[N, 3]; returns f32[N, n, 3].
    """
    import jax

    N = normal.shape[0]
    u1, u2 = jax.random.split(key)
    e1 = jax.random.uniform(u1, (N, n))
    e2 = jax.random.uniform(u2, (N, n))
    r = jnp.sqrt(e1)
    phi = 2.0 * jnp.pi * e2
    x = r * jnp.cos(phi)
    z = r * jnp.sin(phi)
    y = jnp.sqrt(jnp.maximum(1.0 - e1, 0.0))  # cosine-weighted up component
    t1, t2 = tangent_frame(normal)
    return (
        x[..., None] * t1[:, None, :]
        + y[..., None] * normal[:, None, :]
        + z[..., None] * t2[:, None, :]
    )


def oriented_dirs(normal, table=None):
    """Rotate the hemisphere table into the frame of ``normal``.

    normal: f32[N, 3]; returns f32[N, K, 3] with dirs biased along the normal.
    """
    if table is None:
        table = jnp.asarray(HEMISPHERE_DIRS_20)
    t1, t2 = tangent_frame(normal)
    # world = x*t1 + y*n + z*t2
    return (
        table[None, :, 0:1] * t1[:, None, :]
        + table[None, :, 1:2] * normal[:, None, :]
        + table[None, :, 2:3] * t2[:, None, :]
    )
