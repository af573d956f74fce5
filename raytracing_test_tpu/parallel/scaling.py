"""Scaling-efficiency harness: rays/s vs device count.

Measures the ray-sharded forward render (and optionally the fwd+bwd fit step)
on meshes of 1..N devices and reports throughput + efficiency vs linear
scaling — the BASELINE "≥85% efficiency 1 host -> N hosts" metric. On a
multi-host slice run one process per host with jax.distributed initialized
(parallel/mesh.initialize_multihost); devices() then spans hosts and the same
code measures cross-host scaling over DCN.

Timing notes: inputs are perturbed per repetition because the axon backend
memoizes executions with identical inputs, and results are materialized to
defeat async laziness.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..core.flatten import Scene
from ..render import fast
from ..render.camera import Camera, ray_directions
from .mesh import make_mesh, rays_sharding, replicated


def measure_render_scaling(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    device_counts: List[int] = None,
    iters: int = 3,
) -> Dict[int, float]:
    """rays/s of the fast forward render for each device count."""
    ndev = len(jax.devices())
    device_counts = device_counts or sorted(
        {1, 2, 4, 8, ndev} & set(range(1, ndev + 1))
    )
    dirs = np.asarray(ray_directions(camera, cfg.width, cfg.height, cfg.fov_degrees))
    N = dirs.shape[0]
    out = {}
    for k in device_counts:
        if N % k:
            continue
        mesh = make_mesh(k, 1, jax.devices()[:k])
        rs = rays_sharding(mesh)
        rep = replicated(mesh)
        sc = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), scene)
        fwd = jax.jit(
            lambda s, p, d: fast.render_rays_fast(s, p, d, cfg)[0],
            in_shardings=(rep, rep, rs),
            out_shardings=rs,
        )
        variants = [
            jax.device_put(jnp.asarray(dirs * (1.0 + 1e-6 * i)), rs)
            for i in range(iters + 1)
        ]
        pos = jax.device_put(camera.pos, rep)
        np.asarray(fwd(sc, pos, variants[-1]))  # warmup/compile
        t0 = time.perf_counter()
        for i in range(iters):
            o = fwd(sc, pos, variants[i])
        np.asarray(o)
        dt = (time.perf_counter() - t0) / iters
        out[k] = N / dt
    return out


def efficiency(rates: Dict[int, float]) -> Dict[int, float]:
    """Scaling efficiency relative to the smallest measured device count."""
    if not rates:
        return {}
    k0 = min(rates)
    base = rates[k0] / k0
    return {k: rates[k] / (k * base) for k in rates}
