"""Measure the handoff exchange volume (VERDICT r02 item 8) -> EXCHANGE_r03.json.

Runs the segment-handoff render on the virtual 8-device CPU mesh with the
exchange counters compiled into the round loop (parallel/handoff.py ship())
and records rounds / lanes shipped / bytes shipped per configuration. These
counters back docs/SCALING.md's space-axis communication model with measured
inputs (the model previously cited a hand-estimate).

Counters are resolution- and world-dependent but DEVICE-SPEED-independent, so
the CPU mesh numbers are the real ICI volumes a TPU slice would move.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from raytracing_test_tpu.config import RenderConfig, WorldConfig
    from raytracing_test_tpu.core import flatten
    from raytracing_test_tpu.parallel import handoff, mesh as meshlib, spatial
    from raytracing_test_tpu.render.camera import Camera, ray_directions

    from raytracing_test_tpu.worldgen import terrain

    out = {"state_bytes_per_lane": 112, "configs": []}
    for wshape, res, n_data, n_space in [
        ((64, 64, 64), 128, 1, 8),
        ((64, 64, 64), 256, 2, 4),
        ((256, 128, 256), 256, 1, 8),
        ((256, 128, 256), 512, 1, 8),
    ]:
        wcfg = WorldConfig(
            width=min(200, wshape[0] - 8), length=min(200, wshape[2] - 8),
            grid_shape=wshape,
        )
        grid, pal = terrain.gen_world_grid(wcfg)
        scene = flatten.scene_from_grid(grid, pal)
        mesh = meshlib.make_mesh(n_data, n_space)
        sharded = spatial.shard_scene_spatial(scene, mesh)
        cam = Camera(
            pos=jnp.asarray([wshape[0] * 0.55, wshape[1] * 0.85, wshape[2] * 0.2],
                            jnp.float32),
            dir=jnp.asarray([0.55, -0.4, 0.55], jnp.float32),
        )
        rcfg = RenderConfig(width=res, height=res)
        dirs = ray_directions(cam, res, res)
        from jax.sharding import NamedSharding, PartitionSpec as P

        dirs = jax.device_put(dirs, NamedSharding(mesh, P(meshlib.DATA_AXIS, None)))
        t0 = time.time()
        col, stats = jax.jit(
            lambda sc, pos, d: handoff.render_rays_handoff(
                sc, pos, d, rcfg, mesh, return_stats=True)
        )(sharded, cam.pos, dirs)
        col = np.asarray(col)
        rounds = int(np.asarray(stats["rounds"]).reshape(-1)[0])
        lanes = int(np.asarray(stats["lanes_shipped"]).reshape(-1)[0])
        rays = res * res
        cfg_rec = {
            "world": list(wshape), "resolution": res,
            "mesh": [n_data, n_space],
            "rays": rays,
            "handoff_rounds": rounds,
            "lanes_shipped": lanes,
            "bytes_shipped": lanes * 112,
            "bytes_per_ray": lanes * 112 / rays,
            "hops_per_ray": lanes / rays,
            "wall_s": round(time.time() - t0, 1),
        }
        out["configs"].append(cfg_rec)
        print(cfg_rec, flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXCHANGE_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote EXCHANGE_r03.json")


if __name__ == "__main__":
    main()
