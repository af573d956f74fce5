"""Backend capability probe shared by every Pallas kernel in the package."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """Probe once whether the default backend compiles Pallas/Mosaic kernels
    (the tunneled axon backend compiled them fine when probed 2026-08-18;
    real TPU slices and CPU both work; callers fall back to interpret mode
    otherwise)."""

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    try:
        x = jnp.zeros((8, 128), jnp.float32)
        np.asarray(
            pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
            )(x)
        )
        return True
    except Exception:
        return False
