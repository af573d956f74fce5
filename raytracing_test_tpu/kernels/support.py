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
    otherwise).

    The probe MUST run eagerly even when first reached while tracing under
    jit (omnistaging would stage it, np.asarray would raise on the tracer,
    and the lru_cache would poison every later call with False — which
    silently ran bench's "fused" candidates in interpret mode through
    round 3; found r04). ensure_compile_time_eval forces eager evaluation.
    """

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    try:
        with jax.ensure_compile_time_eval():
            x = jnp.zeros((8, 128), jnp.float32)
            np.asarray(
                pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
                )(x)
            )
        return True
    except Exception:
        return False
