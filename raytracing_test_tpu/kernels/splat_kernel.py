"""Pallas box-splat: the window backward's gradient-box contraction in VMEM.

ops/splat.py's MXU box splat has the right shape — per (32-ray x 8-step) tile,
accumulate gradient rows into a 16^3 box with one-hot contractions — but its
XLA realization materializes the Khatri-Rao factor W = ohy x ohz as a
[chunk, 256, 256] bf16 tensor in HBM (~12 GB of traffic per 1M-ray window),
measured 6.0 s per 1024^2 x 24 backward (VERIFY_r03 s3). This kernel builds
the SAME contraction per 4-tile group entirely in VMEM:

    LHS[r, t*16 + lx[r]] = g_part[r]     (block-diagonal one-hot, bf16)
    W  [r, ly[r]*16+lz[r]] = 1           (one-hot, bf16)
    boxes[t*16+x, yz] = LHS^T @ W        (one (1024,64)x(1024,256) matmul
                                          per channel per hi/lo part)

The block-diagonal stacking trades 4x redundant MACs for an MXU-shaped M=64
output — net ~6.6 TFLOP per 1M-ray window ≈ tens of ms instead of seconds.
f32 exactness: gradients split hi+lo into two bf16 parts (one-hot products
are exact; f32 accumulation reconstructs to ~1 ulp — ops/splat.py's
established contract, tests compare against the plain scatter).

XLA keeps the surrounding logic from ops/splat.py (tile offsets, inlier
masks, the box scatter-add merge, sparse outliers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TB = 4  # tiles per grid step: (TB*256, TB*16) LHS keeps the MXU M-dim at 64
R = 256  # rows per tile (GROUP_RAYS * SUB_STEPS, ops/splat.py)
BOX = 16


def _splat_kernel(lx_ref, lyz_ref, g0h, g1h, g2h, g3h, g0l, g1l, g2l, g3l,
                  out_ref):
    """One-hots built once per group; per-channel lhs is a bf16 multiply of
    the block-diagonal one-hot by the gradient column."""
    i32 = jnp.int32
    lx = lx_ref[:]
    lyz = lyz_ref[:]
    n = TB * R
    tcol = jax.lax.broadcasted_iota(i32, (TB, R), 0) * BOX + lx
    ar_cols = jax.lax.broadcasted_iota(i32, (TB, R, TB * BOX), 2)
    ohx = (tcol[:, :, None] == ar_cols).astype(jnp.bfloat16).reshape(n, TB * BOX)
    ar_yz = jax.lax.broadcasted_iota(i32, (TB, R, 256), 2)
    W = (lyz[:, :, None] == ar_yz).astype(jnp.bfloat16).reshape(n, 256)

    ghs = (g0h, g1h, g2h, g3h)
    gls = (g0l, g1l, g2l, g3l)
    for c in range(4):
        acc = None
        for g_ref in (ghs[c], gls[c]):
            lhs = ohx * g_ref[:].reshape(n, 1).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                lhs, W, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        out_ref[:, c * 256 : (c + 1) * 256] = acc


def splat_boxes_pallas(lx, ly, lz, g, interpret=False):
    """Per-tile gradient boxes. lx/ly/lz: i32[T, R] local coords in [0, 16)
    (out-of-box rows must arrive masked to 0 with g zeroed); g: f32[T, R, 4].
    Returns boxes f32[T, BOX, BOX, BOX, 4]."""
    T = lx.shape[0]
    pad = (-T) % TB
    if pad:
        zi = jnp.zeros((pad, R), lx.dtype)
        lx, ly, lz = (jnp.concatenate([v, zi]) for v in (lx, ly, lz))
        g = jnp.concatenate([g, jnp.zeros((pad, R, 4), g.dtype)])
    TP = T + pad
    lyz = ly * BOX + lz
    g_hi = g.astype(jnp.bfloat16)
    g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    tile_spec = pl.BlockSpec((TB, R), lambda i: (i, 0))
    out = pl.pallas_call(
        _splat_kernel,
        grid=(TP // TB,),
        in_specs=[tile_spec] * 10,
        out_specs=pl.BlockSpec((TB * BOX, 4 * 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((TP * BOX, 4 * 256), jnp.float32),
        interpret=interpret,
    )(
        lx, lyz,
        *(g_hi[:, :, c] for c in range(4)),
        *(g_lo[:, :, c] for c in range(4)),
    )
    # (TP*BOX, 4*256) -> [T, BOX(x), 4, BOX(y), BOX(z)] -> [T, x, y, z, 4]
    boxes = out.reshape(TP, BOX, 4, BOX, BOX).transpose(0, 1, 3, 4, 2)
    return boxes[:T]
