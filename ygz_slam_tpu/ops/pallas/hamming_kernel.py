"""Pallas TPU kernel: all-pairs Hamming distance over packed 256-bit
descriptors.

This is the single hottest matching primitive (every SearchByBoW /
triangulation / relocalization / loop-closing call builds an [N, M]
distance matrix).  The generic jnp path (ops.hamming.distance_matrix)
materializes an [N, M, 8] XOR tensor in HBM; this kernel tiles the
problem into VMEM blocks and keeps the XOR+popcount+reduce entirely
on-chip — one [TN, TM] output tile per grid step, HBM traffic is just
the descriptor rows plus the output.

SWAR popcount runs on the VPU's int32 lanes (TPUs have no popcount
instruction; the bit-hack is 4 integer ops per word).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import hamming as _fallback

TILE_N = 128
TILE_M = 128


def _popcount_i32(v):
    """SWAR popcount on int32 lanes; shifts must be logical so the
    bit pattern (not the signed value) is what's counted."""
    sr = jax.lax.shift_right_logical
    v = v - (sr(v, 1) & 0x55555555)
    v = (v & 0x33333333) + (sr(v, 2) & 0x33333333)
    v = (v + sr(v, 4)) & 0x0F0F0F0F
    return sr(v * 0x01010101, 24)


def _kernel(a_ref, b_ref, out_ref):
    # a_ref: [TILE_N, 8] int32, b_ref: [TILE_M, 8] int32.
    # Accumulate per-word popcounts to avoid a [TN, TM, 8] VMEM blob.
    acc = jnp.zeros((TILE_N, TILE_M), jnp.int32)
    for w in range(8):
        x = a_ref[:, w][:, None] ^ b_ref[:, w][None, :]
        acc = acc + _popcount_i32(x)
    out_ref[:, :] = acc


def distance_matrix_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 Hamming distances via a
    tiled Pallas kernel; pads to tile multiples internally."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = a.shape[0], b.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Mp = -(-M // TILE_M) * TILE_M
    a_p = jnp.zeros((Np, 8), jnp.int32).at[:N].set(a.astype(jnp.int32))
    b_p = jnp.zeros((Mp, 8), jnp.int32).at[:M].set(b.astype(jnp.int32))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.int32),
        grid=(Np // TILE_N, Mp // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a_p, b_p)
    return out[:N, :M]


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas on TPU backends, jnp elsewhere."""
    try:
        platform = a.devices().pop().platform if hasattr(a, "devices") else (
            jax.default_backend()
        )
    except Exception:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return _fallback.distance_matrix(a, b)
    return distance_matrix_pallas(a, b)
