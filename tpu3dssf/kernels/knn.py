"""Pallas k-NN (squared L2) for voxel↔point transfers.

Replaces the XLA tiled top-k in :mod:`tpu3dssf.voxel.voxelize` on TPU.
The XLA version streams (Q, tile) distance blocks through HBM ~2(k+1)
times (each min/argmin/mask round re-materializes the block): 87 ms for
the knn5 parity mode, 14 ms for 1-NN devoxelization at nuScenes scale.

Here the whole reference set lives in VMEM (34.8k pts x 8 lanes x f32
≈ 1.1 MB) and each grid step computes ONE (64, R) distance block that
never leaves VMEM; the k selection rounds are VPU passes over resident
data. Distances come from a single 8-wide MXU dot via the packing

    qv = (-2x, -2y, -2z, |q|², 1, 0, 0, 0)
    rv = ( x,   y,   z,  1, |r|², 0, 0, 0)      ⇒  qv·rv = |q - r|²

with f32 HIGHEST precision (neighbor ORDER must be exact — bf16
mantissas shuffle near-ties; see voxelize.knn_intensity_transfer's
rejected approx_min_k note). Invalid refs carry |r|² = 1e30 so they
lose every comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 64          # query rows per grid step
_SLOTS = 8         # output k-slots (k ≤ 8), lane-padded
# invalid-ref / unfilled-slot distance sentinel — MUST match
# voxelize.KNN_BAD_DIST so the XLA fallback path is bit-identical even
# when a query has < k valid refs. Never square it downstream (f32
# overflow, CLAUDE.md trap 9); consumers select by index, not distance.
_BAD = 1e30


def _knn_kernel(k, q_ref, r_ref, od_ref, oi_ref):
    qv = q_ref[...]                                   # (BQ, 8)
    rv = r_ref[...]                                   # (R, 8)
    d = jax.lax.dot_general(
        qv, rv, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # (BQ, R)
    R = d.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    best_d = jnp.full((d.shape[0], _SLOTS), _BAD, jnp.float32)
    best_i = jnp.zeros((d.shape[0], _SLOTS), jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (d.shape[0], _SLOTS), 1)
    for j in range(k):
        a = jnp.argmin(d, axis=1).astype(jnp.int32)   # (BQ,)
        m = jnp.min(d, axis=1)
        best_d = jnp.where(slot == j, m[:, None], best_d)
        best_i = jnp.where(slot == j, a[:, None], best_i)
        if j + 1 < k:
            d = jnp.where(cols == a[:, None], _BAD, d)
    od_ref[...] = best_d
    oi_ref[...] = best_i


@functools.partial(jax.jit, static_argnames=("k",))
def knn_pallas(queries, refs, ref_mask, k):
    """k nearest refs per query, (Q, 3) x (R, 3) -> (Q, k) d², (Q, k) idx.

    Q must be a multiple of _BQ and R a multiple of 128 (both hold for
    the framework's static capacities). k ≤ 8.
    """
    if k > _SLOTS:
        raise ValueError(f"k={k} > {_SLOTS}")
    Q, R = queries.shape[0], refs.shape[0]
    if Q % _BQ or R % 128:
        # the grid rounds DOWN — an off-contract shape would leave the
        # tail rows silently uncomputed, so fail loudly instead
        raise ValueError(
            f"knn_pallas needs Q % {_BQ} == 0 and R % 128 == 0, "
            f"got Q={Q}, R={R} (pad the capacities)")

    qf = queries.astype(jnp.float32)
    rf = refs.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=-1, keepdims=True)
    rn = jnp.sum(rf * rf, axis=-1, keepdims=True)
    rn = jnp.where(ref_mask[:, None], rn, _BAD)
    zq = jnp.zeros((Q, 3), jnp.float32)
    zr = jnp.zeros((R, 3), jnp.float32)
    qv = jnp.concatenate([-2.0 * qf, qn, jnp.ones_like(qn), zq], axis=-1)
    rv = jnp.concatenate([rf, jnp.ones_like(rn), rn, zr], axis=-1)

    grid = (Q // _BQ,)
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, k),
        out_shape=(jax.ShapeDtypeStruct((Q, _SLOTS), jnp.float32),
                   jax.ShapeDtypeStruct((Q, _SLOTS), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BQ, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BQ, _SLOTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BQ, _SLOTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qv, rv)
    return d[:, :k], i[:, :k]
