"""Space-filling-curve codes (Morton / Hilbert) as pure int32 XLA ops.

TPU-native replacement for the serialization step of PointTransformerV3
(reference submodule ``PointTransformerV3/``, imported at
utils/lidar.py:12), whose upstream implementation computes z-order /
Hilbert codes on CUDA. PTv3 sorts points along these curves and attends
within fixed windows of the sorted order.

JAX on TPU has no native int64 without the x64 flag, so a 48-bit code
(16 bits per axis) is represented as a pair of int32s ``(hi, lo)`` and all
sorting is 2-key lexicographic (``jax.lax.sort(num_keys=2)``). hi carries
code bits [32, 48), lo carries bits [0, 32).

``lax.sort`` compares int32 SIGNED while code bit 31 rides ``lo``'s
sign bit, so :func:`serialization_keys` returns ``lo`` with bit 31
FLIPPED: ``signed(x ^ 0x80000000)`` orders exactly like ``unsigned(x)``,
making the 2-key signed sort realize the true unsigned 48-bit curve
order — the same order upstream's int64 sort produces — at the cost of
one fused XOR. (Before round 5 the un-flipped ``lo`` shipped a
"signed-int32 curve variant" that swapped two half-blocks wherever
equal-``hi`` points differed at bit 31 — behaviorally equivalent but
not bit-identical to upstream; see PARITY.md item 14.) The raw-code
encoders ``morton_encode``/``hilbert_encode`` still return the
unflipped code bits. Pinned in
tests/test_serialization.py::test_serialized_order_is_true_unsigned_order.

Supported orders (PTv3's defaults: "z", "z-trans", "hilbert",
"hilbert-trans"): the ``-trans`` variants permute the axes (x, y, z) →
(y, x, z) before encoding, matching upstream's transposed curves.
"""

from __future__ import annotations

import jax.numpy as jnp

GRID_BITS = 16
_OFF = 1 << (GRID_BITS - 1)

SERIALIZATION_ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def pack_cell_keys(grid_coords):
    """Pack (..., 3) int32 grid coords into 2-int32 lexicographic keys.

    Non-interleaved (plain row-major cell id) — used for grouping points by
    cell (voxelization, grid pooling), where any injective key works.
    x sits in hi, (y, z) packed into lo at GRID_BITS each.
    """
    g = grid_coords.astype(jnp.int32) + _OFF
    mask = (1 << GRID_BITS) - 1
    hi = g[..., 0] & mask
    lo = ((g[..., 1] & mask) << GRID_BITS) | (g[..., 2] & mask)
    return hi, lo


def _interleave3(x, y, z, bits=GRID_BITS):
    """Bit-interleave three ``bits``-wide non-negative int32 arrays.

    Bit j of (x, y, z) lands at code position 3*j + (2, 1, 0) — x is the
    most significant axis within each bit triple. Returns (hi, lo) int32.
    """
    hi = jnp.zeros_like(x)
    lo = jnp.zeros_like(x)
    for j in range(bits):
        for a, v in enumerate((z, y, x)):  # a=0 → least significant
            p = 3 * j + a
            bit = (v >> j) & 1
            if p < 32:
                lo = lo | (bit << p)
            else:
                hi = hi | (bit << (p - 32))
    return hi, lo


def _to_grid_uint(grid_coords):
    """Offset signed grid coords into [0, 2^GRID_BITS) unsigned range."""
    g = jnp.clip(grid_coords.astype(jnp.int32) + _OFF, 0, (1 << GRID_BITS) - 1)
    return g[..., 0], g[..., 1], g[..., 2]


def morton_encode(grid_coords):
    """Z-order code of (..., 3) int32 grid coords → (hi, lo) int32 arrays."""
    x, y, z = _to_grid_uint(grid_coords)
    return _interleave3(x, y, z)


def hilbert_encode(grid_coords):
    """Hilbert-curve code of (..., 3) int32 grid coords → (hi, lo).

    Skilling's transpose algorithm (AIP Conf. Proc. 707, 381 (2004)),
    vectorized with jnp.where over all points at once: convert axes to the
    Hilbert transpose representation, then bit-interleave.
    """
    x, y, z = _to_grid_uint(grid_coords)
    X = [x, y, z]
    n = 3
    M = 1 << (GRID_BITS - 1)

    # Inverse undo excess work.
    Q = M
    while Q > 1:
        Pm = Q - 1
        for i in range(n):
            cond = (X[i] & Q) > 0
            # if bit set: invert low bits of X[0]; else swap low bits X[0]<->X[i]
            t = (X[0] ^ X[i]) & Pm
            X0_if = X[0] ^ Pm
            X0_else = X[0] ^ t
            Xi_else = X[i] ^ t
            X[0] = jnp.where(cond, X0_if, X0_else)
            if i != 0:
                X[i] = jnp.where(cond, X[i], Xi_else)
        Q >>= 1

    # Gray encode.
    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = jnp.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = jnp.where((X[n - 1] & Q) > 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(n):
        X[i] = X[i] ^ t

    return _interleave3(X[0], X[1], X[2])


def serialization_keys(grid_coords, order):
    """Compute sort keys for one serialization order.

    Args:
      grid_coords: (..., 3) int32.
      order: one of SERIALIZATION_ORDERS.

    Returns:
      (hi, lo) int32 arrays, lexicographic sort keys.
    """
    if order.endswith("-trans"):
        grid_coords = grid_coords[..., jnp.array([1, 0, 2])]
        order = order[: -len("-trans")]
    if order == "z":
        hi, lo = morton_encode(grid_coords)
    elif order == "hilbert":
        hi, lo = hilbert_encode(grid_coords)
    else:
        raise ValueError(f"unknown serialization order: {order!r}")
    # lax.sort compares int32 SIGNED and code bit 31 rides lo's sign
    # bit; flipping it makes the signed lex order equal the true
    # unsigned code order (hi holds bits [32, 48) in a 16-bit value —
    # always non-negative, so it needs no flip, and argsort_lex's
    # invalid sentinel hi = INT32_MAX still dominates every valid key).
    return hi, lo ^ jnp.int32(-(2 ** 31))
