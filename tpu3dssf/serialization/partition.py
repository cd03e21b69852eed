"""Sorting / permutation helpers for serialized point sets."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argsort_lex(hi, lo, valid=None):
    """Stable argsort by the 2-int32 lexicographic key ``(hi, lo)``.

    Invalid entries (``valid`` False) sort to the end. Returns ``perm``
    (int32) such that ``x[perm]`` is sorted.
    """
    n = hi.shape[0]
    if valid is not None:
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        hi = jnp.where(valid, hi, big)
        lo = jnp.where(valid, lo, big)
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((hi, lo, idx), num_keys=2, is_stable=True)
    return perm


def inverse_permutation(perm):
    """Inverse of a permutation: inv[perm[i]] = i."""
    n = perm.shape[0]
    return (
        jnp.zeros((n,), dtype=jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32))
    )


@jax.custom_vjp
def permutation_gather(x, perm, inv):
    """``take_along_axis(x, perm[..., None], axis=1)`` with a gather VJP.

    XLA transposes a gather into a scatter-add — the right rule for
    arbitrary indices, but a permutation's transpose is just the inverse
    gather, and TPU scatters are far slower than gathers. Every
    serialization reorder in the model already carries its inverse
    (``inverse_permutation``), so the backward pass can stay gather-only.

    Args:
      x:    (B, N, C) values.
      perm: (B, N) int32 — a PERMUTATION of 0..N-1 per batch row.
      inv:  (B, N) int32 — its inverse. Required, not recomputed: the
            caller always has it, and correctness of the VJP depends on
            ``inv`` being the true inverse of ``perm``.
    """
    del inv
    return jnp.take_along_axis(x, perm[..., None], axis=1)


def _permutation_gather_fwd(x, perm, inv):
    return jnp.take_along_axis(x, perm[..., None], axis=1), inv


def _permutation_gather_bwd(inv, ct):
    import numpy as np

    zero = np.zeros(inv.shape, jax.dtypes.float0)
    return (jnp.take_along_axis(ct, inv[..., None], axis=1), zero, zero)


permutation_gather.defvjp(_permutation_gather_fwd, _permutation_gather_bwd)
