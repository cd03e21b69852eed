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
