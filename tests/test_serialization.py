"""Space-filling-curve code tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.serialization import (
    morton_encode,
    hilbert_encode,
    serialization_keys,
    argsort_lex,
    inverse_permutation,
)


def _code_to_int(hi, lo):
    return (np.asarray(hi).astype(np.int64) << 32) | (
        np.asarray(lo).astype(np.int64) & 0xFFFFFFFF)


def _oracle_morton(coords, bits=16, off=1 << 15):
    out = []
    for c in coords:
        code = 0
        g = [int(v) + off for v in c]
        for j in range(bits):
            for a, v in enumerate((g[2], g[1], g[0])):
                code |= ((v >> j) & 1) << (3 * j + a)
        out.append(code)
    return np.array(out, dtype=np.int64)


def test_morton_matches_oracle(rng):
    coords = rng.integers(-1000, 1000, size=(100, 3)).astype(np.int32)
    hi, lo = morton_encode(jnp.asarray(coords))
    np.testing.assert_array_equal(_code_to_int(hi, lo),
                                  _oracle_morton(coords))


def test_morton_orders_locally(rng):
    # points in the same cell octant sort adjacently: a coarse sanity
    # check that nearby coords give nearby codes
    base = np.array([10, 20, 30], dtype=np.int32)
    near = base + np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                           dtype=np.int32)
    far = base + 512
    hi_n, lo_n = morton_encode(jnp.asarray(near))
    hi_f, lo_f = morton_encode(jnp.asarray(far[None]))
    near_codes = _code_to_int(hi_n, lo_n)
    far_code = _code_to_int(hi_f, lo_f)[0]
    assert (np.abs(near_codes - near_codes[0]) < np.abs(
        far_code - near_codes[0])).all()


def test_hilbert_is_a_bijection_on_small_cube():
    # all 8^3 coords of a 3-bit cube must map to distinct codes
    r = np.arange(8, dtype=np.int32)
    coords = np.stack(np.meshgrid(r, r, r, indexing="ij"),
                      axis=-1).reshape(-1, 3)
    hi, lo = hilbert_encode(jnp.asarray(coords))
    codes = _code_to_int(hi, lo)
    assert len(np.unique(codes)) == len(codes)


def test_hilbert_continuity_on_subcube():
    # consecutive codes along the curve differ by exactly one unit step
    # in exactly one axis (the defining property of a Hilbert curve).
    # Use the 2^2 cube embedded at offset -off so _to_grid_uint yields 0..3.
    off = 1 << 15
    r = np.arange(4, dtype=np.int32) - off
    coords = np.stack(np.meshgrid(r, r, r, indexing="ij"),
                      axis=-1).reshape(-1, 3)
    hi, lo = hilbert_encode(jnp.asarray(coords))
    codes = _code_to_int(hi, lo)
    order = np.argsort(codes)
    sorted_coords = coords[order]
    steps = np.abs(np.diff(sorted_coords, axis=0))
    assert (steps.sum(axis=1) == 1).all()


def test_serialized_order_is_true_unsigned_order(rng):
    # codes.py: serialization_keys flips lo's bit 31 so lax.sort's
    # SIGNED int32 compare realizes the true UNSIGNED 48-bit code
    # order — the order upstream's int64 sort produces. Pin it against
    # the unsigned-code oracle both within a 1024-cell block and across
    # the bit-31 (y grid bit 10) boundary where the pre-round-5 signed
    # variant used to swap half-blocks.
    # (a) realistic span (< 1024-cell block boundary)
    coords = rng.integers(-500, 500, size=(4096, 3)).astype(np.int32)
    hi, lo = serialization_keys(jnp.asarray(coords), "z")
    perm = np.asarray(argsort_lex(hi, lo))
    true_perm = np.argsort(_oracle_morton(coords), kind="stable")
    np.testing.assert_array_equal(perm, true_perm)
    # (b) spanning the boundary: code bit 31 flips between points
    coords = rng.integers(-2048, 2048, size=(4096, 3)).astype(np.int32)
    hi, lo = serialization_keys(jnp.asarray(coords), "z")
    assert (np.asarray(lo) < 0).any() and (np.asarray(lo) >= 0).any()
    perm = np.asarray(argsort_lex(hi, lo))
    true_perm = np.argsort(_oracle_morton(coords), kind="stable")
    np.testing.assert_array_equal(perm, true_perm)
    # (c) the minimal pair the old variant ordered backwards
    c2 = np.array([[0, 0, 0], [0, 1024, 0]], np.int32)
    h2, l2 = serialization_keys(jnp.asarray(c2), "z")
    np.testing.assert_array_equal(np.asarray(argsort_lex(h2, l2)), [0, 1])


def test_all_orders_sort_by_unsigned_code(rng):
    # Every order's sort keys must realize the unsigned 48-bit code
    # order of its raw curve code, including across the lo bit-31
    # boundary. Raw codes come from the encoders directly (they return
    # unflipped bits); the unsigned oracle is their int64 reconstruction.
    coords = rng.integers(-2048, 2048, size=(2048, 3)).astype(np.int32)
    for order in ("z", "z-trans", "hilbert", "hilbert-trans"):
        c = coords
        if order.endswith("-trans"):
            c = coords[:, [1, 0, 2]]
        enc = morton_encode if order.startswith("z") else hilbert_encode
        hi_r, lo_r = enc(jnp.asarray(c))
        true_perm = np.argsort(_code_to_int(hi_r, lo_r), kind="stable")
        hi, lo = serialization_keys(jnp.asarray(coords), order)
        perm = np.asarray(argsort_lex(hi, lo))
        np.testing.assert_array_equal(perm, true_perm, err_msg=order)


def test_all_orders_produce_permutations(rng):
    coords = rng.integers(-50, 50, size=(64, 3)).astype(np.int32)
    for order in ("z", "z-trans", "hilbert", "hilbert-trans"):
        hi, lo = serialization_keys(jnp.asarray(coords), order)
        perm = argsort_lex(hi, lo)
        assert sorted(np.asarray(perm).tolist()) == list(range(64))


def test_trans_order_differs_from_base(rng):
    coords = rng.integers(-50, 50, size=(64, 3)).astype(np.int32)
    hi_z, lo_z = serialization_keys(jnp.asarray(coords), "z")
    hi_t, lo_t = serialization_keys(jnp.asarray(coords), "z-trans")
    assert not (np.array_equal(np.asarray(hi_z), np.asarray(hi_t))
                and np.array_equal(np.asarray(lo_z), np.asarray(lo_t)))


def test_argsort_lex_invalid_last(rng):
    hi = jnp.asarray(rng.integers(0, 100, size=32), dtype=jnp.int32)
    lo = jnp.asarray(rng.integers(0, 100, size=32), dtype=jnp.int32)
    valid = jnp.asarray(rng.random(32) > 0.4)
    perm = argsort_lex(hi, lo, valid)
    v_sorted = np.asarray(valid)[np.asarray(perm)]
    n_valid = int(np.asarray(valid).sum())
    assert v_sorted[:n_valid].all() and not v_sorted[n_valid:].any()


def test_inverse_permutation(rng):
    perm = jnp.asarray(rng.permutation(77), dtype=jnp.int32)
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(
        np.asarray(perm)[np.asarray(inv)], np.arange(77))


def test_permutation_gather_matches_take_along_axis(rng):
    from tpu3dssf.serialization import permutation_gather

    B, N, C = 2, 64, 5
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    perm = jnp.stack([jnp.asarray(rng.permutation(N), jnp.int32)
                      for _ in range(B)])
    inv = jax.vmap(inverse_permutation)(perm)
    out = permutation_gather(x, perm, inv)
    ref = jnp.take_along_axis(x, perm[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_permutation_gather_vjp_matches_scatter_vjp(rng):
    """The gather-with-inverse VJP must equal XLA's scatter-add VJP."""
    from tpu3dssf.serialization import permutation_gather

    B, N, C = 2, 48, 3
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    perm = jnp.stack([jnp.asarray(rng.permutation(N), jnp.int32)
                      for _ in range(B)])
    inv = jax.vmap(inverse_permutation)(perm)

    def f_custom(x):
        return permutation_gather(x, perm, inv)

    def f_ref(x):
        return jnp.take_along_axis(x, perm[..., None], axis=1)

    _, vjp_c = jax.vjp(f_custom, x)
    _, vjp_r = jax.vjp(f_ref, x)
    np.testing.assert_allclose(np.asarray(vjp_c(ct)[0]),
                               np.asarray(vjp_r(ct)[0]), rtol=0, atol=0)

    # and under jit + grad-of-sum composition
    g_c = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(f_custom(x)))))(x)
    g_r = jax.grad(lambda x: jnp.sum(jnp.sin(f_ref(x))))(x)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_r),
                               rtol=1e-6, atol=1e-6)
