"""Class-weight tool (reference utils/dataloader.py:244-270).

Oracle-checks the sqrt scheme against the reference formula
``sqrt(max_count / count)`` computed directly, the count accumulation
against a hand bincount with masking, and the two config-baked
compressions (nuscenesTestConfig22.yaml:14-31) for their defining
properties (monotone in rarity, capped / log-compressed range).
"""

import numpy as np
import pytest

from tpu3dssf.data.class_weights import (
    accumulate_class_counts,
    calculate_class_weights,
    log_compressed_weights,
    soft_compressed_weights,
    sqrt_inverse_weights,
)

C = 16


def _batches(rng, n=4, B=2, P=64):
    out = []
    for _ in range(n):
        out.append({
            "labels": rng.integers(0, C + 1, size=(B, P)).astype(np.int32),
            "mask": rng.random((B, P)) < 0.8,
        })
    return out


def test_accumulate_counts_matches_masked_bincount():
    rng = np.random.default_rng(0)
    batches = _batches(rng)
    counts = accumulate_class_counts(batches, C)
    want = np.zeros(C + 1, np.int64)
    for b in batches:
        want += np.bincount(b["labels"][b["mask"]].reshape(-1),
                            minlength=C + 1)
    np.testing.assert_array_equal(counts, want[1:])  # noise class dropped


def test_sqrt_scheme_is_reference_formula():
    counts = np.array([100, 400, 25, 10000], np.int64)
    w = sqrt_inverse_weights(counts)
    np.testing.assert_allclose(
        w, np.sqrt(counts.max() / (counts + 1e-6)), rtol=1e-6)
    assert w[np.argmax(counts)] == pytest.approx(1.0)  # commonest → 1


def test_compressions_preserve_rarity_order_and_bound_range():
    rng = np.random.default_rng(1)
    counts = rng.integers(10, 10_000_000, size=C)
    rarity = np.argsort(counts)  # rarer → larger weight, all schemes
    for fn in (sqrt_inverse_weights, soft_compressed_weights,
               log_compressed_weights):
        w = fn(counts)
        assert np.all(np.diff(w[rarity][::-1]) >= -1e-6), fn.__name__
    soft = soft_compressed_weights(counts)
    assert soft.max() <= 16.0 + 1e-6 and soft.min() == pytest.approx(1.0)
    logw = log_compressed_weights(counts)
    np.testing.assert_allclose(
        logw, 1.0 + np.log(sqrt_inverse_weights(counts)
                           / sqrt_inverse_weights(counts).min()),
        rtol=1e-6)
    assert logw.min() == pytest.approx(1.0)


def test_calculate_dispatches_and_rejects_unknown_scheme():
    rng = np.random.default_rng(2)
    batches = _batches(rng, n=2)
    for scheme, fn in (("sqrt", sqrt_inverse_weights),
                       ("log", log_compressed_weights),
                       ("soft", soft_compressed_weights)):
        got = calculate_class_weights(batches, C, scheme=scheme)
        want = fn(accumulate_class_counts(batches, C))
        np.testing.assert_allclose(got, want, rtol=1e-6)
    with pytest.raises(ValueError):
        calculate_class_weights(batches, C, scheme="nope")
