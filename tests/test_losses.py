"""Loss tests vs numpy oracles (reference utils/losses.py semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.losses import CELSLoss, lovasz_softmax, weighted_cross_entropy


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _lovasz_oracle(probs, labels):
    """Lovász-Softmax on valid-only (N, C) probs, classes-present mean."""
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind="stable")
        e, f = errors[order], fg[order]
        gts = f.sum()
        inter = gts - f.cumsum()
        union = gts + (1.0 - f).cumsum()
        jac = 1.0 - inter / union
        jac = np.concatenate([jac[:1], jac[1:] - jac[:-1]])
        losses.append((e * jac).sum())
    return float(np.mean(losses))


def _ce_oracle(logits, labels0, weights):
    logp = np.log(_softmax(logits))
    nll = -logp[np.arange(len(labels0)), labels0]
    w = weights[labels0]
    return float((w * nll).sum() / w.sum())


def test_weighted_ce_matches_oracle(rng):
    N, C = 200, 16
    logits = rng.normal(size=(N, C)).astype(np.float32)
    labels0 = rng.integers(0, C, size=N)
    weights = rng.random(C).astype(np.float32) + 0.5
    valid = np.ones(N, bool)
    got = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels0), jnp.asarray(valid),
        jnp.asarray(weights)))
    want = _ce_oracle(logits, labels0, weights)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_ce_ignores_invalid(rng):
    N, C = 100, 8
    logits = rng.normal(size=(N, C)).astype(np.float32)
    labels0 = rng.integers(0, C, size=N)
    weights = np.ones(C, np.float32)
    valid = rng.random(N) > 0.5
    got = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels0), jnp.asarray(valid),
        jnp.asarray(weights)))
    want = _ce_oracle(logits[valid], labels0[valid], weights)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lovasz_matches_oracle_all_valid(rng):
    N, C = 120, 5
    logits = rng.normal(size=(N, C))
    probs = _softmax(logits).astype(np.float32)
    labels = rng.integers(0, C, size=N)
    got = float(lovasz_softmax(
        jnp.asarray(probs), jnp.asarray(labels), jnp.ones(N, bool)))
    want = _lovasz_oracle(probs.astype(np.float64), labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_masked_equals_compacted(rng):
    N, C = 150, 6
    probs = _softmax(rng.normal(size=(N, C))).astype(np.float32)
    labels = rng.integers(0, C, size=N)
    valid = rng.random(N) > 0.4
    got = float(lovasz_softmax(
        jnp.asarray(probs), jnp.asarray(labels), jnp.asarray(valid)))
    want = _lovasz_oracle(probs[valid].astype(np.float64), labels[valid])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_quantized_sort_matches_exact(rng):
    # default path packs a 13-bit quantized key + payload into ONE
    # int32 sort operand; exact_sort=True keeps the f32-keyed 2-operand
    # sort. Only the rank order of near-tied errors can differ — value
    # and gradient must agree to quantization noise.
    N, C = 400, 16
    probs = _softmax(rng.normal(size=(N, C))).astype(np.float32)
    labels = rng.integers(0, C, size=N)
    valid = rng.random(N) > 0.3
    a = jnp.asarray(probs)
    l_q = float(lovasz_softmax(a, jnp.asarray(labels),
                               jnp.asarray(valid)))
    l_e = float(lovasz_softmax(a, jnp.asarray(labels),
                               jnp.asarray(valid), exact_sort=True))
    np.testing.assert_allclose(l_q, l_e, atol=5e-5)
    g_q = jax.grad(lambda p: lovasz_softmax(
        p, jnp.asarray(labels), jnp.asarray(valid)))(a)
    g_e = jax.grad(lambda p: lovasz_softmax(
        p, jnp.asarray(labels), jnp.asarray(valid),
        exact_sort=True))(a)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_e),
                               atol=5e-4)


def test_lovasz_large_n_guard(rng):
    # The packed 1-operand sort needs 2N-1 to fit 18 payload bits
    # (N <= 131,072); beyond that the default path must STATICALLY fall
    # back to the exact 2-operand sort — without the guard the iota
    # bleeds into the quantized key and the loss corrupts silently
    # (B >= 4 at the 34.8k point capacity flattens past the bound).
    N, C = (1 << 17) + 4096, 4
    probs = _softmax(rng.normal(size=(N, C))).astype(np.float32)
    labels = rng.integers(0, C, size=N)
    valid = rng.random(N) > 0.3
    a = jnp.asarray(probs)
    l_d = float(lovasz_softmax(a, jnp.asarray(labels),
                               jnp.asarray(valid)))
    l_e = float(lovasz_softmax(a, jnp.asarray(labels),
                               jnp.asarray(valid), exact_sort=True))
    # identical routes -> bit-identical, not merely close
    assert l_d == l_e


def test_lovasz_perfect_prediction_is_zero(rng):
    N, C = 64, 4
    labels = rng.integers(0, C, size=N)
    probs = np.eye(C, dtype=np.float32)[labels]
    got = float(lovasz_softmax(
        jnp.asarray(probs), jnp.asarray(labels), jnp.ones(N, bool)))
    assert abs(got) < 1e-6


def test_lovasz_gradient_matches_argsort_formulation(rng):
    # the production implementation sorts values through lax.sort; its
    # gradient must equal the straightforward argsort+gather formulation
    N, C = 80, 5
    probs0 = _softmax(rng.normal(size=(N, C))).astype(np.float32)
    labels = jnp.asarray(rng.integers(0, C, size=N))
    valid = jnp.asarray(rng.random(N) > 0.3)

    def argsort_impl(probs):
        def one(c):
            fg = jnp.where(valid, (labels == c).astype(jnp.float32), 0.0)
            errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), 0.0)
            order = jnp.argsort(-errors)
            e, f = errors[order], fg[order]
            inval = jnp.logical_not(valid)[order].astype(jnp.float32)
            gts = jnp.sum(f)
            inter = gts - jnp.cumsum(f)
            union = gts + jnp.cumsum(1.0 - f) - jnp.cumsum(inval)
            jac = 1.0 - inter / jnp.maximum(union, 1e-12)
            grad = jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])
            return jnp.sum(e * grad), gts > 0

        l, p = jax.vmap(one)(jnp.arange(C))
        pf = p.astype(jnp.float32)
        return jnp.sum(l * pf) / jnp.maximum(jnp.sum(pf), 1.0)

    g_fast = jax.grad(lambda p: lovasz_softmax(p, labels, valid))(
        jnp.asarray(probs0))
    g_ref = jax.grad(argsort_impl)(jnp.asarray(probs0))
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-5)


def test_celsloss_end_to_end(rng):
    B, P, C = 2, 100, 16
    scores = rng.normal(size=(B, P, C)).astype(np.float32)
    labels = rng.integers(0, C + 1, size=(B, P))  # 0 = noise
    mask = rng.random((B, P)) > 0.2
    weights = np.ones(C, np.float32)

    loss = CELSLoss(weight=weights, ignore_index=0, lamda_lovasz=1.0)
    out = loss(jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask))

    valid = (labels != 0) & mask
    assert int(out.num_valid) == valid.sum()
    # predictions in [1, C] at valid slots, 0 elsewhere
    preds = np.asarray(out.predictions)
    assert preds[~valid].max(initial=0) == 0
    assert (preds[valid] >= 1).all() and (preds[valid] <= C).all()
    # total = ce + λ lovasz
    np.testing.assert_allclose(
        float(out.total), float(out.ce) + float(out.lovasz), rtol=1e-6)
    # accuracy consistency
    want_correct = (preds[valid] == labels[valid]).sum()
    assert int(out.num_correct) == want_correct


def test_celsloss_differentiable(rng):
    B, P, C = 1, 64, 8
    scores = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C + 1, size=(B, P)))
    mask = jnp.ones((B, P), bool)
    loss = CELSLoss(weight=np.ones(C, np.float32))

    g = jax.grad(lambda s: loss(s, labels, mask).total)(scores)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
