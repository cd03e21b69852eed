"""Metric tests vs numpy oracles (reference utils/evaluation.py)."""

import numpy as np
import jax.numpy as jnp

from tpu3dssf.metrics import (
    confusion_matrix,
    evaluate_from_confusion,
    iou_from_confusion,
    overall_accuracy,
    per_class_accuracy,
    precision_recall_f1,
)


def _oracle_cm(preds, labels, C):
    cm = np.zeros((C, C), np.int64)
    for p, l in zip(preds - 1, labels - 1):
        cm[l, p] += 1
    return cm


def test_confusion_matrix(rng):
    C = 16
    preds = rng.integers(1, C + 1, size=500)
    labels = rng.integers(1, C + 1, size=500)
    got = np.asarray(confusion_matrix(
        jnp.asarray(preds), jnp.asarray(labels), C))
    np.testing.assert_array_equal(got, _oracle_cm(preds, labels, C))


def test_confusion_matrix_masked(rng):
    C = 8
    preds = rng.integers(1, C + 1, size=300)
    labels = rng.integers(1, C + 1, size=300)
    valid = rng.random(300) > 0.5
    got = np.asarray(confusion_matrix(
        jnp.asarray(preds), jnp.asarray(labels), C, jnp.asarray(valid)))
    np.testing.assert_array_equal(
        got, _oracle_cm(preds[valid], labels[valid], C))


def test_iou_and_accuracy(rng):
    C = 5
    preds = rng.integers(1, C + 1, size=1000)
    labels = rng.integers(1, C + 1, size=1000)
    cm = _oracle_cm(preds, labels, C)
    iou, miou = iou_from_confusion(jnp.asarray(cm))
    want_iou = np.diag(cm) / np.maximum(
        cm.sum(1) + cm.sum(0) - np.diag(cm), 1)
    np.testing.assert_allclose(np.asarray(iou), want_iou, rtol=1e-6)
    np.testing.assert_allclose(float(miou), want_iou.mean(), rtol=1e-6)

    acc, mean_acc = per_class_accuracy(jnp.asarray(cm))
    want_acc = np.diag(cm) / np.maximum(cm.sum(1), 1)
    np.testing.assert_allclose(np.asarray(acc), want_acc, rtol=1e-6)

    oa = overall_accuracy(jnp.asarray(cm))
    np.testing.assert_allclose(
        float(oa), np.diag(cm).sum() / cm.sum(), rtol=1e-6)


def test_precision_recall_f1(rng):
    C = 4
    preds = rng.integers(1, C + 1, size=400)
    labels = rng.integers(1, C + 1, size=400)
    cm = _oracle_cm(preds, labels, C).astype(np.float64)
    p, r, f1 = precision_recall_f1(jnp.asarray(cm))
    tp = np.diag(cm)
    want_p = np.mean(tp / np.maximum(tp + cm.sum(0) - tp, 1))
    want_r = np.mean(tp / np.maximum(tp + cm.sum(1) - tp, 1))
    np.testing.assert_allclose(float(p), want_p, rtol=1e-5)
    np.testing.assert_allclose(float(r), want_r, rtol=1e-5)
    np.testing.assert_allclose(
        float(f1), 2 * want_p * want_r / max(want_p + want_r, 1e-6),
        rtol=1e-5)


def test_evaluate_dict_shapes(rng):
    C = 16
    preds = rng.integers(1, C + 1, size=100)
    labels = rng.integers(1, C + 1, size=100)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), C)
    m = evaluate_from_confusion(cm, 10.0, 50, 100, 5)
    assert set(m) == {
        "loss", "overall_acc", "iou_per_class", "mean_iou",
        "per_class_acc", "mean_per_class_acc", "precision", "recall", "f1",
    }
    assert m["iou_per_class"].shape == (C,)


def test_confusion_additivity(rng):
    # the psum/batch-accumulation property: cm(a) + cm(b) == cm(a ∪ b)
    C = 6
    p1, l1 = rng.integers(1, C + 1, size=(2, 100))
    p2, l2 = rng.integers(1, C + 1, size=(2, 150))
    cm1 = np.asarray(confusion_matrix(jnp.asarray(p1), jnp.asarray(l1), C))
    cm2 = np.asarray(confusion_matrix(jnp.asarray(p2), jnp.asarray(l2), C))
    cm = np.asarray(confusion_matrix(
        jnp.asarray(np.concatenate([p1, p2])),
        jnp.asarray(np.concatenate([l1, l2])), C))
    np.testing.assert_array_equal(cm1 + cm2, cm)
