"""Confusion-matrix segmentation metrics, psum-reducible.

Rebuilds reference utils/evaluation.py:5-81. The confusion matrix is the
single sufficient statistic: per-shard (C, C) matrices are summed across
devices (``jax.lax.psum``) or batches, then IoU / accuracy / P / R / F1
are derived exactly as the reference does (evaluation.py:35-73).

Labels here are in [1, C] like the reference's predictions/GT at this
stage (losses return argmax+1, evaluation.py:36-37 shifts by -1).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def confusion_matrix(preds, labels, num_classes, valid=None):
    """(C, C) counts; rows = GT, cols = prediction (evaluation.py:35-42).

    preds/labels in [1, C]; ``valid`` masks entries to count.
    """
    p = preds.reshape(-1).astype(jnp.int32) - 1
    l = labels.reshape(-1).astype(jnp.int32) - 1
    idx = num_classes * jnp.clip(l, 0, num_classes - 1) + jnp.clip(
        p, 0, num_classes - 1)
    if valid is None:
        w = jnp.ones_like(idx, dtype=jnp.int32)
    else:
        w = valid.reshape(-1).astype(jnp.int32)
    cm = jax.ops.segment_sum(w, idx, num_segments=num_classes ** 2)
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm):
    """Per-class IoU + mean (evaluation.py:45-50; union clamped to ≥1)."""
    cm = cm.astype(jnp.float32)
    inter = jnp.diag(cm)
    union = cm.sum(1) + cm.sum(0) - inter
    iou = inter / jnp.maximum(union, 1.0)
    return iou, jnp.mean(iou)


def per_class_accuracy(cm):
    cm = cm.astype(jnp.float32)
    acc = jnp.diag(cm) / jnp.maximum(cm.sum(1), 1.0)
    return acc, jnp.mean(acc)


def overall_accuracy(cm):
    cm = cm.astype(jnp.float32)
    return jnp.diag(cm).sum() / jnp.maximum(cm.sum(), 1.0)


def precision_recall_f1(cm):
    """Macro P/R/F1 with the reference's clamp quirks (evaluation.py:65-73).

    Note the reference clamps per-class denominators to ≥1 *before* the
    macro mean and F1's denominator to ≥1e-6 — reproduced exactly.
    """
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    precision = jnp.mean(tp / jnp.maximum(tp + fp, 1.0))
    recall = jnp.mean(tp / jnp.maximum(tp + fn, 1.0))
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-6)
    return precision, recall, f1


def evaluate_from_confusion(cm, total_loss, total_correct, total_points,
                            iterations) -> Dict[str, jax.Array]:
    """The reference ``evaluate`` dict (evaluation.py:22-31)."""
    iou, miou = iou_from_confusion(cm)
    acc_pc, mean_acc = per_class_accuracy(cm)
    precision, recall, f1 = precision_recall_f1(cm)
    return {
        "loss": total_loss / jnp.maximum(iterations, 1),
        "overall_acc": total_correct / jnp.maximum(total_points, 1),
        "iou_per_class": iou,
        "mean_iou": miou,
        "per_class_acc": acc_pc,
        "mean_per_class_acc": mean_acc,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def format_metrics(metrics: Dict) -> str:
    """Console block matching the reference's report (evaluation.py:13-20)."""
    iou = [f"{float(v):.4f}" for v in metrics["iou_per_class"]]
    acc = [f"{float(v):.4f}" for v in metrics["per_class_acc"]]
    return (
        "\n====== EVALUATION METRICS ======\n"
        f"Loss: {float(metrics['loss']):.4f}, "
        f"Overall Acc: {float(metrics['overall_acc']):.4f}\n"
        f"Per-Class Acc: {acc}, "
        f"Mean Per-Class Acc: {float(metrics['mean_per_class_acc']):.4f}\n"
        f"Per-Class IoU: {iou}, Mean IoU: {float(metrics['mean_iou']):.4f}\n"
        f"Precision: {float(metrics['precision']):.4f}, "
        f"Recall: {float(metrics['recall']):.4f}, "
        f"F1: {float(metrics['f1']):.4f}\n"
        "=================================\n"
    )
