"""evaluate_model's device→host accumulator folding.

The eval loop sums per-batch metrics on device in int32 and folds them
into host int64/float accumulators every FOLD_EVERY batches (loop.py
``evaluate_model``). These tests drive the loop with a fake eval_step
over enough batches to (a) cross the mid-loop fold boundary and (b) push
the split totals past int32 range — the regime of a full 28k-frame
nuScenes split (reference utils/test.py:12-89 accumulates the same
statistics, in python lists). Guards two real failure modes: jnp under
x32 raises OverflowError on Python ints > 2^31, and silently WRAPS an
int64 array converted to int32.
"""

import numpy as np
import jax.numpy as jnp

from tpu3dssf.train.loop import evaluate_model

C = 4  # classes


def _run(n_batches, correct_per, valid_per, cm_cell_per):
    """Drive evaluate_model with constant fake per-batch metrics."""
    cm = np.zeros((C, C), np.int32)
    cm[0, 0] = cm_cell_per            # diagonal hit → exercises IoU/acc
    cm[1, 2] = cm_cell_per // 2       # off-diagonal → confusion counted

    def eval_step(state, batch, tokens):
        assert tokens is None
        return {
            "loss": jnp.float32(0.5),
            "ce": jnp.float32(0.4),
            "lovasz": jnp.float32(0.1),
            "correct": jnp.int32(correct_per),
            "valid": jnp.int32(valid_per),
            "confusion": jnp.asarray(cm),
        }

    batches = ({"dummy": i} for i in range(n_batches))
    return evaluate_model(state=None, pipeline_iter=batches,
                          eval_step=eval_step, encode_fn=None,
                          num_classes=C, verbose=False)


def test_fold_crosses_window_boundary_exactly():
    # 600 > 2×FOLD_EVERY(256): two mid-loop folds plus a final partial.
    m = _run(600, correct_per=3, valid_per=7, cm_cell_per=5)
    assert float(m["loss"]) == np.float32(0.5)
    np.testing.assert_allclose(float(m["overall_acc"]), 600 * 3 / (600 * 7),
                               rtol=1e-6)
    # cm[0,0]=3000 of row 0 → per-class acc 1.0 for class 0
    np.testing.assert_allclose(np.asarray(m["per_class_acc"])[0], 1.0)


def test_split_totals_past_int32_stay_exact():
    # Per-batch counts sized so one 256-batch device window stays inside
    # int32 (256 × 7e6 ≈ 1.8e9 < 2^31) but the split total does not
    # (600 × 7e6 = 4.2e9 > 2^31) — the full-split overflow the host fold
    # exists to prevent. cm cells likewise exceed int32 in total.
    m = _run(600, correct_per=3_000_000, valid_per=7_000_000,
             cm_cell_per=6_000_000)
    total_c, total_v = 600 * 3_000_000, 600 * 7_000_000
    assert total_v > np.iinfo(np.int32).max  # the test is in the regime
    np.testing.assert_allclose(float(m["overall_acc"]), total_c / total_v,
                               rtol=1e-6)
    # int64 cm total (3.6e9) must not wrap: class-0 IoU is exactly
    # diag/(row+col−diag) = 3.6e9/3.6e9 = 1.0 iff no wraparound.
    np.testing.assert_allclose(np.asarray(m["iou_per_class"])[0], 1.0)
    # overall acc over the cm-independent counters is the headline
    # number the reference reports (evaluation.py:59-62)
    assert 0.42 < float(m["overall_acc"]) < 0.43
