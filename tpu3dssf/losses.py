"""Weighted Cross-Entropy + Lovász-Softmax, masked and jit-able.

Rebuilds the reference ``CELSLoss`` (utils/losses.py:7-70) and the
LovaszSoftmax submodule's ``lovasz_softmax_flat`` without any dynamic
shapes: instead of boolean-indexing valid points (losses.py:45-57), every
reduction carries a weight/validity mask, so the whole loss compiles under
``jit`` and reduces with ``psum`` across data-parallel shards.

Contract preserved:
  * valid = collate mask ∧ (label != ignore_index) — both the padding mask
    and the noise class 0 are excluded (losses.py:53-57 with the mask
    built at dataloader.py:236-239);
  * CE on labels shifted to [0, C-1] with per-class weights
    (losses.py:60);
  * Lovász-Softmax on softmax probabilities of the valid points, labels
    shifted likewise, mean over classes *present* in the batch
    (losses.py:63; LovaszSoftmax submodule semantics);
  * total = ce + λ·lovász (losses.py:68);
  * predictions returned as argmax+1 in [1, C] (losses.py:66).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LossOutput(NamedTuple):
    total: jax.Array       # () scalar
    ce: jax.Array          # ()
    lovasz: jax.Array      # ()
    predictions: jax.Array  # (B, P) int32 in [1, C]; 0 where invalid
    valid: jax.Array       # (B, P) bool — points that entered the loss
    num_valid: jax.Array   # () int32
    num_correct: jax.Array  # () int32


def weighted_cross_entropy(logits, labels0, valid, class_weights=None):
    """Mean weighted CE over valid entries; labels0 already in [0, C-1].

    Matches ``nn.CrossEntropyLoss(weight=w)`` semantics: the mean is
    weighted — sum(w_y * nll) / sum(w_y) over valid entries.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels0[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[labels0]
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def lovasz_softmax(probs, labels0, valid, exact_sort: bool = False):
    """Masked Lovász-Softmax over flattened points, mean over present classes.

    probs: (N, C) softmax probabilities; labels0: (N,) in [0, C-1];
    valid: (N,) bool. Invalid entries get error 0 / fg 0 and sort last, so
    they contribute nothing to any class's Jaccard extension.

    exact_sort=False (default) quantizes the sort KEY to 13 bits and
    packs it above the 18-bit (iota*2+fg) payload, so the first batched
    sort carries ONE int32 operand instead of two (sort cost scales
    with operand count — scripts/time_loss_parts.py). Only the ORDER is
    quantized — the loss dot uses exact errors, and the Jaccard
    gradient is piecewise-constant in rank, so the perturbation is
    bounded by reorderings among errors within 1/8191 of each other
    (measured |Δloss| ≲ 1e-7 at train shapes). exact_sort=True keeps
    the f32-keyed 2-operand sort (bit-exact reference rank order).

    The packed path requires the payload to fit its 18 bits: 2N−1 ≤
    2^18−1, i.e. N ≤ 131,072 (covers B ≤ 3 at the 34.8k point
    capacity). Larger flattened batches fall back STATICALLY to the
    exact 2-operand sort — N is a trace-time constant, so the branch
    costs nothing under jit. Without the guard the key and payload
    bits overlap and the loss corrupts silently
    (tests/test_losses.py::test_lovasz_large_n_guard).
    """
    probs = probs.astype(jnp.float32)
    N, C = probs.shape
    validf = valid.astype(jnp.float32)

    # The ONLY gradient path is probs → errors → loss: fg and valid are
    # label constants, and the sort order is piecewise-constant in
    # probs (identical-a.e. semantics to differentiating lax.sort). So:
    #  * ONE batched 2-operand value-sort (descending by the DETACHED
    #    error) carries iota-with-fg-packed-in-bit-0 along — no
    #    take_along_axis anywhere. Reordering fg by lane-axis gathers
    #    (round-4a) cost 41.7 ms fwd at train shapes: gathers addressed
    #    along the LANE axis run ~100x slow on TPU (CLAUDE.md trap 7);
    #  * the Lovász gradient `grad` is computed in sorted order from
    #    those constants, then UNSORTED with a second key-sort (below),
    #    making the loss a plain dot:  Σ_i errors[perm[i]]·grad[i]
    #                                = Σ_j errors[j]·grad_u[j].
    #    Its backward is ELEMENTWISE in errors — no gather, no scatter,
    #    no sort transpose (differentiating the value-sort instead made
    #    XLA emit a 5.3 ms (C, N) scatter-add per step, PERF.md r3).
    fg = jnp.where(valid[None, :],
                   (labels0[None, :] == jnp.arange(C)[:, None]), False)
    fgf = fg.astype(jnp.float32)                       # (C, N)
    errors = jnp.where(valid[None, :],
                       jnp.abs(fgf - probs.T), 0.0)    # (C, N)

    # validity needs NO carried operand: invalid entries have error
    # exactly 0 and every position that CONTRIBUTES (errors > 0 — zero-
    # error positions multiply grad_u by 0 below) is preceded only by
    # error ≥ itself > 0, i.e. only by valid entries — so the valid-
    # prefix count at any contributing position is just position+1.
    # That drops the sort to 3 operands and three cumsums to one.
    # fg is ONE BIT, so it rides inside the iota operand (iota*2+fg):
    # the batched sort carries 2 operands, not 3 (sort cost scales with
    # operand count — measured in scripts/time_loss_parts.py). Packing
    # preserves stability: packed is strictly increasing in position, so
    # equal-key ties keep the same order the separate iota gave.
    packed = (jnp.arange(N, dtype=jnp.int32) * 2)[None, :] + \
        fg.astype(jnp.int32)
    if exact_sort or N > (1 << 17):
        # 2-operand exact sort — also the REQUIRED route once the
        # payload outgrows 18 bits (N > 131,072): packing would bleed
        # iota bits into the quantized key and corrupt the order.
        _, packed_s = jax.vmap(
            lambda k, i: jax.lax.sort((k, i), num_keys=1)
        )(-jax.lax.stop_gradient(errors), packed)
    else:
        # one-operand sort: 13-bit descending-error key ABOVE the
        # payload (8191·2^18 + 2N−1 < 2^31, so the packed value stays a
        # non-negative int32 and unsigned/signed order agree); ties
        # break ascending in the payload = the stability the 2-operand
        # sort had. packed_s below is the LOW 18 bits.
        q = (8191.0 - jnp.round(
            jax.lax.stop_gradient(errors) * 8191.0)).astype(jnp.int32)
        vs = jax.vmap(lambda x: jax.lax.sort((x,), num_keys=1)[0])(
            (q << 18) | packed)
        packed_s = vs & 0x3FFFF
    fg_s = (packed_s & 1).astype(jnp.float32)

    gts = jnp.sum(fg_s, axis=1, keepdims=True)         # (C, 1)
    cfg = jnp.cumsum(fg_s, axis=1)
    inter = gts - cfg
    union = gts + (jnp.arange(1, N + 1, dtype=jnp.float32)[None, :]
                   - cfg)
    jaccard = 1.0 - inter / jnp.maximum(union, 1e-12)
    # lovasz gradient: first element as-is, then differences
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)
    # Unsort = apply perm⁻¹. Sorting (packed_s, grad) ascending by key
    # puts grad[i] at original position perm[i] (packed_s orders exactly
    # like perm: bit 0 never flips an order between distinct iotas) —
    # the same batched 2-operand sort the forward already uses, 1.7 ms
    # where the (C, N) lane-axis scatter cost 5.2 ms
    # (scripts/time_loss_parts.py on chip).
    grad_u = jax.lax.stop_gradient(jax.vmap(
        lambda k, g: jax.lax.sort((k, g), num_keys=1)[1])(packed_s, grad))
    losses = jnp.sum(errors * grad_u, axis=1)          # (C,)
    presentf = (gts[:, 0] > 0).astype(jnp.float32)
    return jnp.sum(losses * presentf) / jnp.maximum(jnp.sum(presentf), 1.0)


class CELSLoss:
    """CE + λ·Lovász with the reference's masking semantics.

    Callable like the reference module: ``loss(pred_scores, gt_labels,
    mask)`` with pred_scores (B, P, C), gt_labels (B, P) in [0, C]
    (0 = noise/padding), mask (B, P) bool.
    """

    def __init__(self, weight=None, ignore_index: int = 0,
                 lamda_lovasz: float = 1.0):
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)
        self.ignore_index = ignore_index
        self.lamda_lovasz = lamda_lovasz

    def __call__(self, pred_scores, gt_labels,
                 mask: Optional[jax.Array] = None) -> LossOutput:
        B, P, C = pred_scores.shape
        labels = gt_labels.astype(jnp.int32)
        valid = labels != self.ignore_index
        if mask is not None:
            valid = valid & mask
        labels0 = jnp.clip(labels - 1, 0, C - 1)

        ce = weighted_cross_entropy(pred_scores, labels0, valid, self.weight)

        probs = jax.nn.softmax(pred_scores.astype(jnp.float32), axis=-1)
        lov = lovasz_softmax(
            probs.reshape(-1, C), labels0.reshape(-1), valid.reshape(-1))

        total = ce + self.lamda_lovasz * lov

        preds = jnp.argmax(pred_scores, axis=-1).astype(jnp.int32) + 1
        preds = jnp.where(valid, preds, 0)
        num_valid = jnp.sum(valid.astype(jnp.int32))
        num_correct = jnp.sum(
            ((preds == labels) & valid).astype(jnp.int32))
        return LossOutput(total, ce, lov, preds, valid, num_valid,
                          num_correct)
