"""jit-compiled train/eval loops.

Rebuilds the reference orchestration (utils/train.py:13-158,
utils/test.py:12-89) TPU-first: one donated-state jit step per batch
(forward + loss + backward + optimizer fused into a single XLA program),
frozen ViT feature extraction as its own jit function, metrics accumulated
as confusion matrices on device, best-val-accuracy checkpointing via Orbax.

The reference's per-step structure — 6 sequential per-view encoder calls
with CPU round-trips (train.py:71-77, camera.py:59-60), per-sample Python
voxelization (lidar.py:45-61) — is collapsed into two compiled calls:
``encode_fn`` (all views at once) and ``step_fn``.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dssf.losses import CELSLoss
from tpu3dssf.metrics import (
    confusion_matrix,
    evaluate_from_confusion,
    format_metrics,
)
from tpu3dssf.train.checkpoint import save_checkpoint
from tpu3dssf.utils.logging import MetricLogger, NullLogger


def make_image_encode_fn(vit_model, vit_params, encoder_hw,
                         compute_dtype=jnp.float32, looped=False):
    """Encode fn: raw images (B, N_cam, H, W, 3) uint8 → patch tokens.

    The ViT is frozen (reference excludes it from the optimizer,
    SURVEY.md §3.1 note), so its params are closure constants and the
    whole 6-view batch is one forward. ``looped=True`` dispatches the
    transformer per layer (models/vit.py make_looped_encode) instead of
    jitting it as one program — required for ViT-L where the one-program
    encode exceeds this environment's AOT compiler (PERF.md "ViT-L").
    """
    from tpu3dssf.models.vit import make_looped_encode, preprocess_images

    if looped:
        enc = make_looped_encode(vit_model.config, vit_params)

        @jax.jit
        def pre(images):
            B, n_cam = images.shape[:2]
            x = preprocess_images(images, encoder_hw, dtype=compute_dtype)
            return x.reshape((B * n_cam,) + x.shape[2:])

        def encode(images):
            B, n_cam = images.shape[:2]
            tokens = enc(pre(images))
            return tokens.reshape(B, n_cam, tokens.shape[1],
                                  tokens.shape[2])

        return encode

    @jax.jit
    def encode(images):
        B, n_cam = images.shape[:2]
        x = preprocess_images(images, encoder_hw, dtype=compute_dtype)
        x = x.reshape((B * n_cam,) + x.shape[2:])
        out = vit_model.apply(vit_params, x)
        tokens = out["patch_features"]
        return tokens.reshape(B, n_cam, tokens.shape[1], tokens.shape[2])

    return encode


def make_train_step(loss_fn: CELSLoss, dropout_rng=None,
                    grad_accum: int = 1):
    """``dropout_rng``: base PRNGKey enabling stochastic-depth/drop-path
    (folded with the step counter per batch); None → deterministic.

    ``grad_accum > 1`` splits the batch's leading dim into that many
    sequential microbatches under ``lax.scan`` and averages their
    gradients before the single optimizer update — the same update a
    ``grad_accum``-way data-parallel mesh computes (mean of per-shard
    gradients), at one microbatch's activation memory. The logged loss
    is the mean of microbatch losses; per-microbatch weighted-CE
    denominators and Lovász class presence make it differ from the
    whole-batch loss exactly as per-device DDP losses do.
    """

    def make_loss(state):
        def compute_loss(params, batch, patch_tokens, micro_idx):
            kwargs = {}
            if dropout_rng is not None:
                kwargs = dict(
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(
                        dropout_rng, state.step * grad_accum + micro_idx)})
            logits = state.apply_fn(
                params, batch["points"], batch["point_valid"],
                patch_tokens, batch["cam_intrinsics"], batch["lidar2cam"],
                **kwargs)
            out = loss_fn(logits, batch["labels"], batch["mask"])
            return out.total, out
        return compute_loss

    def apply_update(state, grads, value):
        # value= feeds ReduceLROnPlateau (ignored by other schedulers);
        # plain flax TrainStates (no value kwarg) still work
        try:
            return state.apply_gradients(grads=grads, value=value)
        except TypeError:
            return state.apply_gradients(grads=grads)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, patch_tokens):
        compute_loss = make_loss(state)

        if grad_accum == 1:
            (_, out), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(
                state.params, batch, patch_tokens, 0)
            metrics = {
                "loss": out.total,
                "ce": out.ce,
                "lovasz": out.lovasz,
                "correct": out.num_correct,
                "valid": out.num_valid,
            }
            return apply_update(state, grads, out.total), metrics

        def split(x):
            if x.shape[0] % grad_accum:
                raise ValueError(
                    f"batch dim {x.shape[0]} not divisible by "
                    f"grad_accum={grad_accum}")
            return x.reshape((grad_accum, x.shape[0] // grad_accum)
                             + x.shape[1:])

        mb = jax.tree.map(split, batch)
        mt = (None if patch_tokens is None
              else jax.tree.map(split, patch_tokens))

        def micro(carry, xs):
            g_acc, sums, i = carry
            b, t = xs
            (_, out), g = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params, b, t, i)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            sums = {
                "loss": sums["loss"] + out.total,
                "ce": sums["ce"] + out.ce,
                "lovasz": sums["lovasz"] + out.lovasz,
                "correct": sums["correct"] + out.num_correct,
                "valid": sums["valid"] + out.num_valid,
            }
            return (g_acc, sums, i + 1), None

        init = (
            jax.tree.map(jnp.zeros_like, state.params),
            {"loss": jnp.float32(0), "ce": jnp.float32(0),
             "lovasz": jnp.float32(0), "correct": jnp.int32(0),
             "valid": jnp.int32(0)},
            jnp.int32(0),
        )
        (g_acc, sums, _), _ = jax.lax.scan(micro, init, (mb, mt))
        inv = 1.0 / grad_accum
        grads = jax.tree.map(lambda g: g * inv, g_acc)
        metrics = {
            "loss": sums["loss"] * inv,
            "ce": sums["ce"] * inv,
            "lovasz": sums["lovasz"] * inv,
            "correct": sums["correct"],
            "valid": sums["valid"],
        }
        return apply_update(state, grads, metrics["loss"]), metrics

    return train_step


def make_eval_step(loss_fn: CELSLoss, num_classes: int):
    @jax.jit
    def eval_step(state, batch, patch_tokens):
        logits = state.apply_fn(
            state.params, batch["points"], batch["point_valid"],
            patch_tokens, batch["cam_intrinsics"], batch["lidar2cam"])
        out = loss_fn(logits, batch["labels"], batch["mask"])
        cm = confusion_matrix(
            out.predictions, batch["labels"], num_classes, out.valid)
        return {
            "loss": out.total,
            "ce": out.ce,
            "lovasz": out.lovasz,
            "correct": out.num_correct,
            "valid": out.num_valid,
            "confusion": cm,
        }

    return eval_step


def _device_batch(batch, encode_fn, zero_tokens_fn=None):
    """Split host batch into (model inputs, patch tokens)."""
    images = batch.pop("images", None)
    if encode_fn is not None and images is not None:
        tokens = encode_fn(images)
    elif zero_tokens_fn is not None:
        tokens = zero_tokens_fn(batch)
    else:
        tokens = None
    return batch, tokens


class MetricAccumulator:
    """Device-side eval-metric sums, folded to host int64 periodically.

    Per-batch sums stay ON DEVICE and are folded into host int64/float
    accumulators every ``fold_every`` batches: a float()/int() per batch
    would host-sync every iteration and stop consecutive batches from
    overlapping on device (PERF.md "Batching": B=1 throughput lives on
    that overlap), while a full-split device sum overflows int32 — a
    28k-frame nuScenes split reaches ~1e9 of the 2.1e9 range. One sync
    per 256-batch window keeps the overlap and stays far from overflow
    (tests/test_loop_accumulators.py).
    """

    def __init__(self, num_classes: int, fold_every: int = 256):
        self.fold_every = fold_every
        self.it = 0
        self._cm_h = np.zeros((num_classes, num_classes), np.int64)
        self._loss_h, self._correct_h, self._valid_h = 0.0, 0, 0
        self._cm = self._loss = self._correct = self._valid = None

    def add(self, m: Dict):
        """Accumulate one eval_step metrics dict (stays on device)."""
        loss = m["loss"].astype(jnp.float32)
        cor = m["correct"].astype(jnp.int32)
        val = m["valid"].astype(jnp.int32)
        if self._cm is None:
            self._cm, self._loss = m["confusion"], loss
            self._correct, self._valid = cor, val
        else:
            self._cm = self._cm + m["confusion"]
            self._loss = self._loss + loss
            self._correct = self._correct + cor
            self._valid = self._valid + val
        self.it += 1
        if self.it % self.fold_every == 0:
            self._fold()

    def _fold(self):
        if self._cm is not None:
            self._cm_h = self._cm_h + np.asarray(self._cm, np.int64)
            self._loss_h += float(self._loss)
            self._correct_h += int(self._correct)
            self._valid_h += int(self._valid)
            self._cm = self._loss = self._correct = self._valid = None

    def metrics(self) -> Dict:
        """Final reference ``evaluate`` dict (host numpy; syncs device).

        Hands the metric derivation floats: jnp under x32 raises
        OverflowError on Python ints > 2^31 and silently WRAPS an int64
        confusion matrix; the metrics cast to f32 internally anyway,
        and f32 rounding on ~1e9 counts is a ~1e-7 relative error.
        """
        self._fold()
        return jax.tree.map(
            lambda x: np.asarray(x),
            evaluate_from_confusion(
                self._cm_h.astype(np.float32), self._loss_h,
                float(self._correct_h), float(self._valid_h),
                max(self.it, 1)))


def evaluate_model(state, pipeline_iter, eval_step, encode_fn,
                   num_classes: int, zero_tokens_fn=None,
                   logger: Optional[MetricLogger] = None,
                   verbose: bool = True):
    """Full-split evaluation → the reference ``evaluate`` metrics dict."""
    acc = MetricAccumulator(num_classes)
    for batch in pipeline_iter:
        batch, tokens = _device_batch(batch, encode_fn, zero_tokens_fn)
        acc.add(eval_step(state, batch, tokens))
    metrics = acc.metrics()
    if verbose:
        print(format_metrics(metrics))
    if logger is not None and not isinstance(logger, NullLogger):
        logger.log({f"eval/{k}": v for k, v in metrics.items()
                    if np.ndim(v) == 0})
    return metrics


def train_model(state, dataloaders: Dict, loss_fn: CELSLoss,
                encode_fn, num_classes: int, num_epochs: int,
                save_dir: Optional[str] = None,
                logger: Optional[MetricLogger] = None,
                zero_tokens_fn: Optional[Callable] = None,
                log_every: int = 10,
                profile_dir: Optional[str] = None,
                profile_steps: tuple = (10, 13),
                start_epoch: int = 0,
                best_acc: float = -1.0,
                dropout_rng=None,
                grad_accum: int = 1):
    """Epoch loop with best-val-acc Orbax checkpointing.

    Mirrors reference train_model's contract (utils/train.py:13):
    returns (train_acc_history, val_acc_history) and leaves ``state``
    holding the final params; the best-by-val-accuracy state is saved
    under ``save_dir``.
    """
    logger = logger or NullLogger()
    train_step = make_train_step(loss_fn, dropout_rng, grad_accum)
    eval_step = make_eval_step(loss_fn, num_classes)

    tr_hist, val_hist = [], []
    # full per-epoch record -> <save_dir>/training_history.json (the
    # reference commits training_history.png only; we keep the numbers)
    history = []
    global_step = 0

    for epoch in range(start_epoch, num_epochs):
        print(f"Epoch {epoch}/{num_epochs - 1}\n" + "-" * 20)

        # ---- train phase ----
        # Per-step metrics stay ON DEVICE and are materialized only at
        # ``log_every`` boundaries: a float() per step would host-sync
        # every step, and on a tunneled transport that adds a full RTT
        # (~25-30 ms here) to each ~100 ms step. The reference logs to
        # wandb every step (utils/train.py:110-116); we log the same
        # running averages at window granularity instead — a documented
        # TPU-first divergence. Window sums are exact: ≤ log_every
        # steps of int32 counts fold into python ints per window.
        run_loss, run_correct, run_valid, it = 0.0, 0, 0, 0
        win_loss = win_correct = win_valid = None
        t0 = time.perf_counter()

        def fold_window():
            nonlocal run_loss, run_correct, run_valid
            nonlocal win_loss, win_correct, win_valid
            if win_loss is not None:
                run_loss += float(win_loss)
                run_correct += int(win_correct)
                run_valid += int(win_valid)
                win_loss = win_correct = win_valid = None

        for batch in dataloaders["train"]:
            # optional jax.profiler capture around a step window
            if profile_dir and global_step == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and global_step == profile_steps[1]:
                jax.profiler.stop_trace()
                print(f"[profiler] trace written to {profile_dir}")
            batch, tokens = _device_batch(batch, encode_fn, zero_tokens_fn)
            state, m = train_step(state, batch, tokens)
            loss32 = m["loss"].astype(jnp.float32)
            cor32 = m["correct"].astype(jnp.int32)
            val32 = m["valid"].astype(jnp.int32)
            if win_loss is None:
                win_loss, win_correct, win_valid = loss32, cor32, val32
            else:
                win_loss = win_loss + loss32
                win_correct = win_correct + cor32
                win_valid = win_valid + val32
            it += 1
            global_step += 1
            if it % log_every == 0:
                fold_window()
                dt = (time.perf_counter() - t0) / it
                print(f"  [train {it}] loss={run_loss/it:.4f} "
                      f"acc={run_correct/max(run_valid,1):.4f} "
                      f"({dt*1000:.0f} ms/step)")
                logger.log({
                    "train/loss": run_loss / it,
                    "train/acc": run_correct / max(run_valid, 1),
                    "step": global_step,
                })
        fold_window()
        tr_acc = run_correct / max(run_valid, 1)
        tr_hist.append(tr_acc)

        # ---- val phase ----
        metrics = evaluate_model(
            state, dataloaders["val"], eval_step, encode_fn, num_classes,
            zero_tokens_fn=zero_tokens_fn)
        val_acc = float(metrics["overall_acc"])
        val_hist.append(val_acc)
        # device-memory high-water mark (0.0 on backends without stats):
        # the datum batching/remat decisions need (VERDICT r3 task 8)
        from tpu3dssf.utils.timing import peak_hbm_mb
        hbm_mb = peak_hbm_mb()
        if hbm_mb:
            print(f"  peak HBM: {hbm_mb:,.0f} MiB")
        history.append({
            "epoch": epoch,
            "train_loss": run_loss / max(it, 1),
            "train_acc": tr_acc,
            "peak_hbm_mb": hbm_mb,
            **{k: (v.tolist() if np.ndim(v) else float(v))
               for k, v in metrics.items()},
        })
        logger.log({
            "val/loss": float(metrics["loss"]),
            "val/acc": val_acc,
            "val/mean_IoU": float(metrics["mean_iou"]),
            "val/mean_per_class_acc": float(metrics["mean_per_class_acc"]),
            "val/precision": float(metrics["precision"]),
            "val/recall": float(metrics["recall"]),
            "val/f1": float(metrics["f1"]),
            "epoch": epoch,
            "peak_hbm_mb": hbm_mb,
        })

        if val_acc > best_acc:
            best_acc = val_acc
            if save_dir:
                save_checkpoint(save_dir, epoch, state,
                                extra={"best_acc": float(best_acc),
                                       "epoch": epoch})
        if save_dir:
            # preemption-safe: full train state every epoch under last/
            # (the reference saves best weights only and restarts the
            # schedule on resume, SURVEY.md §5 checkpoint notes)
            save_checkpoint(f"{save_dir}/last", epoch, state,
                            extra={"best_acc": float(best_acc),
                                   "epoch": epoch})

    if save_dir:
        import json
        import os
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "training_history.json"),
                  "w") as f:
            json.dump({"best_val_acc": float(best_acc),
                       "epochs": history}, f, indent=1)
    print(f"Best val Acc: {best_acc:.4f}")
    return tr_hist, val_hist
