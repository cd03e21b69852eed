"""Train state + optimizer/scheduler factory (optax).

Rebuilds the reference's optimizer selection (main_train.py:81-86:
AdamW | Adam | SGD(momentum)) and — unlike the reference — actually wires
the ``lr_scheduler`` key it declares but never constructs
(nuscenesTestConfig22.yaml:74; SURVEY.md §5 dead-key list). ``nesterov``
reaches SGD here (the reference drops it, main_train.py:86).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState whose ``apply_gradients`` can thread a loss value
    into the optimizer (``optax.contrib.reduce_on_plateau`` requires a
    ``value`` kwarg at every update; flax's base class never forwards
    kwargs to ``tx.update``)."""

    def apply_gradients(self, *, grads, value=None, **kwargs):
        if value is None:
            return super().apply_gradients(grads=grads, **kwargs)
        # create_optimizer always wraps the chain in
        # with_extra_args_support, so passing value is safe for every
        # scheduler; transforms that don't consume it ignore it.
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params, value=value)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, **kwargs)


def create_schedule(name: str, base_lr: float, steps_per_epoch: int,
                    num_epochs: int, step_size: int = 10,
                    gamma: float = 0.1, t0: int = 10, t_mult: int = 2):
    """optax schedule for the reference's lr_scheduler names."""
    total = max(1, steps_per_epoch * num_epochs)
    if name in ("none", None, ""):
        return base_lr
    if name == "StepLR":
        return optax.exponential_decay(
            base_lr, transition_steps=step_size * steps_per_epoch,
            decay_rate=gamma, staircase=True)
    if name == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(base_lr, decay_steps=total)
    if name == "CosineAnnealingWarmRestarts":
        return optax.sgdr_schedule([
            dict(init_value=base_lr, peak_value=base_lr,
                 decay_steps=t0 * steps_per_epoch * (t_mult ** i),
                 warmup_steps=0, end_value=0.0)
            for i in range(4)
        ])
    if name == "ReduceLROnPlateau":
        # handled by chaining contrib.reduce_on_plateau in create_optimizer
        return base_lr
    raise ValueError(f"unknown lr_scheduler: {name}")


def _finite_value_plateau(**kwargs) -> optax.GradientTransformationExtraArgs:
    """``optax.contrib.reduce_on_plateau`` that tolerates non-finite
    ``value``.

    ``apply_if_finite`` (the ``skip_nonfinite`` containment) skips the
    *parameter update* for a NaN/Inf batch, but the plateau scheduler
    sits outside that wrapper and would still average the raw batch loss
    — one NaN batch per epoch would NaN the epoch average, count as "no
    improvement" forever, and decay the LR toward 0 despite healthy
    training. A non-finite batch is made entirely invisible here: the
    accumulator state passes through unchanged (no count increment, no
    average pollution, no plateau decision) and the updates are scaled
    by the CURRENT scale — so an epoch's plateau decision sees exactly
    its finite batches (the accumulation window simply stretches by one
    step per bad batch).

    Version coupling: this reaches into ``ReduceLROnPlateauState``
    internals (``count``, ``avg_value``, ``scale``) — correct on the
    pinned optax 0.2.x; asserted at init time so a contrib-state field
    rename on upgrade fails loudly at construction, not mid-training.
    """
    inner = optax.contrib.reduce_on_plateau(**kwargs)

    def init_fn(params):
        state = inner.init(params)
        for field in ("count", "avg_value", "best_value", "scale"):
            if not hasattr(state, field):
                raise AttributeError(
                    "optax.contrib.ReduceLROnPlateauState no longer has "
                    f"field {field!r}; _finite_value_plateau needs "
                    "updating for this optax version")
        return state

    def update_fn(updates, state, params=None, *, value, **extra):
        finite = jnp.isfinite(value)
        # keep NaN/Inf out of the inner computation even though its
        # result is discarded on the non-finite branch (cheap insurance)
        safe = jnp.where(finite, value, state.avg_value)
        new_updates, new_state = inner.update(updates, state, params,
                                              value=safe, **extra)
        kept_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_state, state)
        kept_updates = jax.tree.map(
            lambda new, g: jnp.where(finite, new, state.scale * g),
            new_updates, updates)
        return kept_updates, kept_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def create_optimizer(name: str, learning_rate, weight_decay: float = 0.0,
                     momentum: float = 0.9, nesterov: bool = False,
                     lr_scheduler: str = "none",
                     steps_per_epoch: int = 1, num_epochs: int = 1,
                     grad_clip: Optional[float] = None,
                     skip_nonfinite: bool = False):
    schedule = create_schedule(lr_scheduler, learning_rate,
                               steps_per_epoch, num_epochs)
    if name == "AdamW":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif name == "Adam":
        # torch Adam applies weight_decay as L2 into the gradient
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay)
            if weight_decay else optax.identity(),
            optax.adam(schedule),
        )
    elif name == "SGD":
        tx = optax.sgd(schedule, momentum=momentum, nesterov=nesterov)
    else:
        raise ValueError(f"unknown optimizer: {name}")

    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(tx)
    out = optax.chain(*parts) if len(parts) > 1 else parts[0]
    if skip_nonfinite:
        # failure containment: silently skip updates whose grads contain
        # NaN/Inf (up to 100 consecutive) instead of corrupting params —
        # the reference has no fault handling at all (SURVEY.md §5)
        out = optax.apply_if_finite(out, max_consecutive_errors=100)
    if lr_scheduler == "ReduceLROnPlateau":
        # chained OUTSIDE apply_if_finite: that wrapper's update doesn't
        # forward extra args, and reduce_on_plateau *requires* ``value``.
        # The train step passes the PER-BATCH loss every update;
        # accumulation_size averages one epoch of them before each
        # plateau decision, so patience=10 means "10 epochs without
        # improvement" (torch-conventional; per-step decisions on noisy
        # batch losses would let one lucky batch set best_value and
        # then decay lr to ~0 within hundreds of steps)
        out = optax.chain(optax.with_extra_args_support(out),
                          _finite_value_plateau(
                              factor=0.1, patience=10,
                              accumulation_size=max(1, steps_per_epoch)))
    # the train step always passes value= (TrainState.apply_gradients);
    # make every chain accept-and-ignore it
    return optax.with_extra_args_support(out)


def create_train_state(model, params, optimizer) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=optimizer)
