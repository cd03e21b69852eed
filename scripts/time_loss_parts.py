"""Attribute the CE+Lovász loss forward at exact train shapes.

The loss is a first-order train-step cost (the round-4a argsort+gather
formulation measured 41.7 ms fwd at B=2 — scripts/attr_bwd.py). This
times each piece at N = B*P = 69,632 flattened points, C = 16:

    python scripts/time_loss_parts.py      # real TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.losses import CELSLoss, lovasz_softmax, \
        weighted_cross_entropy
    from tpu3dssf.utils.timing import time_device

    B, P, C = 2, 34816, 16
    N = B * P
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 17, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(-1, C)
    labels0 = jnp.clip(labels - 1, 0, C - 1).reshape(-1)
    valid = (labels != 0).reshape(-1)
    validf = valid.astype(jnp.float32)

    def tb(name, fn, *args, iters=40):
        dt = time_device(fn, *args, iters=iters)
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt * 1e3

    # pieces (mirror the lovasz_softmax internals)
    def mk_errors(pr):
        fgf = jnp.where(valid[None, :],
                        (labels0[None, :] == jnp.arange(C)[:, None]),
                        False).astype(jnp.float32)
        return jnp.where(valid[None, :], jnp.abs(fgf - pr.T), 0.0), fgf

    tb("errors construction ((N,C).T + abs)",
       lambda pr: mk_errors(pr)[0], probs)

    errors, fgf = mk_errors(probs)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (C, N))
    vbc = jnp.broadcast_to(validf, (C, N))

    def sort2(e):
        return jax.vmap(lambda k, i: jax.lax.sort((k, i), num_keys=1))(
            -e, iota)

    def sort4(e):
        return jax.vmap(
            lambda k, i, f, v: jax.lax.sort((k, i, f, v), num_keys=1))(
            -e, iota, fgf, vbc)

    tb("batched sort, 2 operands (key+iota)", sort2, errors)
    tb("batched sort, 4 operands (+fg,valid)", sort4, errors)

    _, perm, fg_s, valid_s = sort4(errors)

    def cumsums(f, v):
        gts = jnp.sum(f, axis=1, keepdims=True)
        inter = gts - jnp.cumsum(f, axis=1)
        union = gts + jnp.cumsum(1.0 - f, axis=1) \
            - jnp.cumsum(1.0 - v, axis=1)
        jac = 1.0 - inter / jnp.maximum(union, 1e-12)
        return jnp.concatenate([jac[:, :1], jac[:, 1:] - jac[:, :-1]], 1)

    tb("cumsums + jaccard + diff (3x (C,N))", cumsums, fg_s, valid_s)
    grad = cumsums(fg_s, valid_s)

    tb("unsort scatter (C,N)",
       jax.vmap(lambda g, p: jnp.zeros_like(g).at[p].set(g)), grad, perm)

    # the shipped unsort: second 2-operand key-sort by perm
    tb("unsort key-sort (C,N) 2-operand",
       jax.vmap(lambda g, p: jax.lax.sort((p, g), num_keys=1)[1]),
       grad, perm)

    # lane-axis gather for contrast (the round-4a formulation's cost)
    tb("take_along_axis (C,N) LANE-axis gather",
       lambda f, p: jnp.take_along_axis(f, p, axis=1), fgf, perm,
       iters=10)

    # full pieces
    tb("lovasz_softmax fwd", lovasz_softmax, probs, labels0, valid)
    tb("lovasz fwd+bwd",
       lambda pr: jax.value_and_grad(
           lambda q: lovasz_softmax(q, labels0, valid))(pr), probs)
    tb("weighted CE fwd",
       lambda lg: weighted_cross_entropy(
           lg, jnp.clip(labels - 1, 0, C - 1), (labels != 0) & mask),
       logits)

    loss_fn = CELSLoss(weight=np.ones(16, np.float32))
    tb("CELSLoss total fwd", lambda lg: loss_fn(lg, labels, mask).total,
       logits)
    tb("CELSLoss total fwd+bwd",
       lambda lg: jax.value_and_grad(
           lambda q: loss_fn(q, labels, mask).total)(lg), logits)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
