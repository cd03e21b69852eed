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

    # ---- round-5 floor hunt (VERDICT r4 task 4) ----------------------
    # The fwd cost is two batched 2-operand sorts over (C, N). Levers:
    #  (a) ONE-OPERAND first sort: quantize the key to 13 bits and pack
    #      it ABOVE the 18-bit (iota*2+fg) payload in a single int32 —
    #      sort bandwidth scales with operand count, and the Jaccard
    #      gradient is piecewise-constant in RANK, so a 1/8191
    #      key-quantized ORDER only permutes near-ties (loss dot still
    #      uses exact errors);
    #  (b) bf16 key for the 2-operand sort (width, not count);
    #  (c) class-budget: absent classes are zeroed by presentf anyway —
    #      sort only the K most-present rows ((K, N) vs (C, N)).
    packed1 = (jnp.arange(N, dtype=jnp.int32) * 2)[None, :] + \
        fgf.astype(jnp.int32)

    def sort1_packed(e):
        q = (8191.0 - jnp.round(jax.lax.stop_gradient(e) * 8191.0)) \
            .astype(jnp.int32)
        v = (q << 18) | packed1
        return jax.vmap(lambda x: jax.lax.sort((x,), num_keys=1)[0])(v)

    tb("batched sort, 1 operand (13b key|18b pl)", sort1_packed, errors)

    def sort2_bf16(e):
        return jax.vmap(lambda k, i: jax.lax.sort((k, i), num_keys=1))(
            (-e).astype(jnp.bfloat16), packed1)

    tb("batched sort, 2 operands (bf16 key)", sort2_bf16, errors)

    for K in (8, 16):
        ek = errors[:K]
        pk = packed1[:K]
        tb(f"batched sort, 2 ops at (K={K:2d}, N)",
           lambda e, p=pk: jax.vmap(
               lambda k, i: jax.lax.sort((k, i), num_keys=1))(-e, p), ek)

    def lovasz_q(pr):  # full forward with the 1-operand first sort
        prf = pr.astype(jnp.float32)
        fgq = jnp.where(valid[None, :],
                        (labels0[None, :] == jnp.arange(C)[:, None]),
                        False)
        err = jnp.where(valid[None, :],
                        jnp.abs(fgq.astype(jnp.float32) - prf.T), 0.0)
        pk = (jnp.arange(N, dtype=jnp.int32) * 2)[None, :] + \
            fgq.astype(jnp.int32)
        q = (8191.0 -
             jnp.round(jax.lax.stop_gradient(err) * 8191.0)).astype(
            jnp.int32)
        vs = jax.vmap(lambda x: jax.lax.sort((x,), num_keys=1)[0])(
            (q << 18) | pk)
        fg_sq = (vs & 1).astype(jnp.float32)
        gts = jnp.sum(fg_sq, axis=1, keepdims=True)
        cfgs = jnp.cumsum(fg_sq, axis=1)
        un = gts + (jnp.arange(1, N + 1, dtype=jnp.float32)[None, :]
                    - cfgs)
        jac = 1.0 - (gts - cfgs) / jnp.maximum(un, 1e-12)
        g = jnp.concatenate([jac[:, :1], jac[:, 1:] - jac[:, :-1]], 1)
        g_u = jax.lax.stop_gradient(jax.vmap(
            lambda k, x: jax.lax.sort((k, x), num_keys=1)[1])(
            vs & 0x3FFFF, g))
        ls = jnp.sum(err * g_u, axis=1)
        pres = (gts[:, 0] > 0).astype(jnp.float32)
        return jnp.sum(ls * pres) / jnp.maximum(jnp.sum(pres), 1.0)

    tb("lovasz fwd, quantized 1-op first sort", lovasz_q, probs)
    base = lovasz_softmax(probs, labels0, valid)
    print(f"{'  |q - baseline|':44s} "
          f"{abs(float(lovasz_q(probs)) - float(base)):10.2e}")

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
