"""Serialized-window attention: the PTv3 hot path as a Pallas TPU kernel.

Replaces the flash-attn 2.x CUDA dependency of the reference's
PointTransformerV3 submodule (environment.yml:242; PTv3 attends within
fixed-size windows of the space-filling-curve order — see SURVEY.md §2.2).

Windows are static-shape (num_windows, window, heads, head_dim), so each
(window, head) pair is one grid step: scores, masked softmax, and the
value matmul all live in VMEM with no HBM round-trip for the (K, K)
score matrix. Padded slots (points beyond ``num_valid`` in the sorted
order) are masked on the key side with an additive bias and zeroed on the
query side by the caller.

Training: ``window_attention`` is a custom_vjp with a Pallas forward AND
a Pallas backward (``_attn_bwd_kernel`` rebuilds probs in VMEM from the
forward's saved log-sum-exp and emits dq/dk/dv in one grid pass —
measured 5.6x the XLA vjp, PERF.md "Kernel facts"). On non-TPU backends
both directions fall back to the jnp reference implementation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Plain-interpret every pallas_call (TPU3DSSF_PALLAS_INTERPRET=1).

    Unlike ``pltpu.force_tpu_interpret_mode`` (whose io_callbacks cannot
    live inside an SPMD-partitioned jit — the partitioner rejects
    side-effecting HLO with replicated sharding), ``interpret=True``
    traces the kernel body to ordinary HLO, so the multichip dryrun can
    run the REAL flagship train step over a device mesh on CPU.
    """
    return os.environ.get("TPU3DSSF_PALLAS_INTERPRET") == "1"

_NEG = -1e9


def window_attention_reference(q, k, v, key_mask):
    """Plain-jnp within-window MHA (oracle + backward path).

    Args:
      q, k, v: (W, K, H, D) — windows, window size, heads, head dim.
      key_mask: (W, K) bool — True for live (non-padding) slots.

    Returns:
      (W, K, H, D), same dtype as q. Outputs at masked query slots are
      zeroed.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST  # exact-f32 oracle / backward path
    scores = jnp.einsum("wqhd,wkhd->whqk", qf, kf, precision=hp) * scale
    bias = jnp.where(key_mask, 0.0, _NEG)[:, None, None, :]
    probs = jax.nn.softmax(scores + bias, axis=-1)
    out = jnp.einsum("whqk,wkhd->wqhd", probs, vf, precision=hp)
    out = out * key_mask[:, :, None, None]
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # native-dtype (bf16) MXU inputs with f32 accumulation (f32 inputs
    # force the slow multi-pass MXU mode); q pre-scaled in the wrapper;
    # normalization after the PV matmul on the narrow (K, D) output
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)


def _attn_kernel_lse(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref):
    """Forward that also emits the log-sum-exp per query row.

    The training forward uses this variant so the backward can rebuild
    probs as one ``exp(s − lse)`` instead of re-running the row max and
    row sum — two full (K, K) VPU reduction passes saved per grid step,
    for (W, H, K) f32 of extra HBM (hundreds of KB at PTv3 shapes).
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)
    # (K, 1) trailing-1 layout: a (1, 1, K) block is illegal on real TPU
    # for H > 1 arrays (last two block dims must divide (8, 128) or
    # equal the array dims); (1, 1, K, 1) ends in (K, 1) — legal.
    lse_ref[0, 0] = m + jnp.log(denom)


def _window_attention_pallas(q, k, v, key_mask, with_lse=False):
    W, K, H, D = q.shape
    q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)  # fold softmax scale
    bias = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    # TPU block rule: the last two block dims must divide (8, 128) or
    # equal the array dims — so windows/heads lead and (K, D) trail.
    def whkd(x):
        return jnp.transpose(x, (0, 2, 1, 3))  # (W, K, H, D) → (W, H, K, D)

    qkv_spec = pl.BlockSpec((1, 1, K, D), lambda w, h: (w, h, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, K, 1), lambda w, h: (w, h, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((W, H, K, D), q.dtype)
    if with_lse:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((W, H, K, 1), jnp.float32))
    res = pl.pallas_call(
        _attn_kernel_lse if with_lse else _attn_kernel,
        out_shape=out_shape,
        grid=(W, H),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, 1, K), lambda w, h: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(qkv_spec, row_spec) if with_lse else qkv_spec,
        interpret=_interpret(),
    )(whkd(q), whkd(k), whkd(v), bias)
    out, lse = res if with_lse else (res, None)
    out = jnp.transpose(out, (0, 2, 1, 3))
    # query-side zeroing (cheap VPU op; keeps the kernel mask-free on q)
    out = out * key_mask[:, :, None, None].astype(out.dtype)
    return (out, lse) if with_lse else out


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref,
                     do_ref, dq_ref, dk_ref, dv_ref):
    """Backward: rebuild probs from the saved LSE, emit dq (scaled), dk, dv.

    q_ref holds the PRE-SCALED q; the wrapper multiplies dq by the
    softmax scale afterwards. do_ref is already query-side masked.
    Two standard flash-backward identities keep the VPU work to ~3
    (K, K)-scale passes (exp, the ds combine, one cast) instead of ~6:
      * lse_ref carries the forward's per-query log-sum-exp, so probs
        are one ``exp(s − lse)`` — no row max / row sum recompute;
      * delta_ref carries rowsum(do·o) (computed OUTSIDE on (K, D)
        arrays), which equals the softmax-vjp row term Σ_k p_k·dp_k —
        no (K, K) ``dp·p`` product or row-sum in-kernel.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse_ref[0, 0])          # lse block (K, 1) broadcasts

    pt = p.astype(v.dtype)
    dv = jax.lax.dot_general(  # pᵀ do → (K, D)
        pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # do vᵀ → (K, K)
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0])
    dsl = ds.astype(q.dtype)
    dq = jnp.dot(dsl, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(  # dsᵀ q → (K, D)
        dsl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _window_attention_bwd_pallas(q, k, v, key_mask, lse, out, g):
    W, K, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    qs = q * jnp.asarray(scale, q.dtype)
    bias = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    g = g * key_mask[:, :, None, None].astype(g.dtype)
    # softmax-vjp row term on (K, D) arrays: Σ_k p_k·dp_k = do·o
    delta = jnp.transpose(
        jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1),
        (0, 2, 1))[..., None]                          # (W, H, K, 1) f32

    def whkd(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    spec = pl.BlockSpec((1, 1, K, D), lambda w, h: (w, h, 0, 0),
                        memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, K, 1), lambda w, h: (w, h, 0, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((W, H, K, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        _attn_bwd_kernel,
        out_shape=(shp, shp, shp),
        grid=(W, H),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, K), lambda w, h: (w, 0, 0),
                               memory_space=pltpu.VMEM),
                  row_spec, row_spec,
                  spec],
        out_specs=(spec, spec, spec),
        interpret=_interpret(),
    )(whkd(qs), whkd(k), whkd(v), bias, lse, delta, whkd(g))

    def back(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    return back(dq) * jnp.asarray(scale, q.dtype), back(dk), back(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def window_attention_packed(qkv, key_mask, heads):
    """Small-C (C % 128 != 0) windowed MHA, packed layout.

    Measured per-direction winners at the PTv3 C ∈ {32, 64} stages
    (scripts/time_smallc_attn.py): INFERENCE (the primal, taken when
    nothing differentiates through the call) uses the packed whole-3C
    Pallas forward — zero transposes, 0.70 vs 1.40 ms at dec0 shapes;
    TRAINING (the custom_vjp fwd/bwd rules) uses the (W, K, H, D)
    window kernels both ways, the fastest measured fwd+bwd combination
    (the packed backward's f32 dk/dv at 32-lane width loses what the
    packed forward gains, and hybrid packed-fwd+window-bwd re-pays the
    relayout). qkv is (W, K, 3C) straight off the Dense projection;
    returns (W, K, C) with masked-query rows zeroed (same contract as
    :func:`window_attention_reference`).
    """
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  pick_block_q)
    W, K, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    bias = jnp.where(key_mask, 0.0, _NEG)[:, None, :]
    out = flash_attention_packed(qkv, bias, heads, pick_block_q(K),
                                 None, None, 1.0 / (D ** 0.5), None)
    return out * key_mask[..., None].astype(out.dtype)


def _wap_fwd(qkv, key_mask, heads):
    # training forward: the (W, K, H, D) window kernel — the qkv
    # reshape is free (contiguous) and window fwd + window bwd is the
    # fastest measured training pair at small C
    W, K, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    q4 = qkv.reshape(W, K, 3, heads, D)
    out, lse = _window_attention_pallas(
        q4[:, :, 0], q4[:, :, 1], q4[:, :, 2], key_mask, with_lse=True)
    return out.reshape(W, K, C), (qkv, key_mask, lse, out)


def _wap_bwd(heads, res, g):
    qkv, key_mask, lse, out = res
    W, K, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    q4 = qkv.reshape(W, K, 3, heads, D)
    dq, dk, dv = _window_attention_bwd_pallas(
        q4[:, :, 0], q4[:, :, 1], q4[:, :, 2], key_mask, lse, out,
        g.reshape(W, K, heads, D))
    dqkv = jnp.concatenate([dq.reshape(W, K, C), dk.reshape(W, K, C),
                            dv.reshape(W, K, C)], axis=-1)
    return dqkv, None


window_attention_packed.defvjp(_wap_fwd, _wap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, key_mask, use_pallas=True):
    """Windowed MHA; Pallas forward on TPU, jnp fallback elsewhere.

    Same contract as :func:`window_attention_reference`.
    """
    if use_pallas:
        return _window_attention_pallas(q, k, v, key_mask)
    return window_attention_reference(q, k, v, key_mask)


def _wa_fwd(q, k, v, key_mask, use_pallas):
    if use_pallas:
        out, lse = _window_attention_pallas(q, k, v, key_mask,
                                            with_lse=True)
    else:
        out, lse = window_attention_reference(q, k, v, key_mask), None
    return out, (q, k, v, key_mask, lse, out)


def _wa_bwd(use_pallas, res, g):
    q, k, v, key_mask, lse, out = res
    if use_pallas:
        dq, dk, dv = _window_attention_bwd_pallas(q, k, v, key_mask,
                                                  lse, out, g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_: window_attention_reference(q_, k_, v_, key_mask),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


window_attention.defvjp(_wa_fwd, _wa_bwd)
