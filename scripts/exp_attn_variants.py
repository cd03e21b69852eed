"""Experiment: window-attention kernel variants at PTv3 shapes.

The production kernel (kernels/window_attention.py) runs one (window,
head) pair per grid step. At D=16 the two matmuls are tiny (~3.5us at
the D=16 MXU ceiling) while the (K,K) softmax VPU work and per-step
overhead dominate. This script times candidate redesigns on the real
chip to pick a winner:

  A  current production kernel (grid (W, H))
  B  packed heads: grid (W,), unrolled Python loop over H in-kernel
  C  B + exp2 softmax (log2(e) folded into the q prescale)
  D  plain-XLA bf16 batched einsum (no Pallas)

Run bare on the TPU: python scripts/exp_attn_variants.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3dssf.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu3dssf.kernels import window_attention, window_attention_reference
from tpu3dssf.utils.timing import time_device

_NEG = -1e9
_LOG2E = 1.4426950408889634


def make_packed(H, use_exp2):
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]  # (K,)

        def body(h, _):
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            if use_exp2:
                e = jnp.exp2(s - m)
            else:
                e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[0, h] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, H, body, 0)
    return kernel


def packed_attention(q, k, v, key_mask, use_exp2=False):
    W, K, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if use_exp2:
        scale = scale * _LOG2E
    q = q * jnp.asarray(scale, q.dtype)
    bias = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    def whkd(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    spec = pl.BlockSpec((1, H, K, D), lambda w: (w, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        make_packed(H, use_exp2),
        out_shape=jax.ShapeDtypeStruct((W, H, K, D), q.dtype),
        grid=(W,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, K), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
    )(whkd(q), whkd(k), whkd(v), bias)
    return jnp.transpose(out, (0, 2, 1, 3)) * \
        key_mask[:, :, None, None].astype(out.dtype)


def make_packed_dk(H, grid_wh):
    """Heads x (D, K) layout: lanes = K (1024), sublanes = D (16) — no
    lane padding anywhere, so DMAs move 8x less than the (K, D) layout."""
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]

        def one_head(q, k, v):
            # q, k, v: (D, K). scores (Kq, Kk) = q^T k
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = (e / jnp.maximum(denom, 1e-20)).astype(v.dtype)
            # oT (D, Kq) = v (D, Kk) @ p^T
            return jax.lax.dot_general(
                v, p, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if grid_wh:
            o_ref[0, 0] = one_head(
                q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]).astype(o_ref.dtype)
        else:
            def body(h, _):
                o_ref[0, h] = one_head(
                    q_ref[0, h], k_ref[0, h],
                    v_ref[0, h]).astype(o_ref.dtype)
                return 0
            jax.lax.fori_loop(0, H, body, 0)
    return kernel


def packed_dk_attention(q, k, v, key_mask, grid_wh=False):
    W, K, H, D = q.shape
    q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
    bias = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    def whdk(x):
        return jnp.transpose(x, (0, 2, 3, 1))  # (W,K,H,D) -> (W,H,D,K)

    if grid_wh:
        spec = pl.BlockSpec((1, 1, D, K), lambda w, h: (w, h, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, 1, K), lambda w, h: (w, 0, 0),
                             memory_space=pltpu.VMEM)
        grid = (W, H)
    else:
        spec = pl.BlockSpec((1, H, D, K), lambda w: (w, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, 1, K), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM)
        grid = (W,)
    out = pl.pallas_call(
        make_packed_dk(H, grid_wh),
        out_shape=jax.ShapeDtypeStruct((W, H, D, K), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
    )(whdk(q), whdk(k), whdk(v), bias)
    out = jnp.transpose(out, (0, 3, 1, 2))  # back to (W,K,H,D)
    return out * key_mask[:, :, None, None].astype(out.dtype)


def make_ck_kernel(H, D):
    """q/k/v blocks (1, C, K): heads on sublanes (C = H*D), keys on
    lanes. No lane padding in HBM or VMEM; per-head access is a cheap
    sublane slice. NOTE: the head loop MUST be a static Python unroll —
    fori_loop + pl.ds sublane slices compile-hangs Mosaic (CLAUDE.md
    trap 11), which is why main() only runs this variant at small H."""
    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]
        for h in range(H):
            q = q_ref[0, h * D:(h + 1) * D, :]   # (D, K)
            k = k_ref[0, h * D:(h + 1) * D, :]
            v = v_ref[0, h * D:(h + 1) * D, :]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = (e / jnp.maximum(denom, 1e-20)).astype(v.dtype)
            o = jax.lax.dot_general(
                v, p, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h * D:(h + 1) * D, :] = o.astype(o_ref.dtype)
    return kernel


def ck_attention(q, k, v, key_mask):
    W, K, H, D = q.shape
    C = H * D
    q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
    bias = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    def wck(x):  # (W,K,H,D) -> (W, C, K)
        return jnp.transpose(x.reshape(W, K, C), (0, 2, 1))

    spec = pl.BlockSpec((1, C, K), lambda w: (w, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        make_ck_kernel(H, D),
        out_shape=jax.ShapeDtypeStruct((W, C, K), q.dtype),
        grid=(W,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1, K), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
    )(wck(q), wck(k), wck(v), bias)
    out = jnp.transpose(out, (0, 2, 1)).reshape(W, K, H, D)
    return out * key_mask[:, :, None, None].astype(out.dtype)


def xla_attention(q, k, v, key_mask):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("wqhd,wkhd->whqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + jnp.where(key_mask, 0.0, _NEG)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("whqk,wkhd->wqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype) * key_mask[:, :, None, None].astype(q.dtype)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.devices()}")
    for (tag, W, K, H, D) in [
        ("s0", 25, 1024, 2, 16),
        ("s2", 7, 1024, 8, 16),
        ("s4", 2, 1024, 32, 16),
    ]:
        q, k, v = (jnp.asarray(rng.normal(size=(W, K, H, D)),
                               jnp.bfloat16) for _ in range(3))
        mask = jnp.asarray(
            rng.random((W, K)) < 0.97)

        ref = np.asarray(window_attention_reference(q, k, v, mask),
                         np.float32)

        def check(name, fn):
            got = np.asarray(jax.jit(fn)(q, k, v, mask), np.float32)
            err = np.abs(got - ref).max()
            t = time_device(fn, q, k, v, mask, iters=50)
            print(f"  {tag} {name:28s} {t*1e6:8.1f} us  maxerr={err:.3e}")

        check("A current (W,H) grid", lambda *a: window_attention(*a, True))
        check("B packed heads", lambda *a: packed_attention(*a, False))
        check("C packed + exp2", lambda *a: packed_attention(*a, True))
        check("D XLA bf16 einsum", xla_attention)
        check("E (D,K) packed heads", lambda *a: packed_dk_attention(*a))
        check("F (D,K) grid (W,H)",
              lambda *a: packed_dk_attention(*a, True))
        if H <= 4:  # unrolled heads: scoped-VMEM blows up beyond this
            check("G (C,K) sublane heads", lambda *a: ck_attention(*a))


if __name__ == "__main__":
    main()
