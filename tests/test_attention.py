"""Window-attention kernel vs oracle (Pallas runs in interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from tpu3dssf.kernels import window_attention, window_attention_reference


def _rand_qkv(rng, W=4, K=64, H=2, D=16, dtype=np.float32):
    q = rng.normal(size=(W, K, H, D)).astype(dtype)
    k = rng.normal(size=(W, K, H, D)).astype(dtype)
    v = rng.normal(size=(W, K, H, D)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _oracle(q, k, v, mask):
    # straightforward numpy softmax attention with key masking
    q, k, v = map(np.asarray, (q, k, v))
    mask = np.asarray(mask)
    W, K, H, D = q.shape
    out = np.zeros_like(q)
    for w in range(W):
        for h in range(H):
            s = (q[w, :, h] @ k[w, :, h].T) / np.sqrt(D)
            s = np.where(mask[w][None, :], s, -1e9)
            s = s - s.max(axis=-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=-1, keepdims=True)
            out[w, :, h] = p @ v[w, :, h]
    return out * mask[:, :, None, None]


def test_reference_matches_oracle(rng):
    q, k, v = _rand_qkv(rng)
    mask = jnp.asarray(rng.random((4, 64)) > 0.3)
    got = window_attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), _oracle(q, k, v, mask),
                               atol=1e-5)


def test_pallas_matches_reference_interpret(rng):
    # interpret mode is extremely slow on this 1-core host — keep tiny.
    # full-size pallas-vs-reference parity runs on real TPU via
    # scripts/check_tpu_kernels.py.
    q, k, v = _rand_qkv(rng, W=1, K=8, H=1, D=8)
    mask = jnp.asarray(rng.random((1, 8)) > 0.3)
    with pltpu.force_tpu_interpret_mode():
        got = window_attention(q, k, v, mask, True)
    want = window_attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fully_masked_window_is_finite(rng):
    q, k, v = _rand_qkv(rng, W=2)
    mask = jnp.zeros((2, 64), bool)  # every slot padding
    out = window_attention_reference(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_gradients_flow_and_are_finite(rng):
    q, k, v = _rand_qkv(rng, W=2, K=32)
    mask = jnp.asarray(rng.random((2, 32)) > 0.2)

    def loss(q_, k_, v_):
        return jnp.sum(window_attention(q_, k_, v_, mask, False) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
    # masked slots get zero grads
    gq_np = np.asarray(gq)
    assert np.abs(gq_np[~np.asarray(mask)]).max() == 0.0


def test_gradient_matches_reference_autodiff(rng):
    q, k, v = _rand_qkv(rng, W=2, K=32)
    mask = jnp.asarray(rng.random((2, 32)) > 0.2)

    def loss_custom(q_):
        return jnp.sum(window_attention(q_, k, v, mask, False) ** 2)

    def loss_ref(q_):
        return jnp.sum(window_attention_reference(q_, k, v, mask) ** 2)

    g_custom = jax.grad(loss_custom)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               atol=1e-4)


def test_bf16_inputs(rng):
    q, k, v = _rand_qkv(rng, W=2, K=32)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mask = jnp.ones((2, 32), bool)
    out = window_attention_reference(q, k, v, mask)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


# ---------- full (ViT) flash attention backward ----------

def test_flash_backward_matches_reference_autodiff(rng):
    """Pallas flash backward (recompute + accumulated dk/dv) vs jax.vjp
    of the jnp reference — including N not a block multiple (internal
    padding) and an explicit key bias."""
    from tpu3dssf.kernels.flash_attention import (flash_attention,
                                                  mha_reference)

    B, N, H, D = 1, 24, 2, 8
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)

    for key_bias in (None,
                     jnp.zeros((B, 1, N)).at[:, :, -5:].set(-1e9)):
        def f(q_, k_, v_):
            return flash_attention(q_, k_, v_, 16, key_bias)

        with pltpu.force_tpu_interpret_mode():
            out, vjp = jax.vjp(f, q, k, v)
            dq, dk, dv = vjp(g)

        want_out, want_vjp = jax.vjp(
            lambda q_, k_, v_: mha_reference(q_, k_, v_, key_bias),
            q, k, v)
        wq, wk, wv = want_vjp(g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(wq),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(wk),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(wv),
                                   atol=1e-5, rtol=1e-5)


def test_flash_packed_matches_reference_and_grads(rng):
    """Packed (B, N, 3C) flash path: forward + backward vs the jnp
    reference (q channels pre-scaled by 1/sqrt(D) per the contract)."""
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  mha_reference)

    B, N, H, D = 1, 32, 2, 8
    C = H * D
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    bias = jnp.zeros((B, 1, N)).at[:, :, -6:].set(-1e9)
    g = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    scale = 1.0 / (D ** 0.5)
    packed = jnp.concatenate(
        [(q * scale).reshape(B, N, C), k.reshape(B, N, C),
         v.reshape(B, N, C)], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(
            lambda p: flash_attention_packed(p, bias, H, 16), packed)
        (dpacked,) = vjp(g)

    def ref(p):
        qs = p[..., :C].reshape(B, N, H, D)
        kk = p[..., C:2 * C].reshape(B, N, H, D)
        vv = p[..., 2 * C:].reshape(B, N, H, D)
        # mha_reference applies its own 1/sqrt(D): undo the pre-scale
        return mha_reference(qs * (D ** 0.5), kk, vv,
                             bias).reshape(B, N, C)

    want, wvjp = jax.vjp(ref, packed)
    (wdp,) = wvjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dpacked), np.asarray(wdp),
                               atol=1e-5, rtol=1e-5)


def test_flash_packed_rope_in_kernel(rng):
    """In-kernel RoPE + q-scale (the ViT fast path) vs rotating with
    _apply_rope outside and calling the jnp reference — forward and
    backward. Prefix rows carry identity rotations."""
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  mha_reference)
    from tpu3dssf.models.vit import _apply_rope

    B, N, H, D = 2, 32, 2, 8
    C = H * D
    D2 = D // 2
    n_pre = 3
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.float32)
    bias = jnp.zeros((B, 1, N)).at[:, :, -6:].set(-1e9)
    g = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    angles = jnp.asarray(rng.uniform(-3, 3, size=(N - n_pre - 6, D2)),
                         jnp.float32)
    # identity rows for prefix and the 6 masked/padded tail slots
    cos = jnp.concatenate([jnp.ones((n_pre, D2)), jnp.cos(angles),
                           jnp.ones((6, D2))])
    sin = jnp.concatenate([jnp.zeros((n_pre, D2)), jnp.sin(angles),
                           jnp.zeros((6, D2))])
    scale = 1.0 / (D ** 0.5)

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(
            lambda p: flash_attention_packed(p, bias, H, 16, cos, sin,
                                             scale), qkv)
        (dqkv,) = vjp(g)

    def ref(p):
        q = p[..., :C].reshape(B, N, H, D)
        k = p[..., C:2 * C].reshape(B, N, H, D)
        v = p[..., 2 * C:].reshape(B, N, H, D)
        # same rotation, materialized outside (angles only cover the
        # rotated span; _apply_rope passes the prefix through)
        q = _apply_rope(q, jnp.concatenate(
            [angles, jnp.zeros((6, D2))]), n_pre)
        k = _apply_rope(k, jnp.concatenate(
            [angles, jnp.zeros((6, D2))]), n_pre)
        return mha_reference(q, k, v, bias).reshape(B, N, C)

    want, wvjp = jax.vjp(ref, qkv)
    (wdq,) = wvjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(wdq),
                               atol=1e-5, rtol=1e-5)


def test_flash_packed_many_heads_scratch_path(rng):
    """heads > 8 routes probabilities through a VMEM scratch buffer
    (ViT-L: 16 unrolled heads otherwise blow scoped VMEM). Same
    numerics as the reference."""
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  mha_reference)

    B, N, H, D = 1, 32, 16, 4
    C = H * D
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    bias = jnp.zeros((B, 1, N)).at[:, :, -3:].set(-1e9)
    packed = jnp.concatenate(
        [(q / (D ** 0.5)).reshape(B, N, C), k.reshape(B, N, C),
         v.reshape(B, N, C)], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_packed(packed, bias, H, 16)

    want = mha_reference(q, k, v, bias).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_packed_head_groups(rng):
    """head_group puts head groups on the grid as independent channel
    blocks (ViT-L route: ≤8 heads per Mosaic body, zero transposes).
    Forward + backward must match the single-body packed kernel and the
    jnp reference exactly."""
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  mha_reference)

    B, N, H, D = 1, 32, 4, 64   # hg=2 -> G=2, group width 128
    C = H * D
    q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
    bias = jnp.zeros((B, 1, N)).at[:, :, -5:].set(-1e9)
    g = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    packed = jnp.concatenate(
        [(q / (D ** 0.5)).reshape(B, N, C), k.reshape(B, N, C),
         v.reshape(B, N, C)], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(
            lambda p: flash_attention_packed(p, bias, H, 16, None, None,
                                             None, 2), packed)
        (dpacked,) = vjp(g)
        one, ovjp = jax.vjp(
            lambda p: flash_attention_packed(p, bias, H, 16), packed)
        (odp,) = ovjp(g)

    want = mha_reference(q, k, v, bias).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(one),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dpacked), np.asarray(odp),
                               atol=1e-6, rtol=1e-6)


def test_flash_packed_head_groups_rope(rng):
    """head_group composes with in-kernel RoPE (per-group rope refs are
    the same (N, D/2) tables)."""
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  mha_reference)
    from tpu3dssf.models.vit import _apply_rope

    B, N, H, D = 1, 32, 4, 64
    C, D2, n_pre = H * D, D // 2, 3
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.float32)
    bias = jnp.zeros((B, 1, N)).at[:, :, -5:].set(-1e9)
    angles = jnp.asarray(rng.uniform(-3, 3, size=(N - n_pre - 5, D2)),
                         jnp.float32)
    cos = jnp.concatenate([jnp.ones((n_pre, D2)), jnp.cos(angles),
                           jnp.ones((5, D2))])
    sin = jnp.concatenate([jnp.zeros((n_pre, D2)), jnp.sin(angles),
                           jnp.zeros((5, D2))])
    scale = 1.0 / (D ** 0.5)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_packed(qkv, bias, H, 16, cos, sin, scale, 2)

    q = qkv[..., :C].reshape(B, N, H, D)
    k = qkv[..., C:2 * C].reshape(B, N, H, D)
    v = qkv[..., 2 * C:].reshape(B, N, H, D)
    pad_ang = jnp.concatenate([angles, jnp.zeros((5, D2))])
    want = mha_reference(_apply_rope(q, pad_ang, n_pre),
                         _apply_rope(k, pad_ang, n_pre), v,
                         bias).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_packed_head_group_validation():
    """Misaligned group widths and non-divisor groups raise up front."""
    from tpu3dssf.kernels.flash_attention import flash_attention_packed

    qkv = jnp.zeros((1, 32, 3 * 64), jnp.float32)  # C=64
    bias = jnp.zeros((1, 1, 32), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        flash_attention_packed(qkv, bias, 4, 16, None, None, None, 2)
    with pytest.raises(ValueError, match="must divide"):
        flash_attention_packed(qkv, bias, 4, 16, None, None, None, 3)


def test_pick_head_group():
    """Shared head-group policy (vit.py / ptv3.py / timing scripts):
    largest group in (8, 4, 2) dividing H with a 128-aligned group
    width; None when no legal grouping exists (callers must then take
    the (B, H, N, D) kernel, never a many-head single body)."""
    from tpu3dssf.kernels.flash_attention import pick_head_group

    assert pick_head_group(16, 1024) == 8    # ViT-L: 2 groups x 512
    assert pick_head_group(32, 512) == 8     # PTv3 s4: 4 groups x 128
    assert pick_head_group(12, 768) == 4     # 12 % 8 != 0 -> 3 x 256
    assert pick_head_group(16, 128) is None  # D=8: no aligned width
    assert pick_head_group(6, 384) == 2      # 6 % 8, 6 % 4 != 0


def test_window_attention_packed_hybrid(rng):
    """Small-C hybrid (packed whole-3C fwd + (W,H,K,D) bwd) vs the jnp
    reference autodiff — forward and all three grads through the packed
    layout."""
    from tpu3dssf.kernels.window_attention import (
        window_attention_packed, window_attention_reference)

    W, K, H, D = 2, 128, 2, 8
    C = H * D
    qkv = jnp.asarray(rng.normal(size=(W, K, 3 * C)), jnp.float32)
    mask = jnp.asarray(rng.random((W, K)) > 0.2)
    g = jnp.asarray(rng.normal(size=(W, K, C)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(
            lambda p: window_attention_packed(p, mask, H), qkv)
        (dqkv,) = vjp(g)

    def ref(p):
        q4 = p.reshape(W, K, 3, H, D)
        return window_attention_reference(
            q4[:, :, 0], q4[:, :, 1], q4[:, :, 2], mask).reshape(W, K, C)

    want, wvjp = jax.vjp(ref, qkv)
    (wdq,) = wvjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(wdq),
                               atol=1e-5, rtol=1e-5)
