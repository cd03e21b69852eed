"""Pallas flash attention for full (non-windowed) self-attention.

Used by the ViT image encoder (2845 tokens at DINOv3 geometry): XLA's
naive attention writes the (B, H, N, N) score tensor to HBM
(6 imgs x 6 heads x 2844² ≈ 0.5 GB per frame) — HBM-bandwidth bound.
This kernel keeps each (batch, head)'s scores in VMEM: K/V for one head
fit comfortably (N x 64 bf16 ≈ 380 KB), so each grid step computes one
q-block against ALL keys with no HBM spill and no online-softmax carry.

Layout (B, H, N, D); N padded to a q-block multiple by the caller wrapper
(padded keys masked via additive bias). Backward is a Pallas kernel too
(recompute probs per q-block in VMEM; dk/dv accumulated in f32 across
q-blocks by revisiting the same output block) — no (B, H, N, N) HBM
spill on the gradient path, so ViT fine-tuning is unblocked even though
the reference freezes the encoder (SURVEY.md §3.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3dssf.kernels.window_attention import _interpret

_NEG = -1e9
_DEF_BLOCK_Q = 256
# full-sequence K/V residency + f32 score temporaries slightly exceed the
# default 16 MB scoped-VMEM budget at ViT scale (6 imgs x 3072 tokens);
# raise the Mosaic limit (v5e VMEM is 128 MB) instead of shrinking blocks
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def mha_reference(q, k, v, bias=None):
    """jnp oracle: q,k,v (B, N, H, D); bias (B, 1|H, N) additive on keys."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale
    if bias is not None:
        s = s + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # VPU-lean softmax: q is pre-scaled by 1/sqrt(D) in the wrapper, and
    # normalization happens AFTER the PV matmul on the (Bq, D) output
    # instead of the (Bq, N) probabilities. MXU inputs stay in their
    # native (bf16) dtype — f32 inputs force the slow multi-pass mode —
    # with f32 accumulation.
    q = q_ref[0, 0]                              # (Bq, D), pre-scaled
    k = k_ref[0, 0]                              # (N, D)
    v = v_ref[0, 0]                              # (N, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Bq, N) f32
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)       # (Bq, 1)
    o = jnp.dot(e.astype(v.dtype), v,
                preferred_element_type=jnp.float32)  # (Bq, D)
    o_ref[0, 0] = (o / jnp.maximum(denom, 1e-20)).astype(o_ref.dtype)


def _flash_call(q, k, v, bias, block_q):
    B, H, N, D = q.shape
    nq = N // block_q
    qkv_spec_q = pl.BlockSpec((1, 1, block_q, D),
                              lambda b, h, i: (b, h, i, 0),
                              memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, N), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _flash_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        grid=(B, H, nq),
        in_specs=[qkv_spec_q, kv_spec, kv_spec, bias_spec],
        out_specs=qkv_spec_q,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, block_q=_DEF_BLOCK_Q, key_bias=None):
    """Full MHA, q/k/v (B, N, H, D) → (B, N, H, D).

    Pads N internally unless the caller already works at a block-multiple
    N and supplies its own additive ``key_bias`` (B, 1, N) — the ViT
    pads its token sequence once and reuses the bias across all layers.
    """
    B, N, H, D = q.shape
    Np = ((N + block_q - 1) // block_q) * block_q
    pad = Np - N

    def bhnd(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.transpose(x, (0, 2, 1, 3))

    if key_bias is None:
        bias = jnp.full((B, 1, Np), 0.0, jnp.float32)
        if pad:
            bias = bias.at[:, :, N:].set(_NEG)
    else:
        bias = jnp.pad(key_bias.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, pad)),
                       constant_values=_NEG)
    # fold the softmax scale into q (one (N, D) multiply instead of a
    # (N, N) one inside the kernel)
    q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
    out = _flash_call(bhnd(q), bhnd(k), bhnd(v), bias, block_q)
    out = jnp.transpose(out, (0, 2, 1, 3))
    return out[:, :N] if pad else out


def _flash_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                      dq_ref, dk_ref, dv_ref):
    """One q-block's backward: recompute probs in VMEM, emit dq; dk/dv
    accumulate in f32 across q-blocks (their output block maps to the
    same (b, h) slice for every grid step of the innermost q axis).

    q_ref holds the PRE-SCALED q; the wrapper multiplies dq by the
    softmax scale afterwards (dk uses the pre-scaled q directly).
    """
    i = pl.program_id(2)
    q = q_ref[0, 0]                                  # (Bq, D)
    k = k_ref[0, 0]                                  # (N, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                                # (Bq, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Bq, N)
    s = s + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)

    pt = p.astype(v.dtype)
    dv = jax.lax.dot_general(  # pᵀ do → (N, D)
        pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # do vᵀ → (Bq, N)
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsl = ds.astype(q.dtype)
    dq = jnp.dot(dsl, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(  # dsᵀ (q·scale) → (N, D)
        dsl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk
    dv_ref[0, 0] += dv


def _flash_bwd_call(qs, k, v, bias, g, block_q):
    """qs pre-scaled, all (B, H, N, D); g query-side grad. Returns
    (dq_prescale, dk, dv) — dq still needs the softmax scale."""
    B, H, N, D = qs.shape
    nq = N // block_q
    q_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, N, D), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, N), lambda b, h, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    acc = jax.ShapeDtypeStruct((B, H, N, D), jnp.float32)
    dq, dk, dv = pl.pallas_call(
        _flash_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H, N, D), qs.dtype), acc, acc),
        grid=(B, H, nq),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(qs, k, v, bias, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def pick_block_q(n_padded: int) -> int:
    """Largest q-block ≤ 384 (multiple of 8) dividing the padded length.

    Lets callers pad to the next 128-multiple instead of a fixed
    256-multiple: at DINOv3 geometry (2845 tokens) that is 2944 instead
    of 3072 — 8% fewer attention FLOPs."""
    for b in range(384, 127, -8):
        if n_padded % b == 0:
            return b
    return 128


def pick_head_group(heads: int, channels: int):
    """Head-group size for :func:`flash_attention_packed`, or None.

    One Mosaic body may unroll at most ~8 heads before code size and
    scratch staging blow up the (remote) AOT compile (PERF.md, ViT-L);
    groups of ≤8 heads go on the grid instead. Each group's qkv channel
    block must be 128-lane aligned for the packed in_specs. Returns the
    largest group size in (8, 4, 2) that divides ``heads`` with a
    128-aligned group width, or None when no legal grouping exists —
    callers must then route to the (B, H, N, D) kernel (heads on the
    grid, per-layer transposes) rather than run one many-head body.
    """
    return next((g for g in (8, 4, 2)
                 if heads % g == 0 and (channels // (heads // g)) % 128 == 0),
                None)


def _rot_halves(x1, x2, cos, sin):
    """Rotate the (x1, x2) half-pair by (cos, sin); returns the pair."""
    return x1 * cos - x2 * sin, x1 * sin + x2 * cos


def _packed_kernel(heads, q_scale, use_rope, use_scratch, whole, with_lse,
                   qkv_q_ref, k_ref, v_ref, bias_ref,
                   *rope_refs_and_out):
    """Packed-layout flash attention: everything stays (rows, C).

    qkv_q_ref: (1, Bq, C) — this q-block's channels; k_ref/v_ref:
    (1, N, C) — the SAME qkv array, channel-offset blocks; o_ref:
    (1, Bq, C). Heads are a static unrolled loop over D-wide channel
    slices, so no (B,H,N,D) transposes exist anywhere and only one
    head's (Bq, N) score matrix is live at a time.

    When ``use_rope``, rope_refs are (cos_q, sin_q, cos_k, sin_k) with
    q blocks (Bq, D/2) and k blocks (N, D/2); q/k head slices are
    rotated IN VMEM — the model never materializes a (B, N, H, D)
    intermediate (whose trailing-(H, D) tile padding used to inflate
    every per-layer RoPE pass ~2.7x in HBM). ``q_scale`` (static) is
    folded into the same VPU pass.
    """
    refs = list(rope_refs_and_out)
    scr_ref = refs.pop() if use_scratch else None
    lse_ref = refs.pop() if with_lse else None
    if use_rope:
        cq_ref, sq_ref, ck_ref, sk_ref, o_ref = refs
    else:
        (o_ref,) = refs
    bias = bias_ref[0, 0][None, :]
    C = o_ref.shape[-1]
    D = C // heads
    D2 = D // 2
    # whole mode: refs carry all 3C channels (C % 128 != 0 forbids
    # C-wide channel blocks) — k/v offsets move in-kernel
    k_base = C if whole else 0
    v_base = 2 * C if whole else 0
    for h in range(heads):
        lo = h * D
        q = qkv_q_ref[0, :, lo:lo + D]                # (Bq, D)
        k = k_ref[0, :, k_base + lo:k_base + lo + D]  # (N, D)
        v = v_ref[0, :, v_base + lo:v_base + lo + D]
        if use_rope:
            # scale folded into the f32 rotation pass
            q1, q2 = _rot_halves(
                q[:, :D2].astype(jnp.float32) * q_scale,
                q[:, D2:].astype(jnp.float32) * q_scale,
                cq_ref[...], sq_ref[...])
            q = jnp.concatenate([q1, q2], axis=-1).astype(v.dtype)
            k1, k2 = _rot_halves(
                k[:, :D2].astype(jnp.float32), k[:, D2:].astype(jnp.float32),
                ck_ref[...], sk_ref[...])
            k = jnp.concatenate([k1, k2], axis=-1).astype(v.dtype)
        else:
            q = q * jnp.asarray(q_scale, q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (Bq, N)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        if scr_ref is not None:
            # route the (Bq, N) probabilities through ONE scratch buffer
            # so the unrolled head loop reuses it — without this, every
            # head's score matrix stays live and scoped VMEM blows up at
            # many-head configs (ViT-L: 16 x 4.3 MB)
            scr_ref[...] = e
            e = scr_ref[...]
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + D] = (o / denom).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0, h, :] = (m + jnp.log(denom))[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 6, 7))
def flash_attention_packed(qkv, key_bias, heads, block_q=_DEF_BLOCK_Q,
                           rope_cos=None, rope_sin=None, q_scale=None,
                           head_group=None):
    """MHA straight off the qkv projection: (B, N, 3C) → (B, N, C).

    N must already be a multiple of ``block_q`` (the ViT pads its token
    sequence once) and ``key_bias`` (B, 1, N) must mask padded keys.

    ``q_scale=None`` means the q channels [0, C) arrive PRE-SCALED by
    1/sqrt(D); pass the scale explicitly to fold it into the kernel's
    rotation/load pass instead.

    ``rope_cos``/``rope_sin`` (N, D/2) apply axial RoPE to q and k
    inside the kernel (same angles for every head, HF DINOv3
    semantics); rows for prefix/padded tokens must be (1, 0) identity
    rotations. They are treated as CONSTANTS by the backward pass
    (zero gradient) — positions are not trainable here.

    ``head_group`` (static, must divide ``heads``): unroll only this
    many heads per kernel body and put the ``heads/head_group`` groups
    on the grid as independent channel blocks. Many-head configs
    (ViT-L: 16) otherwise emit one Mosaic body with 16x the code —
    which the remote AOT compiler rejects at full-model size — or pay
    (B,H,N,D) transposes in the fallback kernel. Requires the group
    channel width C/(heads/head_group) to be a multiple of 128.
    """
    return _packed_fwd_call(qkv, key_bias, heads, block_q, rope_cos,
                            rope_sin, q_scale, head_group, with_lse=False)


def _lse_layout_ok(heads, head_group, block_q, n):
    """(B, heads, N) f32 side outputs need a legal Mosaic block:
    (1, hg, block_q) — hg a multiple of 8 (or the whole head axis) and
    block_q a multiple of 128 (or the whole row axis). True at every
    PTv3 packed-stage geometry (K ∈ {128..1024} windows → block_q a
    power of two ≥128; hg = 8)."""
    hg = heads if head_group is None else head_group
    g = heads // hg
    return ((g == 1 or hg % 8 == 0)
            and (block_q % 128 == 0 or block_q == n))


def _packed_fwd_call(qkv, key_bias, heads, block_q, rope_cos, rope_sin,
                     q_scale, head_group, with_lse):
    B, N, C3 = qkv.shape
    C = C3 // 3
    if N % block_q:
        raise ValueError(
            f"flash_attention_packed: N={N} must be a multiple of "
            f"block_q={block_q} (pad the sequence; see pick_block_q)")
    hg = heads if head_group is None else head_group
    if heads % hg:
        raise ValueError(
            f"flash_attention_packed: head_group={hg} must divide "
            f"heads={heads}")
    G = heads // hg
    Cg = C // G
    if G > 1 and Cg % 128:
        raise ValueError(
            f"flash_attention_packed: group channel width {Cg} must be "
            f"a multiple of 128 (C={C}, {G} groups)")
    # Mosaic requires a block's last dim to divide 128 or equal the
    # array dim. C-wide channel blocks need C % 128 == 0; otherwise
    # fall back to whole-3C blocks (always legal) with the q/k/v
    # channel offsets applied inside the kernel instead. Whole mode
    # keeps k/v blocks at 3x width, so performance-critical small-C
    # callers (PTv3 C=32/64 stages) route to window_attention instead.
    whole = bool(C % 128) and G == 1
    nq = N // block_q
    bias = key_bias.astype(jnp.float32)
    use_rope = rope_cos is not None

    if G > 1:
        # channel-block index units are Cg columns: q group g lives at
        # block g, k at G + g, v at 2G + g
        def cspec(which, rows):
            if rows == N:
                return pl.BlockSpec(
                    (1, N, Cg), lambda b, g, i, w=which: (b, 0, w * G + g),
                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (1, rows, Cg), lambda b, g, i, w=which: (b, i, w * G + g),
                memory_space=pltpu.VMEM)

        bias_spec = pl.BlockSpec((1, 1, N), lambda b, g, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        rope_q = lambda b, g, i: (i, 0)      # noqa: E731
        rope_k = lambda b, g, i: (0, 0)      # noqa: E731
        out_spec = pl.BlockSpec((1, block_q, Cg),
                                lambda b, g, i: (b, i, g),
                                memory_space=pltpu.VMEM)
        grid = (B, G, nq)
    else:
        def cspec(which, rows):
            cols = C3 if whole else C
            wh = 0 if whole else which
            if rows == N:  # full-sequence k/v block, channel offset
                return pl.BlockSpec((1, N, cols),
                                    lambda b, i, w=wh: (b, 0, w),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, rows, cols),
                                lambda b, i, w=wh: (b, i, w),
                                memory_space=pltpu.VMEM)

        bias_spec = pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        rope_q = lambda b, i: (i, 0)         # noqa: E731
        rope_k = lambda b, i: (0, 0)         # noqa: E731
        out_spec = pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        grid = (B, nq)

    in_specs = [
        cspec(0, block_q),   # q block
        cspec(1, N),         # all keys
        cspec(2, N),         # all values
        bias_spec,
    ]
    operands = [qkv, qkv, qkv, bias]
    if use_rope:
        D2 = (C // heads) // 2
        cs = rope_cos.astype(jnp.float32)
        sn = rope_sin.astype(jnp.float32)
        in_specs += [
            pl.BlockSpec((block_q, D2), rope_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, D2), rope_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D2), rope_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D2), rope_k, memory_space=pltpu.VMEM),
        ]
        operands += [cs, sn, cs, sn]

    use_scratch = hg > 8
    out_shape = jax.ShapeDtypeStruct((B, N, C), qkv.dtype)
    if with_lse:
        if G > 1:
            lse_spec = pl.BlockSpec((1, hg, block_q),
                                    lambda b, g, i: (b, g, i),
                                    memory_space=pltpu.VMEM)
        else:
            lse_spec = pl.BlockSpec((1, heads, block_q),
                                    lambda b, i: (b, 0, i),
                                    memory_space=pltpu.VMEM)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, heads, N), jnp.float32))
        out_spec = (out_spec, lse_spec)
    return pl.pallas_call(
        functools.partial(_packed_kernel, hg,
                          1.0 if q_scale is None else q_scale, use_rope,
                          use_scratch, whole, with_lse),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=([pltpu.VMEM((block_q, N), jnp.float32)]
                        if use_scratch else []),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*operands)


def _packed_bwd_kernel(heads, q_scale, whole, use_stats,
                       qkv_q_ref, k_ref, v_ref, bias_ref, *rest):
    """Packed-layout backward: everything stays (rows, channels).

    Mirrors :func:`_packed_kernel`'s layout so the PTv3 training hot
    path never leaves the packed (B, N, 3C) world: the old route
    (``_flash_bwd_call``) relayouts q/k/v/g and three grads through
    (B, H, N, D) tiles whose trailing D=16 pads 8x in HBM at PTv3 head
    width — measured as the bulk of the 2.4 ms/block attention backward
    (scripts/attr_bwd.py, round 4). dk/dv accumulate across q-blocks in
    the REVISITED output block (its index map is constant in the
    innermost grid axis, so Mosaic keeps it in VMEM and writes back
    once), exactly like the (B, H, N, D) backward.

    With ``use_stats`` the forward's log-sum-exp and the precomputed
    row term rowsum(do·o) arrive as (B, heads, N) inputs, so the
    softmax recompute is one exp and the (Bq, N) ``dp·p`` row-sum
    disappears — the same two flash-backward identities as
    ``window_attention._attn_bwd_kernel``.

    The scale is applied on load (s = (q·scale)·kᵀ, dk = dsᵀ·(q·scale))
    and on the dq store (dq = (ds·k)·scale).
    """
    if use_stats:
        (lse_ref, delta_ref, do_ref, dq_ref, dk_ref, dv_ref) = rest
    else:
        lse_ref = delta_ref = None
        (do_ref, dq_ref, dk_ref, dv_ref) = rest
    i = pl.program_id(2)  # q-block axis (innermost; grid padded to 3D)
    bias = bias_ref[0, 0][None, :]
    C = do_ref.shape[-1]
    D = C // heads
    k_base = C if whole else 0
    v_base = 2 * C if whole else 0
    for h in range(heads):
        lo = h * D
        q = qkv_q_ref[0, :, lo:lo + D] * jnp.asarray(
            q_scale, qkv_q_ref.dtype)                     # (Bq, D) scaled
        k = k_ref[0, :, k_base + lo:k_base + lo + D]      # (N, D)
        v = v_ref[0, :, v_base + lo:v_base + lo + D]
        do = do_ref[0, :, lo:lo + D]                      # (Bq, D)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (Bq, N)
        s = s + bias
        if use_stats:
            p = jnp.exp(s - lse_ref[0, h, :][:, None])
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                                1e-20)

        pt = p.astype(v.dtype)
        dv = jax.lax.dot_general(  # pᵀ do → (N, D)
            pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # do vᵀ → (Bq, N)
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = (delta_ref[0, h, :][:, None] if use_stats
               else jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = p * (dp - row)
        dsl = ds.astype(q.dtype)
        dq = jnp.dot(dsl, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(  # dsᵀ (q·scale) → (N, D)
            dsl, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, :, lo:lo + D] = (dq * q_scale).astype(dq_ref.dtype)

        @pl.when(i == 0)
        def _(dk_=dk, dv_=dv, lo_=lo):
            dk_ref[0, :, lo_:lo_ + D] = dk_
            dv_ref[0, :, lo_:lo_ + D] = dv_

        @pl.when(i > 0)
        def _(dk_=dk, dv_=dv, lo_=lo):
            dk_ref[0, :, lo_:lo_ + D] += dk_
            dv_ref[0, :, lo_:lo_ + D] += dv_


def _packed_bwd_call(qkv, bias, g, heads, block_q, q_scale, head_group,
                     lse=None, delta=None):
    """dqkv for :func:`flash_attention_packed` without leaving the
    packed layout. Returns (B, N, 3C) in qkv.dtype. ``lse``/``delta``
    (B, heads, N) f32, both or neither, switch the kernel to the
    stats-fed fast path."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    hg = heads if head_group is None else head_group
    G = heads // hg
    Cg = C // G
    whole = bool(C % 128) and G == 1
    nq = N // block_q
    use_stats = lse is not None

    if G > 1:
        def cspec(which, rows):
            if rows == N:
                return pl.BlockSpec(
                    (1, N, Cg), lambda b, h, i, w=which: (b, 0, w * G + h),
                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (1, rows, Cg), lambda b, h, i, w=which: (b, i, w * G + h),
                memory_space=pltpu.VMEM)

        bias_spec = pl.BlockSpec((1, 1, N), lambda b, h, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        do_spec = pl.BlockSpec((1, block_q, Cg),
                               lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM)
        dkv_spec = pl.BlockSpec((1, N, Cg), lambda b, h, i: (b, 0, h),
                                memory_space=pltpu.VMEM)
        stats_spec = pl.BlockSpec((1, hg, block_q),
                                  lambda b, h, i: (b, h, i),
                                  memory_space=pltpu.VMEM)
        grid = (B, G, nq)
    else:
        def cspec(which, rows):
            cols = C3 if whole else C
            wh = 0 if whole else which
            if rows == N:
                return pl.BlockSpec((1, N, cols),
                                    lambda b, _g, i, w=wh: (b, 0, w),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, rows, cols),
                                lambda b, _g, i, w=wh: (b, i, w),
                                memory_space=pltpu.VMEM)

        bias_spec = pl.BlockSpec((1, 1, N), lambda b, _g, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        do_spec = pl.BlockSpec((1, block_q, C),
                               lambda b, _g, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
        dkv_spec = pl.BlockSpec((1, N, C), lambda b, _g, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        stats_spec = pl.BlockSpec((1, heads, block_q),
                                  lambda b, _g, i: (b, 0, i),
                                  memory_space=pltpu.VMEM)
        grid = (B, 1, nq)

    in_specs = [cspec(0, block_q), cspec(1, N), cspec(2, N), bias_spec]
    operands = [qkv, qkv, qkv, bias]
    if use_stats:
        in_specs += [stats_spec, stats_spec]
        operands += [lse, delta]
    in_specs.append(do_spec)
    operands.append(g)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, hg,
                          1.0 if q_scale is None else q_scale, whole,
                          use_stats),
        out_shape=(jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, N, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, C), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(do_spec if G > 1 else pl.BlockSpec(
            (1, block_q, C), lambda b, _g, i: (b, i, 0),
            memory_space=pltpu.VMEM), dkv_spec, dkv_spec),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*operands)
    return jnp.concatenate(
        [dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1)


def _fap_fwd(qkv, key_bias, heads, block_q, rope_cos, rope_sin, q_scale,
             head_group):
    # rope-free (the PTv3 training hot path): save the forward's LSE and
    # output so the backward kernel skips the softmax row recomputes
    if rope_cos is None and _lse_layout_ok(heads, head_group, block_q,
                                           qkv.shape[1]):
        out, lse = _packed_fwd_call(qkv, key_bias, heads, block_q,
                                    None, None, q_scale, head_group,
                                    with_lse=True)
        return out, (qkv, key_bias, None, None, lse, out)
    return (flash_attention_packed(qkv, key_bias, heads, block_q,
                                   rope_cos, rope_sin, q_scale,
                                   head_group),
            (qkv, key_bias, rope_cos, rope_sin, None, None))


def _fap_bwd(heads, block_q, q_scale, head_group, res, g):
    """Backward. RoPE-free callers (the PTv3 stages — the training hot
    path) stay in the packed layout end to end via
    :func:`_packed_bwd_call`; with RoPE (ViT fine-tuning only) the
    (B,H,N,D) Pallas backward runs with explicit layout shuffles.

    RoPE/scale handling (rope path): forward computes
    attn(s·R(q), R(k), v), so dL/dq = s·Rᵀ(dL/d[s·Rq]) and
    dL/dk = Rᵀ(dL/d[Rk]) — the grads are inverse-rotated before
    repacking. rope_cos/rope_sin get ZERO grads (documented constants).
    """
    qkv, key_bias, rope_cos, rope_sin, lse, out = res
    if rope_cos is None:
        delta = None
        if lse is not None:
            B, N, C3 = qkv.shape
            C = C3 // 3
            D = C // heads
            delta = jnp.transpose(jnp.sum(
                (g.astype(jnp.float32) * out.astype(jnp.float32))
                .reshape(B, N, heads, D), axis=-1), (0, 2, 1))
        dqkv = _packed_bwd_call(qkv, key_bias.astype(jnp.float32), g,
                                heads, block_q, q_scale, head_group,
                                lse=lse, delta=delta)
        return dqkv, jnp.zeros_like(key_bias), None, None
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    scale = 1.0 if q_scale is None else q_scale

    def split(x, j):
        return x[..., j * C:(j + 1) * C].reshape(B, N, heads, D)

    def rot4(x, inverse=False):
        if rope_cos is None:
            return x
        cos = rope_cos[None, :, None, :].astype(jnp.float32)
        sin = rope_sin[None, :, None, :].astype(jnp.float32)
        if inverse:
            sin = -sin
        D2 = D // 2
        x1 = x[..., :D2].astype(jnp.float32)
        x2 = x[..., D2:].astype(jnp.float32)
        r1, r2 = _rot_halves(x1, x2, cos, sin)
        return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)

    q, k, v = (split(qkv, j) for j in range(3))
    qs = rot4(q) * jnp.asarray(scale, q.dtype)
    kr = rot4(k)

    def bhnd(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    gq = bhnd(g.reshape(B, N, heads, D))
    dqs, dkr, dv = _flash_bwd_call(bhnd(qs), bhnd(kr), bhnd(v),
                                   key_bias.astype(jnp.float32), gq,
                                   block_q)

    def back(x):
        return jnp.transpose(x, (0, 2, 1, 3))

    dq = rot4(back(dqs), inverse=True) * jnp.asarray(scale, qkv.dtype)
    dk = rot4(back(dkr), inverse=True)

    def flat(x):
        return x.reshape(B, N, C)

    dqkv = jnp.concatenate([flat(dq), flat(dk), flat(back(dv))], axis=-1)
    dcos = None if rope_cos is None else jnp.zeros_like(rope_cos)
    dsin = None if rope_sin is None else jnp.zeros_like(rope_sin)
    return dqkv, jnp.zeros_like(key_bias), dcos, dsin


flash_attention_packed.defvjp(_fap_fwd, _fap_bwd)


def _fa_fwd(q, k, v, block_q, key_bias=None):
    return flash_attention(q, k, v, block_q, key_bias), (q, k, v, key_bias)


def _fa_bwd(block_q, res, g):
    q, k, v, key_bias = res
    B, N, H, D = q.shape
    Np = ((N + block_q - 1) // block_q) * block_q
    pad = Np - N
    scale = 1.0 / (D ** 0.5)

    def bhnd(x):
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.transpose(x, (0, 2, 1, 3))

    if key_bias is None:
        bias = jnp.full((B, 1, Np), 0.0, jnp.float32)
        if pad:
            bias = bias.at[:, :, N:].set(_NEG)
    else:
        bias = jnp.pad(key_bias.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, pad)), constant_values=_NEG)

    qs = bhnd(q * jnp.asarray(scale, q.dtype))
    dq, dk, dv = _flash_bwd_call(qs, bhnd(k), bhnd(v), bias, bhnd(g),
                                 block_q)

    def back(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        return x[:, :N] if pad else x

    db = None if key_bias is None else jnp.zeros_like(key_bias)
    return (back(dq) * jnp.asarray(scale, q.dtype), back(dk), back(dv),
            db)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
