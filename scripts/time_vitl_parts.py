"""Decompose one ViT-L block at its exact geometry (honest slope timer).

Context (PERF.md "ViT-L"): the measured block is 9.75 ms x24 = 234 ms,
but the piecewise floor is ~6 ms/block (attention 212 GFLOP at the
D=64/deep-PV mix, dense 444 GFLOP at ~140 TFLOP/s) — the encode runs at
~61% of floor vs ViT-S's 85%. This script times every block piece at
B=6, N=2944, C=1024, H=16, D=64 to name the missing ~3.8 ms/block
(suspects: the (B,N,3C) pack concat = 108 MB copy, RoPE 4D traffic,
LN at C=1024, flash kernel tiling at block_q=368, relayouts between
pieces that XLA cannot fuse across the custom_vjp boundary).

Run bare on the TPU: python scripts/time_vitl_parts.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from tpu3dssf.kernels.flash_attention import (
        flash_attention, flash_attention_packed, pick_block_q,
        pick_head_group)
    from tpu3dssf.models.vit import (
        ViTBlock, _apply_rope, _rope_angles, dinov3_large)
    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    # VITL_PARTS_SMOKE=1: tiny geometry + interpret mode, CPU-runnable —
    # validates every call's shapes/API without a TPU (timings bogus)
    smoke = os.environ.get("VITL_PARTS_SMOKE") == "1"
    if smoke:
        from jax.experimental.pallas import tpu as pltpu
        interp = pltpu.force_tpu_interpret_mode()
        B, C, H = 2, 16, 2
        N, gh, gw = 128, 3, 5   # ViTBlock picks its own block_q(N)=128
        n_tok = 20
    else:
        interp = None
        B, C, H = 6, 1024, 16
        N = 2944        # 2845 tokens padded to the next 128 multiple
        gh, gw = 40, 71
        n_tok = 2845
    D = C // H
    bq = pick_block_q(N) if N % 128 == 0 and N >= 128 else min(N, 16)
    if interp is not None:
        interp.__enter__()
    print(f"geometry B={B} N={N} C={C} H={H} D={D} block_q={bq}")

    rows = {}

    def tb(name, fn, *args, iters=40):
        if smoke:  # one eager call: shape/API validation only
            jax.block_until_ready(fn(*args))
            rows[name] = 0.0
            print(f"{name:44s}   SMOKE-OK", flush=True)
            return 0.0
        dt = time_device(fn, *args, iters=iters)
        rows[name] = dt * 1e3
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt * 1e3

    # ---- attention pieces -------------------------------------------
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)) * 0.1, dtype)
    bias = jnp.zeros((B, 1, N), jnp.float32).at[:, :, n_tok:].set(-1e9)
    t_attn = tb("flash packed (one layer, single body)",
                jax.jit(lambda x, b: flash_attention_packed(x, b, H, bq)),
                qkv, bias)
    rows["flash packed (one layer)"] = rows[
        "flash packed (one layer, single body)"]

    # head-group variant (the ViT-L model route): ≤8 heads per body,
    # groups on the grid — vs the transposing (B,H,N,D) kernel below
    hg = pick_head_group(H, C)
    if hg is not None and hg < H:
        tb(f"flash packed head_group={hg}",
           jax.jit(lambda x, b: flash_attention_packed(
               x, b, H, bq, None, None, None, hg)), qkv, bias)
    x4t = jnp.asarray(rng.normal(size=(B, N, H, D)) * 0.1, dtype)
    tb("flash (B,H,N,D) kernel incl. transposes",
       jax.jit(lambda q_, k_, v_: flash_attention(q_, k_, v_, bq, bias)),
       x4t, x4t, x4t)
    if not smoke:
        flops = 4 * B * H * N * N * D
        print(f"    -> {flops / (t_attn/1e3) / 1e12:.1f} TFLOP/s "
              f"(attn matmuls only; QK ceiling 75.5, PV ~140)")

        # attention at N=3072 with nicer tiles — is block_q=368 bad?
        N2 = 3072
        qkv2 = jnp.asarray(rng.normal(size=(B, N2, 3 * C)) * 0.1, dtype)
        bias2 = jnp.zeros((B, 1, N2), jnp.float32).at[:, :, n_tok:].set(
            -1e9)
        for bq2 in (384, 256, 128):
            t2 = tb(f"flash packed N=3072 block_q={bq2}",
                    jax.jit(lambda x, b, _bq=bq2:
                            flash_attention_packed(x, b, H, _bq)),
                    qkv2, bias2)
            f2 = 4 * B * H * N2 * N2 * D
            print(f"    -> {f2 / (t2/1e3) / 1e12:.1f} TFLOP/s")

    angles_p = jnp.pad(_rope_angles(gh, gw, D),
                       ((0, N - 5 - gh * gw), (0, 0)))
    x4 = jnp.asarray(rng.normal(size=(B, N, H, D)) * 0.1, dtype)
    tb("_apply_rope on (B,N,H,D) x2 (q and k)",
       jax.jit(lambda a: (_apply_rope(a, angles_p, 5),
                          _apply_rope(a, angles_p, 5))), x4)

    # the pack concat alone: 3x (B,N,C) -> (B,N,3C) is a 108 MB copy
    q3 = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
    tb("pack concat [q|k|v] -> (B,N,3C)",
       jax.jit(lambda a: jnp.concatenate([a, a + 1, a + 2], axis=-1)),
       q3, iters=100)

    def flash_branch(qkv_, b_):
        q = qkv_[..., :C].reshape(B, N, H, D)
        k = qkv_[..., C:2 * C].reshape(B, N, H, D)
        q = _apply_rope(q, angles_p, 5)
        k = _apply_rope(k, angles_p, 5)
        q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
        packed = jnp.concatenate(
            [q.reshape(B, N, C), k.reshape(B, N, C), qkv_[..., 2 * C:]],
            axis=-1)
        return flash_attention_packed(packed, b_, H, bq)
    tb("flash branch (rope+pack+attn)", jax.jit(flash_branch), qkv, bias)

    # in-kernel rope variant (ViT-S verdict: 2.6x WORSE; C=1024 may
    # differ — the pack concat it avoids is 4x bigger here). Full-N
    # cos/sin with identity rows for the 5 prefix and padded tail slots.
    ang = _rope_angles(gh, gw, D)
    n_pre, d2 = 5, D // 2
    pad_rows = N - n_pre - gh * gw
    cos = jnp.concatenate([jnp.ones((n_pre, d2)), jnp.cos(ang),
                           jnp.ones((pad_rows, d2))]).astype(jnp.float32)
    sin = jnp.concatenate([jnp.zeros((n_pre, d2)), jnp.sin(ang),
                           jnp.zeros((pad_rows, d2))]).astype(jnp.float32)
    tb("flash packed + IN-KERNEL rope",
       jax.jit(lambda x, b: flash_attention_packed(
           x, b, H, bq, cos, sin, 1.0 / (D ** 0.5))),
       qkv, bias)

    # ---- dense pieces ------------------------------------------------
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
    for name, dout in (("qkv dense C->3C", 3 * C),
                       ("proj dense C->C", C),
                       ("mlp_in C->4C", 4 * C),
                       ("mlp_out 4C->C", None)):
        if dout is None:
            xin = jnp.asarray(rng.normal(size=(B, N, 4 * C)) * 0.1, dtype)
            dn = nn.Dense(C, dtype=dtype)
        else:
            xin = x
            dn = nn.Dense(dout, dtype=dtype)
        dp = jax.jit(dn.init)(jax.random.PRNGKey(0), xin)
        t = tb(name, jax.jit(lambda xx, _d=dn, _p=dp: _d.apply(_p, xx)),
               xin, iters=100)
        if not smoke:
            kk = xin.shape[-1]
            nn_out = dout if dout is not None else C
            print(f"    -> {2*B*N*kk*nn_out / (t/1e3) / 1e12:.1f} "
                  f"TFLOP/s")

    ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    lp = jax.jit(ln.init)(jax.random.PRNGKey(0), x)
    tb("LayerNorm (B,N,C)", jax.jit(lambda xx: ln.apply(lp, xx)), x,
       iters=100)

    xh = jnp.asarray(rng.normal(size=(B, N, 4 * C)) * 0.1, dtype)
    tb("gelu (B,N,4C)", jax.jit(jax.nn.gelu), xh, iters=100)

    # ---- the whole block, and block minus attention ------------------
    cfg = dataclasses.replace(dinov3_large(), dtype=dtype, use_flash=True,
                              layerscale_init=None, hidden_size=C,
                              num_heads=H)
    blk = ViTBlock(cfg)
    bp = jax.jit(blk.init)(jax.random.PRNGKey(0), x, angles_p, bias)
    t_blk = tb("one ViT-L block (LN+attn+MLP)",
               jax.jit(lambda xx: blk.apply(bp, xx, angles_p, bias)), x,
               iters=20)
    print(f"    -> x24 layers = {24 * t_blk:.1f} ms")

    pieces = (rows["flash branch (rope+pack+attn)"]
              + rows["qkv dense C->3C"] + rows["proj dense C->C"]
              + rows["mlp_in C->4C"] + rows["mlp_out 4C->C"]
              + 2 * rows["LayerNorm (B,N,C)"] + rows["gelu (B,N,4C)"])
    print(f"piece sum {pieces:.2f} ms vs block {t_blk:.2f} ms "
          f"(residual adds / fusion gaps = {t_blk - pieces:+.2f} ms)")


if __name__ == "__main__":
    main()
