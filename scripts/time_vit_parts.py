"""Pinpoint the ViT encode budget with the honest (slope) timer.

Context: ViT-S x6 cams measures 24.6 ms. Attention matmuls at the padded
geometry (B=6, N=3072, H=6, D=64) are ~1.04 TFLOP — a ~14 ms floor at
the D=64 MXU ceiling — so the interesting question is where the other
~10 ms go (RoPE 4D intermediates, LN, reshape/concat traffic, patch
embed, final LN).

Run bare on the TPU: python scripts/time_vit_parts.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from tpu3dssf.utils.timing import time_device
    from tpu3dssf.models.vit import (
        VisionTransformer, ViTBlock, dinov3_small, _rope_angles,
        _apply_rope, fold_layerscale)
    from tpu3dssf.kernels.flash_attention import flash_attention_packed
    import dataclasses

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    B, C, H, D = 6, 384, 6, 64
    N = 3072            # padded token count used by the flash path
    gh, gw = 40, 71

    def tb(name, fn, *args, iters=40):
        dt = time_device(fn, *args, iters=iters)
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt * 1e3

    # 1. one flash_attention_packed call at layer shape
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)) * 0.1, dtype)
    bias = jnp.zeros((B, 1, N), jnp.float32).at[:, :, 2845:].set(-1e9)
    t_attn = tb("flash packed (one layer)",
                jax.jit(lambda x, b: flash_attention_packed(x, b, H, 256)),
                qkv, bias)
    flops = 4 * B * H * N * N * D
    print(f"    -> {flops / (t_attn/1e3) / 1e12:.1f} TFLOP/s "
          f"(attn matmuls only)")

    # head-group variant (ViT-L's route): does splitting the 6-head
    # body into 3 two-head grid groups help or hurt at ViT-S width?
    # (k/v re-fetch per group vs smaller body)
    tb("flash packed head_group=2 (G=3)",
       jax.jit(lambda x, b: flash_attention_packed(
           x, b, H, 256, None, None, None, 2)), qkv, bias)

    # 2. RoPE application cost (q and k, one layer, as the block does it)
    angles_p = jnp.pad(_rope_angles(gh, gw, D), ((0, N - 5 - gh * gw),
                                                 (0, 0)))
    x4 = jnp.asarray(rng.normal(size=(B, N, H, D)) * 0.1, dtype)
    tb("_apply_rope on (B,N,H,D) x2 (q and k)",
       jax.jit(lambda a: (_apply_rope(a, angles_p, 5),
                          _apply_rope(a, angles_p, 5))), x4)

    # 3. the full flash branch of one block (outside rope + pack + attn
    #    — measured 2.6x faster than rotating inside the kernel)
    def flash_branch(qkv_, b_):
        q = qkv_[..., :C].reshape(B, N, H, D)
        k = qkv_[..., C:2 * C].reshape(B, N, H, D)
        q = _apply_rope(q, angles_p, 5)
        k = _apply_rope(k, angles_p, 5)
        q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
        packed = jnp.concatenate(
            [q.reshape(B, N, C), k.reshape(B, N, C), qkv_[..., 2 * C:]],
            axis=-1)
        return flash_attention_packed(packed, b_, H, 256)
    tb("flash branch (rope+pack+attn)", jax.jit(flash_branch), qkv, bias)

    # 4. one full ViT block
    cfg = dataclasses.replace(dinov3_small(), dtype=dtype, use_flash=True,
                              layerscale_init=None)
    blk = ViTBlock(cfg)
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
    bp = jax.jit(blk.init)(jax.random.PRNGKey(0), x, angles_p, bias)
    t_blk = tb("one ViT block (LN+attn+MLP)",
               jax.jit(lambda xx: blk.apply(bp, xx, angles_p, bias)), x)
    print(f"    -> x12 layers = {12 * t_blk:.1f} ms")

    # 5. LN alone, MLP denses alone
    import flax.linen as nn
    ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    lp = jax.jit(ln.init)(jax.random.PRNGKey(0), x)
    tb("LayerNorm (B,N,C)", jax.jit(lambda xx: ln.apply(lp, xx)), x,
       iters=100)

    dn = nn.Dense(4 * C, dtype=dtype)
    dp = jax.jit(dn.init)(jax.random.PRNGKey(0), x)
    tb("Dense C->4C", jax.jit(lambda xx: dn.apply(dp, xx)), x, iters=100)

    # 5b. the full MLP chain (round 5): the block's non-attention math.
    # 2 matmuls = 43.5 GFLOP -> 0.28 ms at the 153 TFLOP/s peak; how
    # close does XLA get with the gelu fused in, and does the gelu
    # cost anything on top of the matmuls?
    dd = nn.Dense(C, dtype=dtype)
    ddp = jax.jit(dd.init)(jax.random.PRNGKey(1),
                           jnp.zeros((B, N, 4 * C), dtype))
    t_mlp = tb("MLP chain (C->4C, gelu, 4C->C)",
               jax.jit(lambda xx: dd.apply(ddp, nn.gelu(
                   dn.apply(dp, xx)))), x, iters=100)
    mlp_flops = 4 * B * N * C * 4 * C
    print(f"    -> {mlp_flops / (t_mlp/1e3) / 1e12:.1f} TFLOP/s "
          f"(matmul FLOPs only)")
    tb("MLP matmuls only (no gelu)",
       jax.jit(lambda xx: dd.apply(ddp, dn.apply(dp, xx))), x,
       iters=100)

    # 6. whole ViT encode (the component-bench row, for consistency)
    vit_cfg = dataclasses.replace(dinov3_small(), dtype=dtype,
                                  use_flash=True, scan_layers=True)
    vit = VisionTransformer(vit_cfg)
    imgs = jnp.asarray(rng.normal(size=(B, 640, 1138, 3)), dtype)
    vp = jax.jit(vit.init)(jax.random.PRNGKey(0), imgs)
    vp, vit_cfg2 = fold_layerscale(vp, vit_cfg)
    vit2 = VisionTransformer(vit_cfg2)
    tb("full ViT encode x6 (scan, folded LS)",
       jax.jit(lambda im: vit2.apply(vp, im)["patch_features"]), imgs,
       iters=20)

    # 7. patch embed conv alone
    emb = nn.Conv(C, kernel_size=(16, 16), strides=(16, 16),
                  padding="VALID", dtype=dtype)
    ep = jax.jit(emb.init)(jax.random.PRNGKey(0), imgs)
    tb("patch embed conv", jax.jit(lambda im: emb.apply(ep, im)), imgs,
       iters=40)

    # 8. ViT-L backbone (BASELINE config 5) — gated, long compile
    if os.environ.get("BENCH_VITL") == "1":
        from tpu3dssf.models.vit import dinov3_large
        l_cfg = dataclasses.replace(dinov3_large(), dtype=dtype,
                                    use_flash=True, scan_layers=True)
        vitl = VisionTransformer(l_cfg)
        lp = jax.jit(vitl.init)(jax.random.PRNGKey(0), imgs)
        lp, l_cfg2 = fold_layerscale(lp, l_cfg)
        vitl2 = VisionTransformer(l_cfg2)
        tb("ViT-L x6 encode (scan, folded LS)",
           jax.jit(lambda im: vitl2.apply(lp, im)["patch_features"]),
           imgs, iters=10)


if __name__ == "__main__":
    main()
