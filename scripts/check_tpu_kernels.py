"""Real-TPU lowering checks for the Pallas kernels.

Interpret-mode tests (tests/) validate kernel SEMANTICS but not the
Mosaic lowering: the round-3 packed-route switch first failed on chip
with C-wide channel blocks at C=32/64 — a constraint interpret mode
never enforces (block last dim must divide 128 or equal the array dim).
This script runs both packed-flash modes on the actual TPU and compares
against the XLA window-attention oracle:

  * whole-3C block mode (C % 128 != 0 — here C=32): the fallback that
    keeps k/v blocks at 3C width and offsets channels in-kernel;
  * C-wide channel-block mode (C % 128 == 0 — here C=128): the fast
    path PTv3 s2+ and the ViT use.

Run bare (grabs the TPU): python scripts/check_tpu_kernels.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(B, N, C, H, head_group=None):
    import jax
    import jax.numpy as jnp
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  pick_block_q)
    from tpu3dssf.kernels.window_attention import window_attention

    D = C // H
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
    bias = jnp.zeros((B, 1, N), jnp.float32)
    out = jax.jit(lambda x, b: flash_attention_packed(
        x, b, H, pick_block_q(N), None, None, 1.0 / D ** 0.5,
        head_group))(qkv, bias)
    out = np.asarray(jax.block_until_ready(out), np.float32)

    q, k, v = (np.asarray(qkv, np.float32).reshape(B, N, 3, H, D)[:, :, i]
               for i in range(3))
    ref = np.asarray(window_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.ones((B, N), bool), False),
        np.float32).reshape(B, N, C)
    err = float(np.abs(out - ref).max())
    mode = ("whole-3C" if C % 128 else
            f"head-group={head_group}" if head_group else "channel-block")
    print(f"packed flash {mode:13s} (B={B}, N={N}, C={C}, H={H}): "
          f"max|err| vs XLA = {err:.4f}")
    assert err < 0.05, (mode, err)


def check_window(W, K, H, D):
    """The Pallas window_attention kernel itself (PTv3 C=32/64 stages
    still route here, not to the packed kernel) vs its XLA fallback."""
    import jax
    import jax.numpy as jnp
    from tpu3dssf.kernels.window_attention import window_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    mask = np.ones((W, K), bool)
    mask[:, K - 37:] = False
    mask = jnp.asarray(mask)
    out_p = np.asarray(jax.block_until_ready(jax.jit(
        lambda *a: window_attention(*a, True))(q, k, v, mask)),
        np.float32)
    out_x = np.asarray(window_attention(q, k, v, mask, False), np.float32)
    err = float(np.abs(out_p - out_x).max())
    print(f"window_attention Pallas (W={W}, K={K}, H={H}, D={D}): "
          f"max|err| vs XLA = {err:.4f}")
    assert err < 0.05, err


def check_bwd_window(W, K, H, D):
    """Pallas window fwd+bwd (stats-fed: saved LSE + rowsum(do*o))
    vs the XLA reference vjp, ON CHIP (the (1,1,K,1) stats blocks and
    the exp(s-lse) path have real-TPU-only layout constraints)."""
    import jax
    import jax.numpy as jnp
    from tpu3dssf.kernels.window_attention import window_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    mask = np.ones((W, K), bool)
    mask[:, K - 37:] = False
    mask = jnp.asarray(mask)

    def loss(q_, k_, v_, pallas):
        o = window_attention(q_, k_, v_, mask, pallas)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(functools.partial(loss, pallas=True),
                          argnums=(0, 1, 2)))(q, k, v)
    gx = jax.grad(functools.partial(loss, pallas=False),
                  argnums=(0, 1, 2))(q, k, v)
    err = max(float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
              for a, b in zip(gp, gx))
    scale = max(float(jnp.abs(b.astype(jnp.float32)).max()) for b in gx)
    print(f"window_attention bwd (W={W}, K={K}, H={H}, D={D}): "
          f"max|dgrad| vs XLA = {err:.4f} (grad scale {scale:.1f})")
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def check_bwd_packed(B, N, C, H, head_group=None):
    """Packed flash fwd+bwd (stats-fed (B, heads, N) LSE/delta blocks)
    vs the XLA reference vjp, ON CHIP."""
    import jax
    import jax.numpy as jnp
    from tpu3dssf.kernels.flash_attention import (flash_attention_packed,
                                                  pick_block_q)
    from tpu3dssf.kernels.window_attention import window_attention

    D = C // H
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)), jnp.bfloat16)
    bias = jnp.zeros((B, 1, N), jnp.float32)

    def loss_p(x):
        o = flash_attention_packed(x, bias, H, pick_block_q(N), None,
                                   None, 1.0 / D ** 0.5, head_group)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_x(x):
        q, k, v = (x.reshape(B, N, 3, H, D)[:, :, i] for i in range(3))
        o = window_attention(q, k, v, jnp.ones((B, N), bool), False)
        return jnp.sum(o.reshape(B, N, C).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_p))(qkv)
    gx = jax.grad(loss_x)(qkv)
    err = float(jnp.abs(gp.astype(jnp.float32)
                        - gx.astype(jnp.float32)).max())
    scale = float(jnp.abs(gx.astype(jnp.float32)).max())
    mode = ("whole-3C" if C % 128 else
            f"head-group={head_group}" if head_group else "channel-block")
    print(f"packed flash bwd {mode:13s} (B={B}, N={N}, C={C}, H={H}): "
          f"max|dgrad| vs XLA = {err:.4f} (grad scale {scale:.1f})")
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def main():
    import jax
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    print("backend:", jax.default_backend())
    check(B=25, N=1024, C=32, H=2)     # PTv3 s0 geometry -> whole-3C
    check(B=4, N=1024, C=128, H=2)     # PTv3 s2 geometry -> channel-block
    check_window(W=25, K=1024, H=2, D=16)   # PTv3 s0 window route
    # ViT-L many-head route: 16 heads, 2 groups of 8 on the grid
    check(B=2, N=1024, C=1024, H=16, head_group=8)
    # PTv3 s3-dec/s4 many-head window geometry (H=16/32 -> head groups)
    check(B=4, N=1024, C=256, H=16, head_group=8)
    check(B=2, N=1024, C=512, H=32, head_group=8)
    # training directions (stats-fed backward kernels)
    check_bwd_window(W=25, K=1024, H=2, D=16)    # PTv3 s0/s1 + small-C
    check_bwd_packed(B=4, N=1024, C=128, H=8)    # s2 channel-block
    check_bwd_packed(B=2, N=1024, C=512, H=32, head_group=8)  # s4 groups
    print("OK")


if __name__ == "__main__":
    main()
