"""A/B the small-C (32/64) window-attention routes, fwd and fwd+bwd.

The C%128!=0 PTv3 stages route to the (W, K, H, D) window kernel
(tpu3dssf/models/ptv3.py::SerializedAttention) — a choice made before
the packed backward existed. The packed kernel's whole-3C mode is legal
at any C (block last dim equals the array dim) and never leaves the
(rows, channels) layout, while the window route pays (W, K, H, D)
transposes whose trailing D=16 tiles pad 8x in lanes. This measures
both routes at the exact enc0/enc1/dec0/dec1 train shapes:

    python scripts/time_smallc_attn.py      # real TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.kernels.flash_attention import flash_attention_packed
    from tpu3dssf.kernels.window_attention import window_attention
    from tpu3dssf.utils.timing import time_device

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    B, K = 2, 1024

    # (name, N per sample, C, H) at flagship geometry
    stages = [("enc0", 25600, 32, 2), ("enc1", 13312, 64, 4),
              ("dec0", 25600, 64, 4), ("dec1", 13312, 64, 4)]

    for name, n, C, H in stages:
        W = B * (n // K)
        D = C // H
        scale = 1.0 / (D ** 0.5)
        qkv = jnp.asarray(rng.normal(size=(W, K, 3 * C)) * 0.1, dtype)
        mask = jnp.ones((W, K), bool)
        bias = jnp.zeros((W, 1, K), jnp.float32)
        g = jnp.asarray(rng.normal(size=(W, K, C)) * 0.1, dtype)

        def win_f(qkv, g):
            q, k, v = (x[..., 0, :, :] for x in jnp.split(
                qkv.reshape(W, K, 3, H, D), 3, axis=2))
            return jnp.sum(window_attention(q, k, v, mask, True)
                           .astype(jnp.float32))

        def win_fb(qkv, g):
            q4 = qkv.reshape(W, K, 3, H, D)
            q, k, v = q4[:, :, 0], q4[:, :, 1], q4[:, :, 2]
            out, vjp = jax.vjp(
                lambda qq, kk, vv: window_attention(qq, kk, vv, mask,
                                                    True), q, k, v)
            dq, dk, dv = vjp(g.reshape(W, K, H, D))
            return (jnp.sum(dq.astype(jnp.float32))
                    + jnp.sum(dk.astype(jnp.float32))
                    + jnp.sum(dv.astype(jnp.float32)))

        def packed_f(qkv, g):
            return jnp.sum(flash_attention_packed(
                qkv, bias, H, 256, None, None, scale, None)
                .astype(jnp.float32))

        def packed_fb(qkv, g):
            out, vjp = jax.vjp(
                lambda p: flash_attention_packed(p, bias, H, 256, None,
                                                 None, scale, None), qkv)
            (dqkv,) = vjp(g)
            return jnp.sum(dqkv.astype(jnp.float32))

        from tpu3dssf.kernels.window_attention import (
            window_attention_packed)

        def hybrid_fb(qkv, g):
            out, vjp = jax.vjp(
                lambda p: window_attention_packed(p, mask, H), qkv)
            (dqkv,) = vjp(g)
            return jnp.sum(dqkv.astype(jnp.float32))

        it = 100 if n <= 13312 else 50
        rows = []
        for label, fn in (("window fwd", win_f), ("window f+b", win_fb),
                          ("packed fwd", packed_f),
                          ("packed f+b", packed_fb),
                          ("hybrid f+b", hybrid_fb)):
            try:
                dt = time_device(fn, qkv, g, iters=it)
                rows.append(f"{label} {dt*1e3:7.3f} ms")
            except Exception as e:
                rows.append(f"{label} FAIL {type(e).__name__}: "
                            f"{str(e)[:120]}")
        print(f"{name} (W={W}, K={K}, C={C}, H={H}): " + " | ".join(rows))


if __name__ == "__main__":
    main()
