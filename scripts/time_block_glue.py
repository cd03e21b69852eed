"""Micro-timing of PTv3 block glue sub-ops (VERDICT r2 #9).

The non-attention part of a block is ~0.39 ms at stage 0 while every
sub-op's bandwidth budget says ~10-20 us. This times each sub-op alone
at every stage's (N, C) so the fusion target is data, not theory.

Run bare: python scripts/time_block_glue.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    B = int(os.environ.get("GLUE_B", "1"))
    print("B =", B)
    rng = np.random.default_rng(0)

    def tb(name, fn, *args, iters=200):
        dt = time_device(jax.jit(fn), *args, iters=iters)
        print(f"{name:40s} {dt*1e6:9.1f} us", flush=True)
        return dt

    for (N, C) in [(25600, 32), (13312, 64), (7168, 128), (4096, 256),
                   (2048, 512)]:
        print(f"---- N={N} C={C} ----", flush=True)
        x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
        mask = jnp.ones((B, N), bool)
        perm = jnp.asarray(
            np.stack([rng.permutation(N) for _ in range(B)]), jnp.int32)
        w_qkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, dtype)
        w_proj = jnp.asarray(rng.normal(size=(C, C)) * 0.05, dtype)
        w_in = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.05, dtype)
        w_out = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.05, dtype)
        g = jnp.ones((C,), dtype)
        b = jnp.zeros((C,), dtype)

        ln = nn.LayerNorm(dtype=dtype)
        lp = ln.init(jax.random.PRNGKey(0), x)
        tb("LayerNorm", lambda a: ln.apply(lp, a), x)
        tb("qkv dot (C->3C)", lambda a: jnp.einsum(
            "bnc,cd->bnd", a, w_qkv), x)
        qkv = jnp.einsum("bnc,cd->bnd", x, w_qkv)
        tb("row gather 3C", lambda q, p: jnp.take_along_axis(
            q, p[..., None], axis=1), qkv, perm)
        tb("row gather C", lambda a, p: jnp.take_along_axis(
            a, p[..., None], axis=1), x, perm)
        tb("proj dot + residual", lambda a: a + jnp.einsum(
            "bnc,cd->bnd", a, w_proj), x)
        tb("mlp in+gelu+out", lambda a: jnp.einsum(
            "bnd,dc->bnc", nn.gelu(jnp.einsum("bnc,cd->bnd", a, w_in)),
            w_out), x)
        tb("residual+mask", lambda a, c: (a + c) * mask[..., None],
           x, x)
        tb("LN+qkv chained", lambda a: jnp.einsum(
            "bnc,cd->bnd", ln.apply(lp, a), w_qkv), x)
        # full non-attn glue chained as the block runs it
        def glue(a, p):
            h = ln.apply(lp, a)
            q = jnp.einsum("bnc,cd->bnd", h, w_qkv)
            qs = jnp.take_along_axis(q, p[..., None], axis=1)
            o = qs[..., :C]  # stand-in for attention output
            o = jnp.take_along_axis(o, p[..., None], axis=1)
            a = a + jnp.einsum("bnc,cd->bnd", o, w_proj)
            h = ln.apply(lp, a)
            h = jnp.einsum("bnc,cd->bnd", h, w_in)
            h = nn.gelu(h)
            a = a + jnp.einsum("bnd,dc->bnc", h, w_out)
            return a * mask[..., None]
        tb("ALL glue chained", glue, x, perm)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
