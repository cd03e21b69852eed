"""Pinpoint PTv3's time budget: block pieces at each pyramid level."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOW = 1024
B = int(os.environ.get("PTV3_B", "1"))


def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from tpu3dssf.utils.timing import time_device
    from tpu3dssf.models.ptv3 import (PTv3Block, SerializedCPE,
                                      _serialize_perms, PTv3Config)
    from tpu3dssf.kernels import window_attention
    from tpu3dssf.serialization import SERIALIZATION_ORDERS

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    cfg = PTv3Config()

    # (N, C, H) per encoder stage at the bench capacities
    caps = cfg.capacities(25600)
    print("caps:", caps, "B:", B)

    def tb(name, fn, *args, iters=50):
        dt = time_device(fn, *args, iters=iters)
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt * 1e3

    total_attn = 0.0
    total_blk = 0.0
    for s, (N, C, H) in enumerate(zip(caps, cfg.enc_channels,
                                      cfg.enc_heads)):
        x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
        grid = jnp.asarray(rng.integers(0, 512, (B, N, 3)), jnp.int32)
        mask = jnp.ones((B, N), bool)

        # window attention alone at this stage's shape
        K = min(WINDOW, N)
        W = N // K
        D = C // H
        q = jnp.asarray(rng.normal(size=(B * W, K, H, D)), dtype)
        km = np.ones((B * W, K), bool)
        dt = tb(f"s{s} window_attn N={N} C={C} h={H}",
                jax.jit(lambda a, b, c: window_attention(
                    a, b, c, jnp.asarray(km), True)), q, q, q)
        total_attn += dt * cfg.enc_depths[s]

        # full block (CPE + attn + MLP) with sorted-space CPE + real perm
        perms = _serialize_perms(grid, mask, ("z", "z-trans"))
        blk = PTv3Block(C, H, WINDOW, 4.0, use_pallas=True, dtype=dtype)
        p_rel, i_rel = perms["z-trans"]
        bp = jax.jit(blk.init, static_argnums=(5,))(
            jax.random.PRNGKey(0), x, p_rel, i_rel, mask, True)
        f = jax.jit(lambda xx, pp, ii: blk.apply(bp, xx, pp, ii, mask,
                                                 True))
        dt = tb(f"s{s} full block N={N} C={C}", f, x, p_rel, i_rel)
        total_blk += dt * cfg.enc_depths[s]

        # serialization sort cost at this level (4 orders)
        tb(f"s{s} serialize 4 orders N={N}",
           jax.jit(lambda g, m: _serialize_perms(
               g, m, SERIALIZATION_ORDERS)), grid, mask, iters=20)

    print(f"encoder attn sum (depth-weighted)  {total_attn:.2f} ms")
    print(f"encoder block sum (depth-weighted) {total_blk:.2f} ms")

    # ---- the glue: pooling / unpooling / CPE / MLP per stage ----
    from tpu3dssf.models.ptv3 import (SerializedPooling,
                                      SerializedUnpooling)
    import flax.linen as nn

    for s in range(1, 5):
        N_in, C_in = caps[s - 1], cfg.enc_channels[s - 1]
        N_out, C_out = caps[s], cfg.enc_channels[s]
        x = jnp.asarray(rng.normal(size=(B, N_in, C_in)) * 0.1, dtype)
        grid = jnp.sort(jnp.asarray(
            rng.integers(0, 512, (B, N_in, 3)), jnp.int32), axis=1)
        mask = jnp.ones((B, N_in), bool)
        pool = SerializedPooling(C_out, N_out, presorted=True, dtype=dtype)
        pp = jax.jit(pool.init)(jax.random.PRNGKey(0), x, grid, mask)
        tb(f"pool{s} {N_in}->{N_out} C={C_out}",
           jax.jit(lambda a, g, m: pool.apply(pp, a, g, m)[0]),
           x, grid, mask)

    for d in range(4):
        N_f, C_f = caps[d], cfg.dec_channels[d]
        N_c = caps[d + 1]
        C_c = cfg.enc_channels[d + 1] if d == 3 else cfg.dec_channels[d + 1]
        xc = jnp.asarray(rng.normal(size=(B, N_c, C_c)) * 0.1, dtype)
        sk = jnp.asarray(
            rng.normal(size=(B, N_f, cfg.enc_channels[d])) * 0.1, dtype)
        parent = jnp.asarray(
            rng.integers(0, N_c, (B, N_f)), jnp.int32)
        pok = jnp.ones((B, N_f), bool)
        mf = jnp.ones((B, N_f), bool)
        up = SerializedUnpooling(C_f, dtype=dtype)
        upp = jax.jit(up.init)(jax.random.PRNGKey(0), xc, sk, parent,
                               pok, mf)
        tb(f"unpool{d} {N_c}->{N_f} C={C_f}",
           jax.jit(lambda a, b, p, o, m: up.apply(upp, a, b, p, o, m)),
           xc, sk, parent, pok, mf)

    # CPE alone and MLP alone at s0 / s3 shapes
    for s in (0, 3):
        N, C = caps[s], cfg.enc_channels[s]
        x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, dtype)
        mask = jnp.ones((B, N), bool)
        cpe = SerializedCPE(C, dtype=dtype)
        cp = jax.jit(cpe.init)(jax.random.PRNGKey(0), x, None, None, mask)
        tb(f"s{s} CPE (dwconv+dense) N={N} C={C}",
           jax.jit(lambda a, m: cpe.apply(cp, a, None, None, m)), x, mask)

        mlp_in = nn.Dense(int(C * 4), dtype=dtype)
        mi = jax.jit(mlp_in.init)(jax.random.PRNGKey(0), x)
        tb(f"s{s} MLP denses N={N} C={C}",
           jax.jit(lambda a: mlp_in.apply(mi, a)), x)

    # full model for cross-check
    from tpu3dssf.models.ptv3 import PointTransformerV3
    import dataclasses
    model = PointTransformerV3(dataclasses.replace(cfg, dtype=dtype))
    feat = jnp.asarray(rng.normal(size=(B, caps[0], 4)), dtype)
    grid = jnp.asarray(rng.integers(0, 512, (B, caps[0], 3)), jnp.int32)
    mask = jnp.ones((B, caps[0]), bool)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), feat, grid, mask)
    tb("FULL PTv3 (25.6k)",
       jax.jit(lambda f, g, m: model.apply(mp, f, g, m)[0]),
       feat, grid, mask, iters=20)


if __name__ == "__main__":
    main()
