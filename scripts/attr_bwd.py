"""Attribute the train-step backward pass, op class by op class.

VERDICT r3 weak #1: the ~70 ms backward (2/3 of the train step) had no
per-op breakdown. jax.profiler on the tunneled axon transport doesn't
capture device ops reliably, so this measures the same way every PERF.md
number is measured — the two-point slope timer — on ISOLATED pieces at
the exact train shapes (B=2, 25.6k voxels, full PTv3 geometry):

  * per-stage PTv3Block fwd and fwd+bwd (params+input grads, all live);
  * the permutation-gather vjp: XLA scatter-add vs inverse-perm gather;
  * pooling / unpooling vjp;
  * devoxelize own-voxel gather vjp (scatter-add into voxels);
  * CE+Lovász loss vjp;
  * AdamW update at full param count.

    python scripts/attr_bwd.py            # real TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def live(tree):
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number))


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from tpu3dssf.models.ptv3 import PTv3Block, PTv3Config, \
        SerializedPooling, SerializedUnpooling
    from tpu3dssf.serialization import inverse_permutation, \
        permutation_gather
    from tpu3dssf.losses import CELSLoss
    from tpu3dssf.utils.timing import time_device

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B, N0 = 2, 25600
    cfg = PTv3Config(use_pallas=on_tpu, dtype=dtype)
    caps = cfg.capacities(N0)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    rows = []

    def row(name, ms_f, ms_fb, count=1):
        rows.append((name, ms_f, ms_fb, count))
        tot = "" if count == 1 else f"  x{count} = {count*(ms_fb-ms_f):6.2f} ms bwd total"
        print(f"{name:42s} fwd {ms_f:7.3f} ms | fwd+bwd {ms_fb:7.3f} ms "
              f"| bwd {ms_fb-ms_f:7.3f} ms{tot}")

    def perms_for(n):
        perm = jnp.stack([jnp.asarray(rng.permutation(n), jnp.int32)
                          for _ in range(B)])
        inv = jax.vmap(inverse_permutation)(perm)
        return perm, inv

    # ---- per-stage blocks (encoder + decoder geometry) ----
    stage_list = (
        [(f"enc{s}", caps[s], cfg.enc_channels[s], cfg.enc_heads[s],
          cfg.enc_window[s], cfg.enc_depths[s]) for s in range(5)] +
        [(f"dec{d}", caps[d], cfg.dec_channels[d], cfg.dec_heads[d],
          cfg.dec_window[d], cfg.dec_depths[d]) for d in range(4)])

    block_bwd_total = 0.0
    for name, n, C, H, W, depth in stage_list:
        x = jnp.asarray(rng.normal(size=(B, n, C)) * 0.1, dtype)
        mask = jnp.ones((B, n), bool)
        perm, inv = perms_for(n)
        blk = PTv3Block(C, H, min(W, n), cfg.mlp_ratio,
                        use_pallas=cfg.use_pallas, dtype=dtype)
        params = jax.jit(blk.init)(key, x, perm, inv, mask)

        def fwd(p, xx, blk=blk, perm=perm, inv=inv, mask=mask):
            return blk.apply(p, xx, perm, inv, mask)

        def fwd_bwd(p, xx, fwd=fwd):
            val, grads = jax.value_and_grad(
                lambda p, xx: live(fwd(p, xx)), argnums=(0, 1))(p, xx)
            return val, grads

        it = 10 if n >= 7168 else 40
        d_f = time_device(fwd, params, x, iters=it)
        d_fb = time_device(fwd_bwd, params, x, iters=it)
        row(name + f" block (N={n}, C={C}, H={H})",
            d_f * 1e3, d_fb * 1e3, depth)
        block_bwd_total += depth * (d_fb - d_f) * 1e3

    # ---- sub-block attribution (attention / CPE / MLP) ----
    from tpu3dssf.models.ptv3 import SerializedAttention, SerializedCPE

    sub_stages = [("enc0", caps[0], 32, 2), ("dec0", caps[0], 64, 4),
                  ("enc2", caps[2], 128, 8), ("enc3", caps[3], 256, 16),
                  ("enc4", caps[4], 512, 32)]
    for name, n, C, H in sub_stages:
        x = jnp.asarray(rng.normal(size=(B, n, C)) * 0.1, dtype)
        mask = jnp.ones((B, n), bool)
        perm, inv = perms_for(n)
        it = 20 if n >= 13312 else 40

        for label, mod, args in [
            ("attn(perm)", SerializedAttention(
                C, H, min(1024, n), use_pallas=cfg.use_pallas,
                dtype=dtype), (perm, inv, mask)),
            ("attn(none)", SerializedAttention(
                C, H, min(1024, n), use_pallas=cfg.use_pallas,
                dtype=dtype), (None, None, mask)),
            ("cpe", SerializedCPE(C, dtype=dtype), (None, None, mask)),
        ]:
            p = jax.jit(mod.init)(key, x, *args)

            def fwd(pp, xx, mod=mod, args=args):
                return mod.apply(pp, xx, *args)

            def fb(pp, xx, fwd=fwd):
                return jax.value_and_grad(
                    lambda pp, xx: live(fwd(pp, xx)),
                    argnums=(0, 1))(pp, xx)

            d_f = time_device(fwd, p, x, iters=it)
            d_fb = time_device(fb, p, x, iters=it)
            row(f"{name} {label} (N={n}, C={C}, H={H})",
                d_f * 1e3, d_fb * 1e3)

        # MLP alone (norm2 + mlp_in/gelu/mlp_out residual)
        mlp = nn.Sequential([nn.LayerNorm(dtype=dtype),
                             nn.Dense(4 * C, dtype=dtype), nn.gelu,
                             nn.Dense(C, dtype=dtype)])
        p = jax.jit(mlp.init)(key, x)

        def mfwd(pp, xx, mlp=mlp):
            return mlp.apply(pp, xx)

        def mfb(pp, xx):
            return jax.value_and_grad(
                lambda pp, xx: live(mfwd(pp, xx)), argnums=(0, 1))(pp, xx)

        d_f = time_device(mfwd, p, x, iters=it)
        d_fb = time_device(mfb, p, x, iters=it)
        row(f"{name} mlp (N={n}, C={C})", d_f * 1e3, d_fb * 1e3)

    # ---- permutation gather vjp: scatter-add vs inverse gather ----
    for n, C in [(25600, 96), (25600, 32), (13312, 192), (4096, 768)]:
        x = jnp.asarray(rng.normal(size=(B, n, C)), dtype)
        perm, inv = perms_for(n)

        def g_scatter(xx, perm=perm):
            return jnp.take_along_axis(xx, perm[..., None], axis=1)

        def g_perm(xx, perm=perm, inv=inv):
            return permutation_gather(xx, perm, inv)

        def bwd_of(f):
            def h(xx):
                val, vjp = jax.vjp(f, xx)
                return vjp(val)
            return h

        it = 40 if n <= 13312 else 20
        d_s = time_device(bwd_of(g_scatter), x, iters=it)
        d_p = time_device(bwd_of(g_perm), x, iters=it)
        d_f = time_device(g_scatter, x, iters=it)
        print(f"gather vjp (N={n}, C={C}): fwd+scatter-bwd "
              f"{d_s*1e3:7.3f} ms | fwd+inv-gather-bwd {d_p*1e3:7.3f} ms "
              f"| fwd alone {d_f*1e3:7.3f} ms")

    # ---- pooling + unpooling vjp (stage-1 shapes) ----
    n, outc = caps[0], caps[1]
    Cin, Cout = cfg.enc_channels[0], cfg.enc_channels[1]
    x = jnp.asarray(rng.normal(size=(B, n, Cin)) * 0.1, dtype)
    # unique sorted cells: strictly increasing grid rows
    g = np.sort(rng.choice(2 ** 20, size=(B, n), replace=False) if False
                else rng.permutation(2 ** 21)[:B * n].reshape(B, n), axis=1)
    grid = jnp.stack([jnp.asarray(g % 1024, jnp.int32),
                      jnp.asarray((g // 1024) % 1024, jnp.int32),
                      jnp.asarray(g // (1024 * 1024), jnp.int32)], -1)
    mask = jnp.ones((B, n), bool)
    pool = SerializedPooling(Cout, outc, presorted=True, unique_cells=True,
                             dtype=dtype)
    pp = jax.jit(pool.init)(key, x, grid, mask)

    def pool_fwd(p, xx):
        return pool.apply(p, xx, grid, mask)

    def pool_fb(p, xx):
        return jax.value_and_grad(
            lambda p, xx: live(pool_fwd(p, xx)), argnums=(0, 1))(p, xx)

    d_f = time_device(pool_fwd, pp, x, iters=20)
    d_fb = time_device(pool_fb, pp, x, iters=20)
    row("pool1 (25600->13312)", d_f * 1e3, d_fb * 1e3)

    # unpool: coarse (B, outc, Cout) -> fine (B, n, Cin-skip)
    xc = jnp.asarray(rng.normal(size=(B, outc, Cout)) * 0.1, dtype)
    skip = jnp.asarray(rng.normal(size=(B, n, Cin)) * 0.1, dtype)
    parent = jnp.sort(jnp.asarray(
        rng.integers(0, outc, (B, n)), jnp.int32), axis=1)
    pok = jnp.ones((B, n), bool)
    unpool = SerializedUnpooling(cfg.dec_channels[0], dtype=dtype)
    up = jax.jit(unpool.init)(key, xc, skip, parent, pok, mask)

    def un_fwd(p, xx, sk):
        return unpool.apply(p, xx, sk, parent, pok, mask)

    def un_fb(p, xx, sk):
        return jax.value_and_grad(
            lambda p, xx, sk: live(un_fwd(p, xx, sk)),
            argnums=(0, 1, 2))(p, xx, sk)

    d_f = time_device(un_fwd, up, xc, skip, iters=20)
    d_fb = time_device(un_fb, up, xc, skip, iters=20)
    row("unpool0 (13312->25600)", d_f * 1e3, d_fb * 1e3)

    # ---- devoxelize own-voxel gather vjp ----
    P, V, K = 34816, 25600, 16
    pv = jnp.asarray(rng.integers(0, V, (B, P)), jnp.int32)
    ok = jnp.ones((B, P), bool)
    vv = jnp.asarray(rng.normal(size=(B, V, K)), dtype)

    def devox(v):
        vals = jax.vmap(lambda p, o, vv: jnp.where(
            o[:, None], vv[p], 0.0))(pv, ok, v)
        return vals

    def devox_fb(v):
        val, vjp = jax.vjp(devox, v)
        return vjp(val)

    d_f = time_device(devox, vv, iters=20)
    d_fb = time_device(devox_fb, vv, iters=20)
    row("devox gather (34.8k pts -> 25.6k vox, 16)", d_f * 1e3, d_fb * 1e3)

    # ---- loss vjp ----
    loss_fn = CELSLoss(weight=np.ones(16, np.float32))
    logits = jnp.asarray(rng.normal(size=(B, P, 16)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 17, (B, P)), jnp.int32)
    lmask = jnp.ones((B, P), bool)

    def loss_f(lg):
        return loss_fn(lg, labels, lmask).total

    def loss_fb(lg):
        return jax.value_and_grad(loss_f)(lg)

    d_f = time_device(loss_f, logits, iters=20)
    d_fb = time_device(loss_fb, logits, iters=20)
    row("CE+Lovasz loss (69.6k pts)", d_f * 1e3, d_fb * 1e3)

    print(f"\nsum of per-stage block bwd (depth-weighted): "
          f"{block_bwd_total:.1f} ms")


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
