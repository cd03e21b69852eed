"""Round-3 measurement sweep (VERDICT r2 items 7+8).

1. Window-attention backward, Pallas vs XLA vjp, honest slope timer
   (the round-2 table row was measured with the pre-fix timer).
2. Devoxelize parity-kernel (Pallas 1-NN, 34.8k x 25.6k) repeated N
   times under fixed conditions to bound the 7.4-15.9 ms run-to-run
   spread seen across round-2 sweeps.

Run bare (grabs the TPU): python scripts/measure_bwd_and_spread.py
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
    from tpu3dssf.kernels.window_attention import window_attention
    from tpu3dssf.utils.timing import time_device
    from tpu3dssf.voxel.voxelize import devoxelize_nearest

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    # ---- 1. window-attn backward at stage-0 and stage-3 shapes ----
    for (W, K, H, D) in [(25, 1024, 2, 16), (4, 1024, 16, 16)]:
        q = jnp.asarray(rng.normal(size=(W, K, H, D)), dtype)
        km = jnp.ones((W, K), bool)

        for use_pallas in (True, False):
            def vjp_fn(q, k, v, up=use_pallas):
                def f(q, k, v):
                    return jnp.sum(
                        window_attention(q, k, v, km, up)
                        .astype(jnp.float32))
                g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

            dt = time_device(jax.jit(vjp_fn), q, q, q, iters=100)
            print(f"window-attn bwd W={W} K={K} H={H} D={D} "
                  f"pallas={use_pallas}: {dt*1e3:.3f} ms", flush=True)

    # ---- 2. devoxelize parity-kernel spread ----
    P, V = 34816, 25600
    pts = jnp.asarray(rng.normal(size=(P, 3)) * 20, jnp.float32)
    pm = jnp.ones((P,), bool)
    cen = jnp.asarray(rng.normal(size=(V, 3)) * 20, jnp.float32)
    vm = jnp.ones((V,), bool)
    vals = jnp.asarray(rng.normal(size=(V, 16)), jnp.float32)

    f = jax.jit(lambda p, c, v: devoxelize_nearest(p, pm, c, vm, v)[0])
    times = []
    for rep in range(12):
        dt = time_device(f, pts, cen, vals, iters=20)
        times.append(dt * 1e3)
        print(f"devox parity rep {rep}: {dt*1e3:.2f} ms", flush=True)
    t = np.asarray(times)
    print(f"devox parity: mean {t.mean():.2f} ms  std {t.std():.2f}  "
          f"min {t.min():.2f}  max {t.max():.2f}  "
          f"(fixed process, fixed inputs, iters=20, 12 reps)")


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
