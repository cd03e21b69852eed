"""Real-TPU parity + microbenchmark for the Pallas kernels.

Run on the TPU chip (no JAX_PLATFORMS override):
    python scripts/check_tpu_kernels.py

CPU tests exercise the jnp reference paths; this script is the check that
the Pallas kernels themselves compile and match on hardware.
"""

import os
import sys
import time

# NOTE: do not use PYTHONPATH=/root/repo — it shadows a module the axon
# TPU plugin needs at interpreter startup and kills backend discovery.
# Runtime sys.path insertion is safe.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.kernels import window_attention, window_attention_reference


def check_window_attention():
    rng = np.random.default_rng(0)
    for (W, K, H, D, dtype, atol) in [
        (8, 64, 2, 16, jnp.float32, 2e-2),
        (32, 1024, 4, 16, jnp.float32, 2e-2),
        (32, 1024, 8, 32, jnp.bfloat16, 1e-1),
    ]:
        q = jnp.asarray(rng.normal(size=(W, K, H, D)), dtype)
        k = jnp.asarray(rng.normal(size=(W, K, H, D)), dtype)
        v = jnp.asarray(rng.normal(size=(W, K, H, D)), dtype)
        mask = jnp.asarray(rng.random((W, K)) > 0.1)
        got = jax.jit(lambda *a: window_attention(*a, True))(q, k, v, mask)
        want = window_attention_reference(q, k, v, mask)
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(want, np.float32)).max()
        status = "OK " if err < atol else "FAIL"
        print(f"[{status}] window_attention W={W} K={K} H={H} D={D} "
              f"{jnp.dtype(dtype).name}: max|err|={err:.2e}")
        assert err < atol, "pallas kernel mismatch"

    # micro-benchmark at PTv3 stage-0 scale
    W, K, H, D = 32, 1024, 4, 16
    q = jnp.asarray(rng.normal(size=(W, K, H, D)), jnp.bfloat16)
    k, v = q + 0.1, q - 0.1
    mask = jnp.ones((W, K), bool)
    f_pallas = jax.jit(lambda *a: window_attention(*a, True))
    f_ref = jax.jit(lambda *a: window_attention_reference(*a))
    for name, f in [("pallas", f_pallas), ("xla", f_ref)]:
        f(q, k, v, mask).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(q, k, v, mask)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 50
        flops = 2 * 2 * W * K * K * H * D
        print(f"  {name}: {dt*1e6:.0f} us/call  "
              f"({flops/dt/1e12:.2f} TFLOP/s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_window_attention()
    print("all TPU kernel checks passed")
