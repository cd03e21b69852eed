"""Is int8 worth pursuing for ATTENTION on this chip? Micro-experiment.

The ViT flash attention runs at the D=64 bf16 contraction ceiling
(PERF.md kernel facts: 75.5 of <=76.5 TFLOP/s), so the only way int8
attention (quantized QK^T / PV) could beat bf16 is if the MXU's int8
rate survives a 64-deep contraction. On TPUs the int8 speedup
typically comes from packing two 8-bit operands per MAC along the
CONTRACTION dimension — which a D=64 contraction cannot exploit.

This measures dense int8 vs bf16 matmuls at deep (2048) and shallow
(64) contraction depths and prints achieved TOP/s for each. If
int8@K=64 is not materially above bf16@K=64, int8 flash attention is
dead on arrival for QK^T (D=64) and only PV (contraction over keys)
could win — not worth a kernel.

Run bare (grabs the TPU): python scripts/exp_int8_mxu.py
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

    rng = np.random.default_rng(0)

    # shallow-K case uses a larger M/N so the kernel is big enough for
    # a stable slope on this jittery transport (K=64 at 4096^2 is only
    # ~2 GFLOP ≈ tens of us — run-to-run ratios swung 1.16-1.65x)
    for M, K, iters in ((4096, 2048, 100), (16384, 64, 200)):
        N = M
        flops = 2 * M * N * K
        a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        ab = a8.astype(jnp.bfloat16)
        bb = b8.astype(jnp.bfloat16)

        f_i8 = jax.jit(lambda x, y: jax.lax.dot(
            x, y, preferred_element_type=jnp.int32))
        f_bf = jax.jit(lambda x, y: jax.lax.dot(
            x, y, preferred_element_type=jnp.float32))

        t_i8 = time_device(f_i8, a8, b8, iters=iters)
        t_bf = time_device(f_bf, ab, bb, iters=iters)
        print(f"K={K:5d}: int8 {flops/t_i8/1e12:6.1f} TOP/s   "
              f"bf16 {flops/t_bf/1e12:6.1f} TFLOP/s   "
              f"ratio {t_bf/t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
