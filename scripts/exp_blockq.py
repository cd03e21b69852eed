"""block_q sweep for flash_attention_packed at the shipping geometries.

time_vitl_parts (round 4) showed the N=3072/C=1024 attention runs
fastest at block_q=256 (71.1 TFLOP/s) vs the pick_block_q default 384
(62.9) — the q-block policy ("largest ≤384 dividing N") was tuned at
ViT-S width. This sweeps the legal q-blocks at N=2944 (the real padded
DINOv3 length) for ViT-L (C=1024, head_group=8) and ViT-S (C=384,
single body) so pick_block_q can be re-fit with data at both widths.

Run bare on the TPU: python scripts/exp_blockq.py
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

    from tpu3dssf.kernels.flash_attention import flash_attention_packed
    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    B, n_tok = 6, 2845

    # legal q-blocks: multiples of 8 dividing N, within Mosaic limits
    def legal(N):
        return [b for b in range(384, 127, -8) if N % b == 0]

    cases = [
        ("ViT-L", 2944, 1024, 16, 8),
        ("ViT-L", 3072, 1024, 16, 8),
        ("ViT-S", 2944, 384, 6, None),
        ("ViT-S", 3072, 384, 6, None),
    ]
    for name, N, C, H, hg in cases:
        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)) * 0.1, dtype)
        bias = jnp.zeros((B, 1, N), jnp.float32).at[:, :, n_tok:].set(
            -1e9)
        flops = 4 * B * H * N * N * (C // H)
        for bq in legal(N):
            dt = time_device(
                jax.jit(lambda x, b, _bq=bq: flash_attention_packed(
                    x, b, H, _bq, None, None, None, hg)),
                qkv, bias, iters=40)
            print(f"{name} N={N} C={C} hg={hg} block_q={bq:3d}: "
                  f"{dt*1e3:7.3f} ms  {flops/dt/1e12:5.1f} TFLOP/s",
                  flush=True)


if __name__ == "__main__":
    main()
