"""ViT-S encode: nn.scan over layers vs unrolled blocks, on-chip.

scan_layers=True exists for COMPILE time (~12x less HLO); this measures
what it costs at RUNTIME (scan carry relayouts). If unrolled is
meaningfully faster, serving deployments with a warm compile cache
should prefer it.

    python scripts/exp_scan_vs_unroll.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                     fold_layerscale)
    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(6, 640, 1138, 3)), dtype)

    for scan in (True, False):
        cfg = dinov3_small()
        cfg = type(cfg)(**{**cfg.__dict__, "dtype": dtype,
                           "use_flash": True, "scan_layers": scan})
        vit = VisionTransformer(cfg)
        if scan:
            params = jax.jit(vit.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 640, 1138, 3), dtype))
            jax.block_until_ready(params)
            params_scan = params
        else:
            # reuse the scan init by unstacking so both variants run the
            # SAME weights (and init compiles once)
            blk = params_scan["params"]["blocks"]
            p = {k: v for k, v in params_scan["params"].items()
                 if k != "blocks"}
            for i in range(cfg.num_layers):
                p[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], blk)
            params = {"params": p}
        params_f, cfg_f = fold_layerscale(params, cfg)
        vit_f = VisionTransformer(cfg_f)
        f = jax.jit(lambda im: vit_f.apply(params_f, im)["patch_features"])
        t0 = time.perf_counter()
        dt = time_device(f, imgs, iters=10)
        print(f"scan_layers={scan}: {dt*1e3:.2f} ms / 6 imgs "
              f"[compile {time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
