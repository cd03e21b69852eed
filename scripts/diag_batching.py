"""Diagnose the B=4 batching regression (VERDICT r2 #4).

Round 2 measured 41.5 ms/frame at B=1 but 53.7 ms/frame at B=4 (−23%
throughput) and attributed it to "working-set spill" without evidence.
This script slope-times each pipeline stage at B=1 and B=4 so the
regression is attributed to a specific stage, per-frame:

    python scripts/diag_batching.py
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
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PointTransformerV3, PTv3Config
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                     preprocess_images, fold_layerscale)
    from tpu3dssf.voxel.voxelize import voxelize
    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    P, V, W = 34816, 25600, 1024
    rng = np.random.default_rng(0)

    vcfg = dinov3_small()
    vcfg = type(vcfg)(**{**vcfg.__dict__, "dtype": dtype,
                         "use_flash": True, "scan_layers": True})
    vit = VisionTransformer(vcfg)
    vp = jax.jit(vit.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 640, 1138, 3), dtype))
    vp, vcfg = fold_layerscale(vp, vcfg)
    vit = VisionTransformer(vcfg)

    pcfg = PTv3Config(enc_window=(W,) * 5, dec_window=(W,) * 4,
                      use_pallas=True, dtype=dtype)
    ptv3 = PointTransformerV3(pcfg)

    for B in (1, 2, 4):
        print(f"==== B={B} ====", flush=True)
        pts = jnp.asarray(np.concatenate(
            [rng.normal(size=(B, P, 3)) * 20, rng.random((B, P, 1))],
            -1), jnp.float32)
        valid = jnp.ones((B, P), bool)
        imgs = jnp.asarray(rng.integers(0, 255, (B, 6, 900, 1600, 3),
                                        dtype=np.uint8))

        # ViT encode (6B images), incl. preprocess
        @jax.jit
        def encode(im):
            x = preprocess_images(im, (640, 1138), dtype=dtype)
            x = x.reshape((B * 6,) + x.shape[2:])
            return vit.apply(vp, x)["patch_features"]

        dt = time_device(encode, imgs, iters=8)
        print(f"  ViT 6x{B} imgs: {dt*1e3:7.2f} ms "
              f"({dt*1e3/B:6.2f} /frame)", flush=True)

        # voxelize
        vox = jax.jit(jax.vmap(
            lambda p, m: voxelize(p, m, 0.1, V, "mean")))
        dt = time_device(lambda p: vox(p, valid).voxel_raw, pts, iters=20)
        print(f"  voxelize:     {dt*1e3:7.2f} ms ({dt*1e3/B:6.2f} /frame)",
              flush=True)
        res = vox(pts, valid)

        # PTv3
        feats = res.voxel_raw.astype(dtype)
        pp = jax.jit(ptv3.init)(jax.random.PRNGKey(0), feats,
                                res.voxel_coords, res.voxel_mask)
        dt = time_device(
            jax.jit(lambda f, g, m: ptv3.apply(pp, f, g, m)[0]),
            feats, res.voxel_coords, res.voxel_mask, iters=8)
        print(f"  PTv3 {V}x{B}: {dt*1e3:7.2f} ms ({dt*1e3/B:6.2f} /frame)",
              flush=True)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
