"""Device-timed component breakdown on the real TPU (PERF.md source).

Times each pipeline stage with tpu3dssf.utils.timing.time_device (the
only trustworthy timer on this transport) at the bench.py workload
shapes: 6x ViT-S 640x1138, PTv3 over 25.6k voxels, fusion + devoxelize.

    python scripts/time_components.py            # full breakdown
    python scripts/time_components.py vit ptv3   # subset
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

POINT_CAP, VOXEL_CAP, WINDOW = 34816, 25600, 1024
IMAGE_HW = (640, 1138)


def main():
    which = set(sys.argv[1:]) or {"vit", "ptv3", "voxel", "fusion"}
    import jax
    import jax.numpy as jnp
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from tpu3dssf.utils.timing import time_device

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}

    def record(name, fn, *args, iters=20):
        t0 = time.perf_counter()
        dt = time_device(fn, *args, iters=iters)
        print(f"{name:36s} {dt*1e3:8.2f} ms   "
              f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
        results[name] = dt * 1e3

    if "vit" in which:
        from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                         preprocess_images, fold_layerscale)
        vcfg = dinov3_small()
        vcfg = type(vcfg)(**{**vcfg.__dict__, "dtype": dtype,
                             "use_flash": True, "scan_layers": True})
        vit = VisionTransformer(vcfg)
        x0 = jnp.zeros((6,) + IMAGE_HW + (3,), dtype)
        vp = jax.jit(vit.init)(jax.random.PRNGKey(0), x0)
        vp, vcfg = fold_layerscale(vp, vcfg)
        vit = VisionTransformer(vcfg)
        imgs = jnp.asarray(rng.integers(0, 255, (1, 6, 900, 1600, 3),
                                        dtype=np.uint8))

        record("image preprocess (6 cams)",
               jax.jit(lambda im: preprocess_images(im, IMAGE_HW, dtype)),
               imgs)
        vfwd = jax.jit(lambda x: vit.apply(vp, x)["patch_features"])
        xin = preprocess_images(imgs, IMAGE_HW, dtype).reshape(
            (6,) + IMAGE_HW + (3,))
        record("ViT-S x6 (tokens only)", vfwd, xin)

        from tpu3dssf.models.vit import quantize_vit
        qp, qcfg = quantize_vit(vp, vcfg)
        qvit = VisionTransformer(qcfg)
        record("ViT-S x6 int8 (W8A8)",
               jax.jit(lambda x: qvit.apply(qp, x)["patch_features"]),
               xin)

    pts = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, POINT_CAP, 3)) * 20,
         rng.random((1, POINT_CAP, 1))], -1), jnp.float32)
    valid = jnp.ones((1, POINT_CAP), bool)

    from tpu3dssf.voxel import voxelize
    vox_fn = jax.jit(lambda p, m: jax.vmap(
        lambda pp, mm: voxelize(pp, mm, 0.1, VOXEL_CAP))(p, m))
    vox = vox_fn(pts, valid)
    if "voxel" in which:
        record("voxelize (sort+segment)", vox_fn, pts, valid)
        knn_fn = jax.jit(lambda p, m: jax.vmap(
            lambda pp, mm: voxelize(pp, mm, 0.1, VOXEL_CAP,
                                    intensity_mode="knn5"))(p, m))
        record("voxelize knn5 (parity mode)", knn_fn, pts, valid,
               iters=5)

    if "ptv3" in which:
        from tpu3dssf.models.ptv3 import PointTransformerV3, PTv3Config
        pcfg = PTv3Config(enc_window=(WINDOW,) * 5,
                          dec_window=(WINDOW,) * 4,
                          use_pallas=True, dtype=dtype)
        ptv3 = PointTransformerV3(pcfg)
        pp = jax.jit(ptv3.init)(jax.random.PRNGKey(0), vox.voxel_raw,
                                vox.voxel_coords, vox.voxel_mask)
        record("PTv3 (25.6k voxels)",
               jax.jit(lambda f, g, m: ptv3.apply(pp, f, g, m)),
               vox.voxel_raw, vox.voxel_coords, vox.voxel_mask)

    if "fusion" in which:
        from tpu3dssf.models.fusion import (FusionConfig,
                                            FeatureFusionModel)
        fcfg = FusionConfig(dtype=dtype)
        fm = FeatureFusionModel(fcfg)
        tokens = jnp.asarray(rng.normal(size=(1, 6, 2840, 384)) * 0.02,
                             dtype)
        vfeat = jnp.asarray(rng.normal(size=(1, VOXEL_CAP, 64)) * 0.1,
                            dtype)
        K = np.zeros((1, 6, 3, 3), np.float32)
        K[:, :, 0, 0] = K[:, :, 1, 1] = 1266.0
        K[:, :, 0, 2], K[:, :, 1, 2], K[:, :, 2, 2] = 800.0, 450.0, 1.0
        Rt = np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1))
        fp = jax.jit(fm.init)(jax.random.PRNGKey(0), tokens, vfeat,
                              vox.voxel_raw, vox.voxel_mask,
                              jnp.asarray(K), jnp.asarray(Rt))
        record("fusion head (proj+gather+MLP)",
               jax.jit(lambda t, v: fm.apply(fp, t, v, vox.voxel_raw,
                                             vox.voxel_mask,
                                             jnp.asarray(K),
                                             jnp.asarray(Rt))),
               tokens, vfeat)

        from tpu3dssf.voxel.voxelize import devoxelize_nearest
        scores = jnp.asarray(rng.normal(size=(1, VOXEL_CAP, 16)),
                             jnp.float32)
        record("devoxelize nearest (34.8k pts)",
               jax.jit(lambda p, s: jax.vmap(devoxelize_nearest)(
                   p[..., :3], valid, vox.voxel_raw[..., :3],
                   vox.voxel_mask, s)),
               pts, scores)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
