"""Stage-by-stage timing of the e2e pipeline on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, f, *args, n=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:28s} {dt*1e3:8.2f} ms")
    return out, dt


def main():
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline,
                                        FeatureFusionModel)
    from tpu3dssf.models.ptv3 import PointTransformerV3, PTv3Config
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                     preprocess_images)
    from tpu3dssf.voxel import voxelize

    dtype = jnp.bfloat16
    POINT_CAP, VOXEL_CAP, WINDOW = 34816, 25600, 1024
    rng = np.random.default_rng(0)

    pts = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, POINT_CAP, 3)) * 20,
         rng.random((1, POINT_CAP, 1))], -1), jnp.float32)
    valid = jnp.ones((1, POINT_CAP), bool)
    imgs = jnp.asarray(rng.integers(0, 255, (1, 6, 900, 1600, 3),
                                    dtype=np.uint8))

    # ---- stage: image preprocess ----
    pre = jax.jit(lambda im: preprocess_images(im, (640, 1138), dtype))
    timeit("image preprocess (6 cams)", pre, imgs)

    # ---- stage: ViT encode ----
    vcfg = dinov3_small()
    vcfg = type(vcfg)(**{**vcfg.__dict__, "dtype": dtype})
    vit = VisionTransformer(vcfg)
    x0 = jnp.zeros((6, 640, 1138, 3), dtype)
    vparams = jax.jit(vit.init)(jax.random.PRNGKey(0), x0)

    @jax.jit
    def vit_fwd(im):
        x = pre(im).reshape((6, 640, 1138, 3))
        return vit.apply(vparams, x)["patch_features"]

    tokens, _ = timeit("ViT-S x6 (incl. preprocess)", vit_fwd, imgs)
    tokens = tokens.reshape(1, 6, 2840, 384)

    # ---- stage: voxelize ----
    vox_fn = jax.jit(lambda p, m: jax.vmap(
        lambda pp, mm: voxelize(pp, mm, 0.1, VOXEL_CAP))(p, m))
    vox, _ = timeit("voxelize (sort+segment)", vox_fn, pts, valid)

    # ---- stage: PTv3 ----
    pcfg = PTv3Config(enc_window=(WINDOW,) * 5, dec_window=(WINDOW,) * 4,
                      use_pallas=True, dtype=dtype)
    ptv3 = PointTransformerV3(pcfg)
    pparams = jax.jit(ptv3.init)(
        jax.random.PRNGKey(0), vox.voxel_raw, vox.voxel_coords,
        vox.voxel_mask)
    ptv3_fn = jax.jit(lambda p, f, g, m: ptv3.apply(p, f, g, m))
    (vfeat, vmask), _ = timeit("PTv3 (25.6k voxels)", ptv3_fn, pparams,
                               vox.voxel_raw, vox.voxel_coords,
                               vox.voxel_mask)

    # ---- stage: fusion head + devoxelize ----
    fcfg = FusionConfig(dtype=dtype)
    fuse = FeatureFusionModel(fcfg)
    K = np.zeros((1, 6, 3, 3), np.float32)
    K[:, :, 0, 0] = K[:, :, 1, 1] = 1266.0
    K[:, :, 0, 2], K[:, :, 1, 2], K[:, :, 2, 2] = 800, 450, 1
    Rt = np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1))
    K, Rt = jnp.asarray(K), jnp.asarray(Rt)
    fparams = jax.jit(fuse.init)(jax.random.PRNGKey(0), tokens, vfeat,
                                 vox.voxel_raw, vmask, K, Rt)
    fuse_fn = jax.jit(lambda *a: fuse.apply(*a))
    timeit("fusion head (proj+gather+MLP)", fuse_fn, fparams, tokens,
           vfeat, vox.voxel_raw, vmask, K, Rt)

    # ---- PTv3 sub-breakdown: serialization sorts alone ----
    from tpu3dssf.models.ptv3 import _serialize_perms
    ser_fn = jax.jit(lambda g, m: _serialize_perms(
        g, m, ("z", "z-trans", "hilbert", "hilbert-trans")))
    timeit("serialize 25.6k x4 orders", ser_fn, vox.voxel_coords,
           vox.voxel_mask)

    from tpu3dssf.kernels import window_attention
    q = jnp.asarray(rng.normal(size=(25, 1024, 2, 16)), dtype)
    mask = jnp.ones((25, 1024), bool)
    wa = jax.jit(lambda a, b, c, m: window_attention(a, b, c, m, True))
    timeit("window_attn L0 (25w,2h,16d)", wa, q, q, q, mask)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
