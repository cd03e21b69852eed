"""ViT-L/16 on-chip measurement attempt (VERDICT r2 missing #3).

Round 2's three attempts died in the remote AOT compile service on
ViT-L-sized programs (broken pipe at 20-30 min). Levers applied since:
many-head flash now routes to the head-on-grid (B,H,N,D) kernel (16x
smaller Mosaic body than the unrolled packed kernel), scan-over-layers
keeps the HLO small, and stages can be compiled separately:

  BENCH_VITL_MODE=encode   one jitted 6-image encode (default)
  BENCH_VITL_MODE=block    a single ViT-L block, x24 estimate
  BENCH_VITL_MODE=einsum   XLA einsum attention instead of Pallas
  BENCH_VITL_MODE=loop     per-layer dispatch (make_looped_encode):
                           three small programs instead of one 24-layer
                           jit — compiles on this tunnel, measures the
                           FULL frame (not a x24 extrapolation)

Run bare (grabs the TPU): python scripts/bench_vitl.py
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
    from tpu3dssf.models.vit import (VisionTransformer, ViTBlock,
                                     dinov3_large, fold_layerscale)
    from tpu3dssf.utils.timing import time_device

    mode = os.environ.get("BENCH_VITL_MODE", "encode")
    dtype = jnp.bfloat16
    cfg = dinov3_large()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": dtype,
                       "use_flash": mode != "einsum",
                       "scan_layers": True})
    rng = np.random.default_rng(0)

    if mode == "block":
        # one block at padded geometry: isolates the Mosaic/XLA cost of
        # the layer body from the 24-deep scan program
        N, C, H = 2944, cfg.hidden_size, cfg.num_heads
        n_pre = cfg.num_prefix_tokens  # 5: CLS + 4 registers
        blk = ViTBlock(cfg)
        x = jnp.asarray(rng.normal(size=(6, N, C)) * 0.1, dtype)
        # real sequence is n_pre + 40*71 = 2845; mask the padded keys
        bias = jnp.zeros((6, 1, N), jnp.float32).at[:, :, 2845:].set(-1e9)
        from tpu3dssf.models.vit import _rope_angles
        # angles cover the PATCH tokens only (prefix passes through):
        # N - n_pre rows, identity rotation (0) for padded slots
        ang = _rope_angles(40, 71, C // H, cfg.rope_theta)
        ang = jnp.pad(ang, ((0, N - n_pre - ang.shape[0]), (0, 0)))
        p = jax.jit(blk.init)(jax.random.PRNGKey(0), x, ang, bias)
        t0 = time.perf_counter()
        dt = time_device(
            jax.jit(lambda xx: blk.apply(p, xx, ang, bias)), x, iters=20)
        print(f"ViT-L one block (6 imgs): {dt*1e3:.2f} ms "
              f"-> x24 = {dt*24*1e3:.1f} ms/frame "
              f"[compile {time.perf_counter()-t0:.0f}s]", flush=True)
        return

    vit = VisionTransformer(cfg)
    t0 = time.perf_counter()
    params = jax.jit(vit.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 1138, 3), dtype))
    jax.block_until_ready(params)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    params, cfg = fold_layerscale(params, cfg)
    vit = VisionTransformer(cfg)

    imgs = jnp.asarray(rng.normal(size=(6, 640, 1138, 3)), dtype)
    if mode == "loop":
        from tpu3dssf.models.vit import make_looped_encode
        # time_device would trace the whole encode into ONE fori_loop
        # program — the very compile that dies. Measure host-side with
        # the same slope construction instead: chain each frame's input
        # on the previous frame's reduced output (no reordering or
        # elision possible), fetch one scalar as the completion fence,
        # and take (wall(4n)-wall(n))/3n so fixed RTT cancels.
        from tpu3dssf.utils.timing import chained_slope
        enc = make_looped_encode(cfg, params, donate=False)

        @jax.jit
        def perturb(im, acc):
            return im + (acc * 0).astype(im.dtype)

        @jax.jit
        def reduce_(out, acc):
            return acc + jnp.sum(out.astype(jnp.float32))

        def step(acc):
            return reduce_(enc(perturb(imgs, acc)), acc)

        t0 = time.perf_counter()
        float(step(jnp.float32(0.0)))  # compile embed + block + final
        compile_s = time.perf_counter() - t0
        dt = chained_slope(step, warmup=False)
        print(f"ViT-L encode 6 imgs (loop, 24 real layers): "
              f"{dt*1e3:.1f} ms/frame ({6*2840/dt:,.0f} tok/s) "
              f"[compile {compile_s:.0f}s]", flush=True)
        return
    f = jax.jit(lambda im: vit.apply(params, im)["patch_features"])
    t0 = time.perf_counter()
    dt = time_device(f, imgs, iters=8)
    print(f"ViT-L encode 6 imgs ({mode}): {dt*1e3:.1f} ms/frame "
          f"({6*2840/dt:,.0f} tok/s) [compile {time.perf_counter()-t0:.0f}s]",
          flush=True)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
