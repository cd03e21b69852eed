"""End-to-end fused-inference benchmark on one TPU chip.

Measures the reference's headline workload (BASELINE.json config 3): full
DINOv3 ViT-S/16 + PTv3 fusion inference — 6 camera images + one ~34k-point
LiDAR sweep → per-point class logits — and reports fused points/sec/chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no throughput (BASELINE.md:14), so
the denominator is a documented estimate of the reference pipeline on its
own hardware (A40, fp16): per frame ≈ 6 ViT-S forwards (~1.2 TFLOP, ~10 ms
+ ~120 ms host-side HF preprocessing, camera.py:53-56) + CPU
voxelization round-trip (Open3D + sklearn 5-NN on 34k pts, ~150 ms,
lidar.py:83-118) + PTv3 (~30 ms) + dense 34k x 25k cdist devoxelize
(~3.4 GB traffic, ~30 ms, lidar.py:147-150) ≈ 340 ms → ~100k points/s.
We use baseline = 100_000 points/s (generous to the reference).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 100_000.0


def _wait_for_backend(max_wait_s=None):
    """Pre-flight: wait (bounded) for the TPU service before backend init.

    The tunneled TPU service has multi-hour outages; a python process
    that initializes the jax backend during one hangs at startup with no
    timeout (CLAUDE.md trap 10). The driver runs this benchmark
    unattended, so probe the backend in SUBPROCESSES (killable, unlike
    an in-process init) and only let the main process touch jax once a
    probe succeeds. After ``max_wait_s`` (BENCH_PREFLIGHT_BUDGET_S,
    default 3600 — outages observed longer than the old 1500) give up
    and proceed anyway — identical to the old behavior. Opt out:
    BENCH_NO_PREFLIGHT=1.
    """
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_PREFLIGHT_BUDGET_S",
                                          "3600"))
    if os.environ.get("BENCH_NO_PREFLIGHT") == "1":
        return
    if os.environ.get("PALLAS_AXON_POOL_IPS", None) == "":
        return  # forced-CPU run: no TPU service involved
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            probe_timeout = min(120.0, max(10.0,
                                           deadline - time.monotonic()))
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout)
            if out.returncode == 0:
                print(f"[bench] backend pre-flight ok: "
                      f"{out.stdout.strip()}", file=sys.stderr)
                return
            reason = (out.stderr or out.stdout).strip()[-200:]
        except subprocess.TimeoutExpired:
            reason = "probe hung 120s (TPU service down or grant wedged)"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print("[bench] pre-flight budget exhausted; proceeding "
                  "anyway", file=sys.stderr)
            return
        print(f"[bench] pre-flight attempt {attempt} failed ({reason}); "
              f"retrying, {remaining:.0f}s left", file=sys.stderr)
        # a killed hung probe can wedge the device grant for ~1-3 min
        # (self-heals) — give it room before the next attempt, but never
        # sleep past the advertised budget
        time.sleep(min(90.0, remaining))

POINT_CAP = 34816      # ~one nuScenes sweep, multiple of 1024
VOXEL_CAP = 25600      # ~34k pts at 0.1 m voxels, multiple of window
WINDOW = 1024
# batch=1 measured fastest per point on one chip (the graph is already
# compute-dense: 6 ViT images + 25k voxels per frame); override to
# profile batched streaming
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
IMAGE_HW = (640, 1138)  # dinov3 encoder input (camera.py:27)


def main():
    _wait_for_backend()
    import jax

    # persistent compilation cache: repeated bench runs on this machine
    # skip recompiling unchanged programs entirely
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    if enable_compile_cache() is None:  # older jax: cache flags absent
        print("[bench] no persistent compile cache", file=sys.stderr)

    import jax.numpy as jnp
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                     preprocess_images)
    from tpu3dssf.data import SyntheticNuScenes

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"[bench] backend={jax.default_backend()} dtype={dtype.__name__}",
          file=sys.stderr)

    # ---- models ----
    # BENCH_BACKBONE=vitl: BASELINE config 5 (ViT-L/16 backbone) — the
    # encode runs via the looped per-layer route (make_looped_encode;
    # the one-program ViT-L jit exceeds this environment's AOT
    # compiler, PERF.md "ViT-L") and the frame is measured with the
    # chained host-side slope instead of time_device (which would
    # re-trace the loop into exactly that one program).
    backbone = os.environ.get("BENCH_BACKBONE", "vits")
    if backbone == "vitl":
        from tpu3dssf.models.vit import dinov3_large
        vit_cfg = dinov3_large()
    else:
        vit_cfg = dinov3_small()
    vit_cfg = type(vit_cfg)(**{**vit_cfg.__dict__, "dtype": dtype,
                               "use_flash": on_tpu,
                               "scan_layers": True})
    vit = VisionTransformer(vit_cfg)

    pipe_cfg = PipelineConfig(
        fusion=FusionConfig(patch_tok_dim=vit_cfg.hidden_size,
                            patch_size=vit_cfg.patch_size,
                            encoder_size=vit_cfg.image_size,
                            dtype=dtype),
        ptv3=PTv3Config(enc_window=(WINDOW,) * 5, dec_window=(WINDOW,) * 4,
                        use_pallas=on_tpu, dtype=dtype),
        voxel_size=0.1,
        voxel_capacity=VOXEL_CAP,
    )
    model = SegmentationPipeline(pipe_cfg)

    # ---- data (synthetic sweep at nuScenes scale) ----
    ds = SyntheticNuScenes(num_samples=BATCH, num_points=POINT_CAP,
                           image_hw=(900, 1600))
    samples = [ds[i] for i in range(BATCH)]
    points = jnp.asarray(
        np.stack([s["points"] for s in samples]), jnp.float32)
    valid = jnp.ones((BATCH, POINT_CAP), bool)
    images = jnp.asarray(np.stack([s["images"] for s in samples]))
    K = jnp.asarray(np.stack([s["cam_intrinsics"] for s in samples]))
    Rt = jnp.asarray(np.stack([s["lidar2cam"] for s in samples]))

    rngk = jax.random.PRNGKey(0)
    # jit the inits: eager init dispatches thousands of tiny ops, each a
    # round-trip over the tunneled-TPU transport
    t0 = time.perf_counter()
    vit_params = jax.jit(vit.init)(
        rngk, jnp.zeros((1,) + IMAGE_HW + (3,), dtype))
    jax.block_until_ready(vit_params)
    print(f"[bench] vit init {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    # frozen encoder: fold LayerScale into the Dense weights (exact);
    # BENCH_INT8=1 additionally quantizes block matmuls to W8A8
    if os.environ.get("BENCH_INT8") == "1" and on_tpu:
        from tpu3dssf.models.vit import quantize_vit
        vit_params, vit_cfg = quantize_vit(vit_params, vit_cfg)
    else:
        from tpu3dssf.models.vit import fold_layerscale
        vit_params, vit_cfg = fold_layerscale(vit_params, vit_cfg)
    vit = VisionTransformer(vit_cfg)

    @jax.jit
    def encode(imgs):
        x = preprocess_images(imgs, IMAGE_HW, dtype=dtype)
        x = x.reshape((BATCH * 6,) + x.shape[2:])
        out = vit.apply(vit_params, x)
        t = out["patch_features"]
        return t.reshape(BATCH, 6, t.shape[1], t.shape[2])

    # pipeline init only needs the token SHAPE — zeros instead of a real
    # encode() call drops the standalone encode compile (~180 s of every
    # cold driver run, BENCH_r02 tail; fused_infer compiles the encode
    # graph anyway as part of its own program)
    tokens0 = jnp.zeros(
        (BATCH, 6, vit_cfg.num_patches, vit_cfg.hidden_size), dtype)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(rngk, points, valid, tokens0, K, Rt)
    jax.block_until_ready(params)
    print(f"[bench] pipeline init {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    @jax.jit
    def fused_infer(imgs, pts, pv, cam_k, l2c):
        tokens = encode(imgs)
        return model.apply(params, pts, pv, tokens, cam_k, l2c)

    if backbone == "vitl":
        from tpu3dssf.models.vit import make_looped_encode
        enc = make_looped_encode(vit_cfg, vit_params)

        @jax.jit
        def pre(imgs, acc):
            x = preprocess_images(imgs + (acc * 0).astype(imgs.dtype),
                                  IMAGE_HW, dtype=dtype)
            return x.reshape((BATCH * 6,) + x.shape[2:])

        @jax.jit
        def rest(tokens, pts, pv, cam_k, l2c, acc):
            t = tokens.reshape(BATCH, 6, tokens.shape[1],
                               tokens.shape[2])
            out = model.apply(params, pts, pv, t, cam_k, l2c)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree.leaves(out)
                             if jnp.issubdtype(l.dtype, jnp.number))

        from tpu3dssf.utils.timing import chained_slope

        def step(acc):
            toks = enc(pre(images, acc))
            return rest(toks, points, valid, K, Rt, acc)

        t0 = time.perf_counter()
        float(step(jnp.float32(0.0)))  # compile embed/block/final+rest
        print(f"[bench] vitl compile+warmup {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        dt = chained_slope(step, warmup=False)
        pts_per_sec = POINT_CAP * BATCH / dt
        from tpu3dssf.utils.timing import peak_hbm_mb, program_peak_mb
        print(f"[bench] e2e(vitl) {dt*1e3:.1f} ms/batch-of-{BATCH} "
              f"({pts_per_sec:,.0f} points/s)", file=sys.stderr)
        # runtime high-water mark when the platform exposes stats; the
        # axon plugin returns none → static XLA buffer-assignment peak
        # of the post-encode program (the looped-encode blocks are small)
        hbm, src = peak_hbm_mb(), "runtime"
        if hbm == 0.0:
            hbm, src = program_peak_mb(
                rest, tokens0.reshape((BATCH * 6,) + tokens0.shape[2:]),
                points, valid, K, Rt, jnp.float32(0.0)), "static"
        print(json.dumps({
            "metric": "fused_points_per_sec_per_chip_vitl",
            "value": round(pts_per_sec, 1),
            "unit": "points/s",
            "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC,
                                 3),
            "peak_hbm_mb": round(hbm, 1),
            "peak_hbm_source": src,
        }))
        return

    # ---- measure ----
    # Device-side timing: host-loop timings are unreliable over the
    # tunneled-TPU transport (block_until_ready can return early and
    # identical dispatches appear memoized), so run N frames inside ONE
    # jitted fori_loop whose inputs depend on the carry (defeats
    # hoisting) and fetch a scalar.
    from tpu3dssf.utils.timing import time_device

    n_iter = 10 if on_tpu else 2
    t0 = time.perf_counter()
    dt = time_device(
        lambda pts, im, pv, cam_k, l2c: fused_infer(im, pts, pv, cam_k,
                                                    l2c),
        points, images, valid, K, Rt, iters=n_iter)
    print(f"[bench] compile+warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    pts_per_sec = POINT_CAP * BATCH / dt

    print(f"[bench] e2e {dt*1e3:.1f} ms/batch-of-{BATCH} "
          f"({pts_per_sec:,.0f} points/s)", file=sys.stderr)

    from tpu3dssf.utils.timing import peak_hbm_mb, program_peak_mb
    hbm, src = peak_hbm_mb(), "runtime"
    if hbm == 0.0:
        # axon exposes no runtime memory_stats (probe_memory.py):
        # report the static XLA buffer-assignment peak of the fused
        # program instead (trace + cache-hit compile, a few seconds)
        hbm, src = program_peak_mb(
            lambda im, pts, pv, ck, lc: fused_infer(im, pts, pv, ck, lc),
            images, points, valid, K, Rt), "static"
    print(json.dumps({
        "metric": "fused_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 3),
        "peak_hbm_mb": round(hbm, 1),
        "peak_hbm_source": src,
    }))

    if os.environ.get("BENCH_SQUEEZE") == "1" and on_tpu:
        # validate the static peak against the device (VERDICT r4 task
        # 7): fill HBM with ballast until the compiled program OOMs —
        # diagnostics only, stderr (the driver parses the stdout JSON)
        from tpu3dssf.utils.timing import hbm_squeeze
        res = hbm_squeeze(
            lambda: fused_infer(images, points, valid, K, Rt),
            log=lambda s: print(s, file=sys.stderr))
        res["static_peak_mb"] = round(hbm, 1)
        print(f"[bench] squeeze {json.dumps(res)}", file=sys.stderr)


if __name__ == "__main__":
    main()
