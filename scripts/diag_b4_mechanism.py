"""Adjudicate the B=4 inference penalty mechanism (VERDICT r4 task 6).

PERF.md "Batching" item 4 attributes the −21% per-frame cost at B=4 to
"cross-frame pipelining inside the measurement/serving loop" that B=1
enjoys and B=4 loses. That explanation has only ever been correlational.
Two instruments here:

1. **jax.profiler trace** of the serving fn at B=1 and B=4 (attempted —
   this transport historically drops device ops from traces; the script
   reports what the trace actually contains rather than assuming).
2. **Strict-chaining differential**: `time_device` already serializes
   iterations through the carry (every input gets `+ (acc*0)`), but a
   zero-valued add constrains only the SCHEDULE's data edges — XLA/Mosaic
   may still overlap iteration i+1's HBM streaming with iteration i's
   compute. The strict variant makes the next frame's POINTS genuinely
   depend on the previous frame's LOGITS (value dependence, not a
   synthesized zero), which forbids any cross-frame overlap. If
     strict(B=1) ≈ plain(B=1)  → there was no overlap to lose: the
       pipelining explanation is REFUTED and the penalty is per-op cost
       growth at B=4 (the diag_batching stage table);
     strict(B=1) ≈ 4·plain(B=4)/4 per frame → B=1's advantage WAS
       overlap: explanation confirmed without a trace.

Run bare on the TPU:  python scripts/diag_b4_mechanism.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_small,
                                     fold_layerscale, preprocess_images)
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    from tpu3dssf.utils.timing import time_device

    enable_compile_cache()
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    P, V, W = 34816, 25600, 1024
    IMAGE_HW = (640, 1138)
    rng = np.random.default_rng(0)

    vcfg = dinov3_small()
    vcfg = type(vcfg)(**{**vcfg.__dict__, "dtype": dtype,
                         "use_flash": on_tpu, "scan_layers": True})
    vit = VisionTransformer(vcfg)
    vp = jax.jit(vit.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + IMAGE_HW + (3,), dtype))
    vp, vcfg = fold_layerscale(vp, vcfg)
    vit = VisionTransformer(vcfg)

    results = {}
    for B in (1, 4):
        cfg = PipelineConfig(
            fusion=FusionConfig(patch_tok_dim=vcfg.hidden_size,
                                patch_size=vcfg.patch_size,
                                encoder_size=vcfg.image_size,
                                dtype=dtype),
            ptv3=PTv3Config(enc_window=(W,) * 5, dec_window=(W,) * 4,
                            use_pallas=on_tpu, dtype=dtype),
            voxel_size=0.1, voxel_capacity=V)
        model = SegmentationPipeline(cfg)
        pts = jnp.asarray(np.concatenate(
            [rng.normal(size=(B, P, 3)) * 20, rng.random((B, P, 1))],
            -1), jnp.float32)
        pv = jnp.ones((B, P), bool)
        imgs = jnp.asarray(rng.integers(0, 255, (B, 6, 900, 1600, 3),
                                        dtype=np.uint8))
        K = jnp.asarray(np.tile(np.array(
            [[500., 0, 569.], [0, 500., 320.], [0, 0, 1.]],
            np.float32), (B, 6, 1, 1)))
        Rt = jnp.tile(jnp.eye(4), (B, 6, 1, 1))

        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), pts, pv,
            jnp.zeros((B, 6, vcfg.num_patches, vcfg.hidden_size), dtype),
            K, Rt)

        def infer(im, p, v_, k_, rt):
            x = preprocess_images(im, IMAGE_HW, dtype=dtype)
            x = x.reshape((B * 6,) + x.shape[2:])
            t = vit.apply(vp, x)["patch_features"]
            t = t.reshape(B, 6, t.shape[1], t.shape[2])
            return model.apply(params, p, v_, t, k_, rt)

        t0 = time.perf_counter()
        dt_plain = time_device(infer, imgs, pts, pv, K, Rt, iters=10)
        print(f"B={B}: plain  {dt_plain*1e3:7.1f} ms/batch "
              f"({dt_plain/B*1e3:6.1f} ms/frame) "
              f"[compile {time.perf_counter()-t0:.0f}s]", flush=True)

        # strict chaining: next frame's points VALUE-depend on the
        # previous frame's logits — no cross-iteration overlap possible
        @jax.jit
        def strict_run(n, im, p, v_, k_, rt):
            def body(i, carry):
                acc, p_cur = carry
                out = infer(im, p_cur, v_, k_, rt)
                s = jnp.sum(out.astype(jnp.float32)) * 1e-12
                # fold the (tiny but nonzero-graph) scalar into every
                # point coordinate: a real value dependence
                p_next = p + s
                return (acc + s, p_next)

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), p))
            return acc

        float(strict_run(jnp.int32(1), imgs, pts, pv, K, Rt))  # compile

        def wall(n):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(strict_run(jnp.int32(n), imgs, pts, pv, K, Rt))
                best = min(best, time.perf_counter() - t0)
            return best

        dt_strict = (wall(40) - wall(10)) / 30
        print(f"B={B}: strict {dt_strict*1e3:7.1f} ms/batch "
              f"({dt_strict/B*1e3:6.1f} ms/frame)", flush=True)
        results[B] = (dt_plain / B, dt_strict / B)

        # profiler attempt — record what this transport actually traces
        if B == 4 and os.environ.get("B4_TRACE", "1") == "1":
            tdir = "/tmp/b4_trace"
            try:
                with jax.profiler.trace(tdir):
                    jax.block_until_ready(infer(imgs, pts, pv, K, Rt))
                import glob
                files = glob.glob(tdir + "/**/*.xplane.pb",
                                  recursive=True)
                sizes = {os.path.basename(f): os.path.getsize(f)
                         for f in files}
                print(f"profiler trace files: {sizes}", flush=True)
            except Exception as e:
                print(f"profiler trace FAILED: {type(e).__name__}: {e}",
                      flush=True)

    p1, s1 = results[1]
    p4, s4 = results[4]
    print("\n==== verdict ====")
    print(f"per-frame plain : B=1 {p1*1e3:6.1f} ms | B=4 {p4*1e3:6.1f} ms "
          f"({(p4/p1-1)*100:+.1f}%)")
    print(f"per-frame strict: B=1 {s1*1e3:6.1f} ms | B=4 {s4*1e3:6.1f} ms")
    if s1 > 1.1 * p1:
        print("strict B=1 is slower than plain B=1 → B=1 WAS overlapping "
              "across frames; pipelining explanation SUPPORTED")
    else:
        print("strict B=1 ≈ plain B=1 → no cross-frame overlap existed; "
              "pipelining explanation REFUTED — the penalty is per-op "
              "cost growth at B=4 (see diag_batching stage table)")


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    main()
