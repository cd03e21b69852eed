"""Training-step throughput on the real TPU at nuScenes scale.

Measures the full jit train step (forward + CE+Lovász + backward +
AdamW) for the LiDAR-only model (PTv3) and the fusion head, device-side.

    python scripts/bench_train.py                  # B=2 + phase split
    TRAIN_BATCHES=2,4,8,12 python scripts/bench_train.py
        # batch-scaling sweep (VERDICT r3 task 2: the reference trains
        # batch 12, config/nuscenesTestConfig22.yaml:52) — fusion step
        # per batch size, per-point throughput + peak HBM; TRAIN_REMAT=1
        # adds per-block remat
    TRAIN_BATCHES=12 TRAIN_ACCUM=6 python scripts/bench_train.py
        # same optimizer step via 6 sequential B=2 microbatches
        # (lax.scan gradient accumulation, train/loop.py grad_accum)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def batch_scaling(batches):
    """Fusion train step at each B: ms/step, points/s, peak HBM."""
    import jax
    import jax.numpy as jnp
    import optax
    from tpu3dssf.losses import CELSLoss
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config
    from tpu3dssf.train import create_train_state
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    from tpu3dssf.utils.timing import (peak_hbm_mb, program_peak_mb,
                                       time_device)

    enable_compile_cache()
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    P, V, W = 34816, 25600, 1024
    remat_env = os.environ.get("TRAIN_REMAT", "")
    remat = remat_env == "1"           # full-block remat
    remat_attn = remat_env == "attn"   # attention-branch-only remat
    loss_fn = CELSLoss(weight=np.ones(16, np.float32))
    rng = np.random.default_rng(0)

    for B in batches:
        batch = {
            "points": jnp.asarray(np.concatenate(
                [rng.normal(size=(B, P, 3)) * 20, rng.random((B, P, 1))],
                -1), jnp.float32),
            "point_valid": jnp.ones((B, P), bool),
            "labels": jnp.asarray(rng.integers(0, 17, (B, P)), jnp.int32),
            "mask": jnp.ones((B, P), bool),
            "cam_intrinsics": jnp.zeros((B, 6, 3, 3)),
            "lidar2cam": jnp.tile(jnp.eye(4), (B, 6, 1, 1)),
        }
        tokens = jnp.asarray(
            rng.normal(size=(B, 6, 2840, 384)) * 0.02, dtype)
        cfg = PipelineConfig(
            fusion=FusionConfig(patch_tok_dim=384, dtype=dtype),
            ptv3=PTv3Config(enc_window=(W,) * 5, dec_window=(W,) * 4,
                            use_pallas=on_tpu, remat=remat,
                            remat_attention=remat_attn, dtype=dtype),
            voxel_size=0.1, voxel_capacity=V)
        model = SegmentationPipeline(cfg)
        try:
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), batch["points"],
                batch["point_valid"], tokens, batch["cam_intrinsics"],
                batch["lidar2cam"])
            state = create_train_state(model, params, optax.adamw(1e-3))

            accum = int(os.environ.get("TRAIN_ACCUM", "1"))

            def step(points, toks, state=state, batch=batch,
                     accum=accum):
                def loss(p, b, pts, t):
                    logits = state.apply_fn(
                        p, pts, b["point_valid"], t,
                        b["cam_intrinsics"], b["lidar2cam"])
                    return loss_fn(logits, b["labels"], b["mask"]).total

                if accum == 1:
                    l, grads = jax.value_and_grad(loss)(
                        state.params, batch, points, toks)
                else:
                    def split(x):
                        return x.reshape(
                            (accum, x.shape[0] // accum) + x.shape[1:])

                    xs = (jax.tree.map(split, batch), split(points),
                          split(toks))

                    def micro(carry, mx):
                        g_acc, l_acc = carry
                        b, pts, t = mx
                        l, g = jax.value_and_grad(loss)(
                            state.params, b, pts, t)
                        return (jax.tree.map(jnp.add, g_acc, g),
                                l_acc + l), None

                    (g_acc, l_sum), _ = jax.lax.scan(
                        micro,
                        (jax.tree.map(jnp.zeros_like, state.params),
                         jnp.float32(0)), xs)
                    grads = jax.tree.map(lambda g: g / accum, g_acc)
                    l = l_sum / accum
                new_state = state.apply_gradients(grads=grads)
                return (l, new_state.params)  # all leaves live (no DCE)

            t0 = time.perf_counter()
            dt = time_device(step, batch["points"], tokens, iters=10)
            # axon exposes no runtime memory_stats; TRAIN_MEM=1 pays one
            # extra compile per B for the static XLA peak of the step
            hbm = peak_hbm_mb()
            if hbm == 0.0 and os.environ.get("TRAIN_MEM") == "1":
                hbm = program_peak_mb(step, batch["points"], tokens)
            print(f"fusion train B={B:2d} ({P} pts/sample"
                  f"{', remat' if remat else ''}"
                  f"{f', accum={accum}' if accum > 1 else ''}):"
                  f" {dt*1e3:7.1f} ms "
                  f"({B*P/dt:,.0f} points/s, "
                  f"{B*P/dt/B:,.0f} pts/s/sample-slot) "
                  f"peak_hbm={hbm:,.0f} MiB "
                  f"[compile {time.perf_counter()-t0:.0f}s]")
            if os.environ.get("TRAIN_PHASES") == "1":
                # fwd/bwd split per B — locates where the per-point
                # drift at large B lands (fwd working set vs bwd)
                def fwd_only(points, toks, state=state, batch=batch):
                    logits = state.apply_fn(
                        state.params, points, batch["point_valid"],
                        toks, batch["cam_intrinsics"],
                        batch["lidar2cam"])
                    return loss_fn(logits, batch["labels"],
                                   batch["mask"]).total

                def fwd_bwd(points, toks, state=state, batch=batch):
                    def loss(p):
                        logits = state.apply_fn(
                            p, points, batch["point_valid"], toks,
                            batch["cam_intrinsics"], batch["lidar2cam"])
                        return loss_fn(logits, batch["labels"],
                                       batch["mask"]).total

                    l, grads = jax.value_and_grad(loss)(state.params)
                    return l + sum(jnp.sum(g.astype(jnp.float32))
                                   for g in jax.tree.leaves(grads))

                d_f = time_device(fwd_only, batch["points"], tokens,
                                  iters=10)
                d_fb = time_device(fwd_bwd, batch["points"], tokens,
                                   iters=10)
                print(f"    fwd {d_f*1e3:6.1f} ms | bwd "
                      f"{(d_fb-d_f)*1e3:6.1f} ms | opt+misc "
                      f"{(dt-d_fb)*1e3:6.1f} ms")
            if os.environ.get("TRAIN_SQUEEZE") == "1" and \
                    jax.default_backend() != "cpu":
                # empirical cross-check of the static peak (VERDICT r4
                # task 7): ballast-squeeze the already-compiled step —
                # k_ok*unit + real_peak ≈ usable HBM, and the usable-HBM
                # constant cancels against bench.py's BENCH_SQUEEZE=1
                # run of the inference program (same unit size)
                from tpu3dssf.utils.timing import hbm_squeeze
                step_j = jax.jit(step)  # raw step would trace eagerly
                res = hbm_squeeze(
                    lambda: step_j(batch["points"], tokens))
                res["static_peak_mb"] = round(hbm, 1)
                import json
                print(f"    squeeze {json.dumps(res)}")
        except Exception as e:  # OOM etc. — report and continue
            print(f"fusion train B={B:2d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}")
        # free before the next size
        del batch, tokens
        try:
            del params, state
        except UnboundLocalError:
            pass


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from tpu3dssf.losses import CELSLoss
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.lidar_only import LidarSegmentationModel
    from tpu3dssf.models.ptv3 import PTv3Config
    from tpu3dssf.train import create_train_state
    from tpu3dssf.utils.timing import time_device

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B, P, V, W = 2, 34816, 25600, 1024

    rng = np.random.default_rng(0)
    batch = {
        "points": jnp.asarray(np.concatenate(
            [rng.normal(size=(B, P, 3)) * 20, rng.random((B, P, 1))],
            -1), jnp.float32),
        "point_valid": jnp.ones((B, P), bool),
        "labels": jnp.asarray(rng.integers(0, 17, (B, P)), jnp.int32),
        "mask": jnp.ones((B, P), bool),
        "cam_intrinsics": jnp.zeros((B, 6, 3, 3)),
        "lidar2cam": jnp.tile(jnp.eye(4), (B, 6, 1, 1)),
    }
    loss_fn = CELSLoss(weight=np.ones(16, np.float32))

    for name, tok_dim, remat in [("lidar-only", 1, False),
                                 ("lidar-only+remat", 1, True),
                                 ("fusion", 384, False)]:
        cfg = PipelineConfig(
            fusion=FusionConfig(patch_tok_dim=max(tok_dim, 8),
                                dtype=dtype),
            ptv3=PTv3Config(enc_window=(W,) * 5, dec_window=(W,) * 4,
                            use_pallas=on_tpu, remat=remat, dtype=dtype),
            voxel_size=0.1, voxel_capacity=V)
        if name.startswith("lidar-only"):
            model = LidarSegmentationModel(cfg)
            tokens = jnp.zeros((B, 1, 1, 1), jnp.float32)
        else:
            model = SegmentationPipeline(cfg)
            tokens = jnp.asarray(
                rng.normal(size=(B, 6, 2840, 384)) * 0.02, dtype)

        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch["points"], batch["point_valid"],
            tokens, batch["cam_intrinsics"], batch["lidar2cam"])
        state = create_train_state(model, params, optax.adamw(1e-3))

        def step(points, toks, state=state):
            def loss(p):
                logits = state.apply_fn(
                    p, points, batch["point_valid"], toks,
                    batch["cam_intrinsics"], batch["lidar2cam"])
                return loss_fn(logits, batch["labels"],
                               batch["mask"]).total

            l, grads = jax.value_and_grad(loss)(state.params)
            new_state = state.apply_gradients(grads=grads)
            # return the WHOLE new state: time_device's _live_sum keeps
            # every leaf live. Returning only leaf[0].mean() (round 2)
            # let XLA dead-code-eliminate most per-param weight-grad
            # matmuls and optimizer updates — the 53.7 ms round-2 step
            # was DCE-flattered (honest number: see PERF.md round 3).
            return (l, new_state.params)

        t0 = time.perf_counter()
        dt = time_device(step, batch["points"], tokens, iters=10)
        print(f"{name:20s} train step (B={B}, {P} pts): {dt*1e3:7.1f} ms "
              f"({B*P/dt:,.0f} points/s)  "
              f"[compile {time.perf_counter()-t0:.0f}s]")

        if name != "lidar-only":
            continue
        # ---- per-phase breakdown (VERDICT r2 #7): fwd / bwd / opt ----

        def fwd_only(points, toks, state=state):
            logits = state.apply_fn(
                state.params, points, batch["point_valid"], toks,
                batch["cam_intrinsics"], batch["lidar2cam"])
            return loss_fn(logits, batch["labels"], batch["mask"]).total

        def fwd_bwd(points, toks, state=state):
            def loss(p):
                logits = state.apply_fn(
                    p, points, batch["point_valid"], toks,
                    batch["cam_intrinsics"], batch["lidar2cam"])
                return loss_fn(logits, batch["labels"],
                               batch["mask"]).total

            l, grads = jax.value_and_grad(loss)(state.params)
            return l + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree.leaves(grads))

        d_f = time_device(fwd_only, batch["points"], tokens, iters=10)
        d_fb = time_device(fwd_bwd, batch["points"], tokens, iters=10)
        print(f"{'':20s}   fwd {d_f*1e3:6.1f} ms | bwd "
              f"{(d_fb-d_f)*1e3:6.1f} ms | opt+misc "
              f"{(dt-d_fb)*1e3:6.1f} ms (residuals of {dt*1e3:.1f})")


if __name__ == "__main__":
    print("backend:", end=" ")
    import jax
    print(jax.default_backend())
    bs = os.environ.get("TRAIN_BATCHES")
    if bs:
        batch_scaling([int(b) for b in bs.split(",")])
    else:
        main()
