"""Export the configured inference pipeline as a StableHLO artifact.

    python scripts/export_model.py --config configs/synthetic_debug.yaml \
        --out /tmp/model.shlo [--checkpoint DIR]

The artifact bakes in the (checkpoint or random-init) weights and can be
served without any tpu3dssf model code: see tpu3dssf/export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="Orbax checkpoint dir (default: random init)")
    args = ap.parse_args()

    import jax
    from tpu3dssf.config import load_config
    from tpu3dssf.cli import common
    from tpu3dssf.export import export_infer_bytes

    import jax.numpy as jnp

    cfg = load_config(args.config)
    datasets = common.build_datasets(cfg)
    batch = common.example_batch(cfg, datasets)
    # only the encoder GEOMETRY is needed here (token shape/dims for the
    # fusion head) — don't build/weight-load/fold the whole frozen ViT
    # (minutes of device work for dinov3_large) just to discard it. The
    # artifact consumes patch tokens; the frozen encoder exports the
    # same way if needed (vit_looped must be off — an exported artifact
    # is ONE program).
    if cfg.image_encoder == "none":
        vit_cfg = None
    else:
        from tpu3dssf.models.vit import (dinov2_small, dinov3_small,
                                         dinov3_large)
        vit_cfg = {"dinov2": dinov2_small, "dinov3": dinov3_small,
                   "dinov3_large": dinov3_large}[cfg.image_encoder]()
    model, _ = common.build_pipeline(cfg, vit_cfg)
    tokens = common.zero_tokens(cfg, vit_cfg, batch["points"].shape[0])
    # trace with the dtype the serving encoder actually emits — the
    # artifact's input signature is enforced at call time
    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" \
        else jnp.float32
    tokens = tokens.astype(dtype)
    if args.checkpoint:
        from tpu3dssf.train.checkpoint import restore_checkpoint
        state = common.init_state(cfg, model, batch, tokens)
        state, _extra, step = restore_checkpoint(args.checkpoint, None,
                                                 state)
        print(f"restored checkpoint step {step}")
        params = state.params
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch["points"], batch["point_valid"],
            tokens, batch["cam_intrinsics"], batch["lidar2cam"])

    def infer(points, point_valid, patch_tokens, cam_K, lidar2cam):
        return model.apply(params, points, point_valid, patch_tokens,
                           cam_K, lidar2cam)

    blob = export_infer_bytes(
        infer, (batch["points"], batch["point_valid"], tokens,
                batch["cam_intrinsics"], batch["lidar2cam"]))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platform={jax.default_backend()})")


if __name__ == "__main__":
    main()
