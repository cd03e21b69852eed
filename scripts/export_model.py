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

    cfg = load_config(args.config)
    datasets = common.build_datasets(cfg)
    batch = common.example_batch(cfg, datasets)
    encode_fn, vit_cfg = common.build_image_encoder(cfg)
    del encode_fn  # artifact consumes patch tokens; the frozen encoder
    #                exports the same way if needed (vit_looped must be
    #                off — an exported artifact is ONE program)
    model, _ = common.build_pipeline(cfg, vit_cfg)
    tokens = common.zero_tokens(cfg, vit_cfg, batch["points"].shape[0])
    if args.checkpoint:
        from tpu3dssf.train.checkpoint import restore_checkpoint
        state = common.init_state(cfg, model, batch, tokens)
        state = restore_checkpoint(args.checkpoint, None, state)
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
