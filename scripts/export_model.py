"""Serialize the fusion pipeline for serving (jax.export AOT artifact).

Produces a self-contained StableHLO artifact that a serving process can
load and run without the model code:

    python scripts/export_model.py --config configs/nuscenes_default.yaml \
        --out /tmp/3dssf_serving.bin [--ckpt <dir>]

Round-trip check included (deserialize + run on dummy inputs).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic_debug.yaml")
    ap.add_argument("--out", default="/tmp/tpu3dssf_serving.bin")
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from tpu3dssf.cli import common
    from tpu3dssf.config import load_config
    from tpu3dssf.train.checkpoint import restore_checkpoint

    cfg = load_config(args.config)
    datasets = common.build_datasets(cfg)
    encode_fn, vit_cfg = common.build_image_encoder(cfg)
    model, _ = common.build_pipeline(cfg, vit_cfg)

    batch = common.example_batch(cfg, datasets)
    images = batch.pop("images", None)
    tokens = (encode_fn(images) if encode_fn is not None
              and images is not None
              else common.zero_tokens(cfg, vit_cfg, 1))
    state = common.init_state(cfg, model, batch, tokens)
    if args.ckpt:
        state, _, step = restore_checkpoint(args.ckpt, None, state)
        print(f"loaded checkpoint step {step}")
    params = state.params

    def forward(points, point_valid, patch_tokens, cam_k, lidar2cam):
        return model.apply(params, points, point_valid, patch_tokens,
                           cam_k, lidar2cam)

    example = (batch["points"], batch["point_valid"], tokens,
               batch["cam_intrinsics"], batch["lidar2cam"])
    exported = jexport.export(jax.jit(forward))(
        *[jax.ShapeDtypeStruct(np.asarray(a).shape,
                               np.asarray(a).dtype) for a in example])
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"serialized {len(blob)/1e6:.1f} MB -> {args.out}")

    # round-trip: load and execute without the model objects
    reloaded = jexport.deserialize(blob)
    out = reloaded.call(*example)
    print(f"round-trip OK: output {out.shape} {out.dtype}, "
          f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}")


if __name__ == "__main__":
    main()
