"""Single-sample demo CLI (reference main_sample.py:18-100).

One batch from the test split → metrics + the full visualization set:
GT-vs-pred 3D HTML + per-camera overlay PNGs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/nuscenes_default.yaml")
    args = parser.parse_args(argv)

    from tpu3dssf.config import load_config
    cfg = load_config(args.config)
    print(f"Loaded config from: {args.config}")

    from tpu3dssf.cli import common
    from tpu3dssf.metrics import (confusion_matrix,
                                  evaluate_from_confusion, format_metrics)
    from tpu3dssf.train.checkpoint import restore_checkpoint
    from tpu3dssf.utils.viz import (plot_comparison_cloud,
                                    plot_images_with_point_cloud)

    datasets = common.build_datasets(cfg)
    loaders = common.build_dataloaders(cfg, datasets)
    encode_fn, vit_cfg = common.build_image_encoder(cfg)
    model, _ = common.build_pipeline(cfg, vit_cfg)
    loss_fn = common.build_loss(cfg)

    batch = next(iter(loaders["test"]))
    images = batch.pop("images", None)
    tokens = (encode_fn(images) if encode_fn is not None
              and images is not None
              else common.zero_tokens(cfg, vit_cfg,
                                      batch["points"].shape[0]))
    state = common.init_state(cfg, model, batch, tokens)

    ckpt = cfg.test_checkpoint_path or cfg.checkpoint_path
    try:
        state, _, step = restore_checkpoint(ckpt, None, state)
        print(f"Loaded checkpoint from {ckpt} (step {step})")
    except FileNotFoundError:
        print(f"[warn] no checkpoint under {ckpt}; using random init")

    logits = state.apply_fn(
        state.params, batch["points"], batch["point_valid"], tokens,
        batch["cam_intrinsics"], batch["lidar2cam"])
    out = loss_fn(logits, batch["labels"], batch["mask"])

    cm = confusion_matrix(out.predictions, batch["labels"],
                          cfg.mlp_class, out.valid)
    metrics = evaluate_from_confusion(
        cm, float(out.total), int(out.num_correct), int(out.num_valid), 1)
    print(format_metrics(metrics))

    # visualization (first sample of the batch, valid points only)
    valid0 = np.asarray(out.valid[0])
    pts0 = np.asarray(batch["points"][0])[valid0]
    gt0 = np.asarray(batch["labels"][0])[valid0]
    pr0 = np.asarray(out.predictions[0])[valid0]

    save_dir = ckpt or "."
    html = plot_comparison_cloud(pts0, gt0, pr0, save_dir)
    print(f"3D comparison: {html}")
    if images is not None:
        paths = plot_images_with_point_cloud(
            np.asarray(images[0]), pts0, pr0, gt0,
            np.asarray(batch["cam_intrinsics"][0]),
            np.asarray(batch["lidar2cam"][0]), save_dir)
        print(f"Camera overlays: {paths}")
    return metrics


if __name__ == "__main__":
    main()
