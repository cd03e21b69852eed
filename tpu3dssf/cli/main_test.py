"""Full test-set evaluation CLI (reference main_test.py:17-97).

Loads the best checkpoint, evaluates the test split, prints the metric
block, writes the per-class IoU chart.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/nuscenes_default.yaml")
    args = parser.parse_args(argv)

    from tpu3dssf.config import load_config, load_class_dict
    cfg = load_config(args.config)
    print(f"Loaded config from: {args.config}")

    from tpu3dssf.cli import common
    from tpu3dssf.train.checkpoint import restore_checkpoint
    from tpu3dssf.train.loop import evaluate_model, make_eval_step
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    from tpu3dssf.utils.viz import plot_iou_per_class

    enable_compile_cache()

    datasets = common.build_datasets(cfg)
    loaders = common.build_dataloaders(cfg, datasets)
    encode_fn, vit_cfg = common.build_image_encoder(cfg)
    model, _ = common.build_pipeline(cfg, vit_cfg)
    loss_fn = common.build_loss(cfg)

    batch = common.example_batch(cfg, datasets)
    images = batch.pop("images", None)
    tokens = (encode_fn(images) if encode_fn is not None
              and images is not None
              else common.zero_tokens(cfg, vit_cfg, 1))
    state = common.init_state(cfg, model, batch, tokens)

    ckpt = cfg.test_checkpoint_path or cfg.checkpoint_path
    try:
        state, extra, step = restore_checkpoint(ckpt, None, state)
        print(f"Loaded checkpoint from {ckpt} (step {step})")
    except FileNotFoundError:
        print(f"[warn] no checkpoint under {ckpt}; evaluating random init")

    eval_step = make_eval_step(loss_fn, cfg.mlp_class)

    def zero_tokens_fn(b):
        return common.zero_tokens(cfg, vit_cfg, b["points"].shape[0])

    metrics = evaluate_model(
        state, iter(loaders["test"]), eval_step, encode_fn,
        cfg.mlp_class,
        zero_tokens_fn=None if encode_fn else zero_tokens_fn)

    class_names = None
    if cfg.label_mapping and os.path.exists(cfg.label_mapping):
        class_names = load_class_dict(cfg.label_mapping)
    path = plot_iou_per_class(metrics["iou_per_class"], class_names,
                              ckpt)
    print(f"Per-class IoU chart: {path}")
    return metrics


if __name__ == "__main__":
    main()
