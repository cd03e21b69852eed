"""Training CLI — ``python -m tpu3dssf.cli.main_train --config <yaml>``.

Same public contract as the reference main_train.py:18-116 (argparse
--config, YAML schema, debug-mode banner, resume-from-best, history plot),
rebuilt over the jit train loop.
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
                        default="configs/nuscenes_default.yaml",
                        help="Path to config YAML file")
    parser.add_argument("--tee-log", action="store_true",
                        help="tee stdout/stderr to <ckpt>/train.log")
    parser.add_argument("--resume", action="store_true",
                        help="resume full train state (params+optimizer+"
                             "epoch) from <ckpt>/last")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of a few "
                             "train steps into this directory")
    args = parser.parse_args(argv)

    from tpu3dssf.config import load_config
    cfg = load_config(args.config)
    print(f"Loaded config from: {args.config}")
    print("Start training in "
          + ("DEBUG mode" if cfg.debug else "FULL DATASET mode"))

    if args.tee_log:
        from tpu3dssf.utils.logging import tee_stdout
        tee_stdout(cfg.checkpoint_path)

    import jax
    print(f"Using devices: {jax.devices()}")
    # persistent compilation cache: resumed/repeated runs on this host
    # skip recompiling unchanged programs (cold ViT compiles are minutes
    # over the tunneled AOT service, PERF.md "Compile time")
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from tpu3dssf.cli import common
    from tpu3dssf.train.loop import train_model
    from tpu3dssf.train.checkpoint import restore_checkpoint
    from tpu3dssf.utils.logging import create_logger
    from tpu3dssf.utils.viz import plot_training_history

    datasets = common.build_datasets(cfg)
    loaders = common.build_dataloaders(cfg, datasets)

    encode_fn, vit_cfg = common.build_image_encoder(cfg)
    model, _ = common.build_pipeline(cfg, vit_cfg)
    loss_fn = common.build_loss(cfg)

    batch = common.example_batch(cfg, datasets)
    images = batch.pop("images", None)
    if encode_fn is not None and images is not None:
        tokens = encode_fn(images)
    else:
        tokens = common.zero_tokens(cfg, vit_cfg, 1)

    steps_per_epoch = max(1, len(loaders["train"]))
    state = common.init_state(cfg, model, batch, tokens, steps_per_epoch)

    start_epoch, best_acc = 0, -1.0
    if args.resume:
        try:
            state, extra, step = restore_checkpoint(
                os.path.join(cfg.checkpoint_path, "last"), None, state)
            start_epoch = int(extra.get("epoch", step)) + 1
            best_acc = float(extra.get("best_acc", -1.0))
            print(f"Resumed full train state at epoch {start_epoch} "
                  f"(best_acc={best_acc:.4f})")
        except FileNotFoundError:
            print("[warn] --resume set but no last/ checkpoint; "
                  "training from scratch")
    elif cfg.train_best_weights and cfg.best_model_path:
        ckpt_dir = os.path.dirname(cfg.best_model_path) or \
            cfg.best_model_path
        try:
            state, extra, step = restore_checkpoint(ckpt_dir, None, state)
            print(f"Resumed from {ckpt_dir} step {step} "
                  f"(best_acc={extra.get('best_acc')})")
        except FileNotFoundError:
            print(f"[warn] train_best_weights set but no checkpoint at "
                  f"{ckpt_dir}; training from scratch")

    logger = create_logger(cfg.checkpoint_path, config=cfg.raw)

    def zero_tokens_fn(b):
        return common.zero_tokens(cfg, vit_cfg, b["points"].shape[0])

    dropout_rng = (jax.random.PRNGKey(42) if cfg.drop_path > 0 else None)
    tr_hist, val_hist = train_model(
        state, loaders, loss_fn, encode_fn,
        num_classes=cfg.mlp_class,
        num_epochs=cfg.max_num_epochs,
        save_dir=cfg.checkpoint_path,
        logger=logger,
        zero_tokens_fn=None if encode_fn else zero_tokens_fn,
        profile_dir=args.profile_dir,
        start_epoch=start_epoch,
        best_acc=best_acc,
        dropout_rng=dropout_rng,
        grad_accum=cfg.tpu.grad_accum,
    )
    logger.finish()
    plot_training_history(tr_hist, val_hist, cfg.checkpoint_path)
    print(f"Artifacts written to {cfg.checkpoint_path}")


if __name__ == "__main__":
    main()
