"""Batched multi-scene streaming inference over a device mesh.

BASELINE.json config 5: "batched multi-scene streaming inference ...
data-parallel over scenes". Shards each batch of scenes across the
``data`` mesh axis (tpu_params.mesh_shape), streams the split through
the fusion model, and reports per-chip throughput + the metric block.

    python -m tpu3dssf.cli.main_infer --config <yaml> [--split test]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/nuscenes_default.yaml")
    parser.add_argument("--split", type=str, default="test",
                        choices=("train", "val", "test"))
    args = parser.parse_args(argv)

    from tpu3dssf.config import load_config
    cfg = load_config(args.config)

    import jax
    from tpu3dssf.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from tpu3dssf.cli import common
    from tpu3dssf.metrics import format_metrics
    from tpu3dssf.parallel import create_mesh, replicate, shard_batch
    from tpu3dssf.train.checkpoint import restore_checkpoint
    from tpu3dssf.train.loop import MetricAccumulator, make_eval_step

    mesh_size = int(np.prod(cfg.tpu.mesh_shape))
    mesh = create_mesh((mesh_size,), ("data",)) if mesh_size > 1 else None
    print(f"devices: {jax.devices()}  mesh: "
          f"{mesh.shape if mesh else 'single-device'}")

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
        state, _, step = restore_checkpoint(ckpt, None, state)
        print(f"loaded checkpoint step {step} from {ckpt}")
    except FileNotFoundError:
        print(f"[warn] no checkpoint in {ckpt}; random init")
    if mesh is not None:
        state = replicate(state, mesh)

    eval_step = make_eval_step(loss_fn, cfg.mlp_class)

    # device-side accumulation with periodic host folds (one sync per
    # 256-batch window keeps the B=1 frame-overlap pipelining, PERF.md
    # "Batching", while full-split device int32 sums would overflow)
    acc = MetricAccumulator(cfg.mlp_class)
    total_points = 0
    t0 = time.perf_counter()

    def pad_to(batch, target):
        """Pad a partial batch to the mesh-divisible size with masked
        duplicate rows (they contribute nothing to loss or metrics)."""
        b = batch["points"].shape[0]
        if b == target:
            return batch
        padn = target - b
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            pad = np.repeat(v[-1:], padn, axis=0)
            if k in ("mask", "point_valid"):
                pad = np.zeros_like(pad)
            out[k] = np.concatenate([v, pad], axis=0)
        return out

    batch_target = loaders[args.split].batch_size
    if mesh is not None:
        batch_target = -(-batch_target // mesh_size) * mesh_size

    for batch in loaders[args.split]:
        if mesh is not None:
            batch = pad_to(batch, batch_target)
        # real (unpadded) points only — capacity slots would overstate
        # throughput on ragged data (pad_to zeroes point_valid, so
        # duplicate rows do not count either)
        total_points += int(np.asarray(batch["point_valid"]).sum())
        images = batch.pop("images", None)
        if encode_fn is not None and images is not None:
            tokens = encode_fn(images)
        else:
            tokens = common.zero_tokens(cfg, vit_cfg,
                                        batch["points"].shape[0])
        if mesh is not None:
            batch = shard_batch(batch, mesh)
            tokens = jax.device_put(
                np.asarray(tokens),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))
        ctx = mesh if mesh is not None else _nullcontext()
        with ctx:
            acc.add(eval_step(state, batch, tokens))
    metrics = acc.metrics()  # folds pending device sums → host sync
    dt = time.perf_counter() - t0
    it = acc.it

    print(format_metrics(metrics))
    n_dev = mesh_size if mesh is not None else 1
    print(f"streamed {it} batches, {total_points:,} valid points in "
          f"{dt:.1f}s  ->  {total_points/dt:,.0f} points/s "
          f"({total_points/dt/n_dev:,.0f} per chip)")
    return metrics


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
