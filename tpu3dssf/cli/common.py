"""Shared CLI wiring: config → data, models, loss, optimizer, state.

Mirrors the setup blocks of the reference entry points
(main_train.py:28-91, main_test.py:32-76) — one place instead of three
copies.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from tpu3dssf.config import Config, load_label_mapping


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_datasets(cfg: Config) -> Dict[str, object]:
    """All three splits — fixes the reference's missing 'test' wiring
    (utils/test.py:27 iterates dataloaders['test'] that
    create_dataloaders never builds, SURVEY.md §3.2)."""
    if cfg.tpu.dataset == "synthetic":
        from tpu3dssf.data import SyntheticNuScenes
        n = cfg.tpu.synthetic_samples or (4 if cfg.debug else 16)
        kw = dict(num_points=cfg.tpu.synthetic_points,
                  image_hw=tuple(cfg.tpu.synthetic_image_hw),
                  render_semantics=cfg.tpu.synthetic_render,
                  cache=cfg.max_num_epochs > 1)
        return {
            "train": SyntheticNuScenes(num_samples=n, seed=0, **kw),
            "val": SyntheticNuScenes(num_samples=max(2, n // 4), seed=1,
                                     **kw),
            "test": SyntheticNuScenes(num_samples=max(2, n // 4), seed=2,
                                      **kw),
        }

    from tpu3dssf.data import NuScenesDataset
    mapping = load_label_mapping(cfg.label_mapping)
    learning_map = {int(k): int(v)
                    for k, v in mapping["learning_map"].items()}
    version = ("v1.0-mini" if cfg.debug else "v1.0-trainval")
    out = {}
    for split, loader in (("train", cfg.train_loader),
                          ("val", cfg.val_loader),
                          ("test", cfg.test_loader)):
        out[split] = NuScenesDataset(
            dataroot=loader.data_path or cfg.train_loader.data_path,
            version=version, split=split, learning_map=learning_map,
            point_capacity=cfg.tpu.point_capacity)
    return out


def build_dataloaders(cfg: Config, datasets=None) -> Dict[str, object]:
    from tpu3dssf.data import HostDataPipeline
    datasets = datasets or build_datasets(cfg)
    loaders = {}
    for split, lcfg in (("train", cfg.train_loader),
                        ("val", cfg.val_loader),
                        ("test", cfg.test_loader)):
        loaders[split] = HostDataPipeline(
            datasets[split], batch_size=lcfg.batch_size,
            point_capacity=cfg.tpu.point_capacity,
            shuffle=lcfg.shuffle, drop_last=(split == "train"),
            num_workers=lcfg.num_workers)
    return loaders


def build_image_encoder(cfg: Config):
    """Frozen ViT + jit encode fn; returns (encode_fn, vit_cfg) or
    (None, None) for the LiDAR-only path."""
    import jax
    import jax.numpy as jnp
    from tpu3dssf.models.vit import (VisionTransformer, dinov2_small,
                                     dinov3_small, dinov3_large)
    from tpu3dssf.train.loop import make_image_encode_fn

    if cfg.image_encoder == "none":
        return None, None

    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" \
        else jnp.float32
    vit_cfg = {"dinov2": dinov2_small, "dinov3": dinov3_small,
               "dinov3_large": dinov3_large}[cfg.image_encoder]()
    use_flash = cfg.tpu.use_pallas and jax.default_backend() != "cpu"
    vit_cfg = type(vit_cfg)(**{**vit_cfg.__dict__, "dtype": dtype,
                               "use_flash": use_flash,
                               "scan_layers": True})
    vit = VisionTransformer(vit_cfg)

    from tpu3dssf.models.vit_port import try_load_pretrained
    params = try_load_pretrained(cfg.image_encoder, vit, vit_cfg)
    if params is None:
        print(f"[cli] no pretrained {cfg.image_encoder} weights found "
              "locally (zero-egress image) — using random-init frozen ViT")
        params = jax.jit(vit.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1,) + vit_cfg.image_size + (3,), dtype))
    # the encoder is frozen (excluded from the optimizer, SURVEY.md
    # §3.1), so LayerScale can be folded into the Dense weights exactly
    from tpu3dssf.models.vit import fold_layerscale
    params, folded_cfg = fold_layerscale(params, vit_cfg)
    vit = VisionTransformer(folded_cfg)
    looped = (cfg.tpu.vit_looped == "on" or
              (cfg.tpu.vit_looped == "auto" and
               cfg.image_encoder == "dinov3_large" and
               jax.default_backend() != "cpu"))
    encode = make_image_encode_fn(vit, params, vit_cfg.image_size, dtype,
                                  looped=looped)
    return encode, vit_cfg


def build_pipeline(cfg: Config, vit_cfg=None):
    import jax.numpy as jnp
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config

    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" \
        else jnp.float32
    w = cfg.tpu.window_size
    import jax
    use_pallas = cfg.tpu.use_pallas and jax.default_backend() != "cpu"

    if vit_cfg is not None:
        fusion = FusionConfig(
            patch_tok_dim=vit_cfg.hidden_size,
            patch_size=vit_cfg.patch_size,
            encoder_size=vit_cfg.image_size,
            output_dim=cfg.mlp_class,
            dtype=dtype)
    else:
        fusion = FusionConfig(output_dim=cfg.mlp_class, dtype=dtype)

    pipe = PipelineConfig(
        fusion=fusion,
        ptv3=PTv3Config(enc_window=(w,) * 5, dec_window=(w,) * 4,
                        use_pallas=use_pallas, remat=cfg.tpu.remat,
                        remat_attention=cfg.tpu.remat_attention,
                        scan_blocks=cfg.tpu.scan_blocks,
                        drop_path=cfg.drop_path, dtype=dtype),
        voxel_size=cfg.voxel_size,
        voxel_capacity=_round_up(cfg.tpu.voxel_capacity, w),
        intensity_mode=cfg.tpu.intensity_mode,
        devoxelize_mode=cfg.tpu.devoxelize_mode,
    )
    if cfg.image_encoder == "none":
        from tpu3dssf.models.lidar_only import LidarSegmentationModel
        return LidarSegmentationModel(pipe), pipe
    return SegmentationPipeline(pipe), pipe


def example_batch(cfg: Config, datasets) -> Tuple[Dict, object]:
    """One packed batch (for init) + its patch-token placeholder shape."""
    from tpu3dssf.data import HostDataPipeline
    pipe = HostDataPipeline(
        datasets["val"], batch_size=1,
        point_capacity=cfg.tpu.point_capacity)
    return next(iter(pipe))


def init_state(cfg: Config, model, batch, tokens, steps_per_epoch=1):
    import jax
    from tpu3dssf.train import create_optimizer, create_train_state
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["points"], batch["point_valid"],
        tokens, batch["cam_intrinsics"], batch["lidar2cam"])
    opt = create_optimizer(
        cfg.optimizer, cfg.learning_rate, weight_decay=cfg.weight_decay,
        momentum=cfg.momentum, nesterov=cfg.nesterov,
        lr_scheduler=cfg.lr_scheduler, steps_per_epoch=steps_per_epoch,
        num_epochs=cfg.max_num_epochs, grad_clip=cfg.grad_clip,
        skip_nonfinite=cfg.skip_nonfinite)
    return create_train_state(model, params, opt)


def build_loss(cfg: Config):
    from tpu3dssf.losses import CELSLoss
    weights = (np.asarray(cfg.class_weights, np.float32)
               if cfg.class_weights else None)
    return CELSLoss(weight=weights, ignore_index=0,
                    lamda_lovasz=cfg.lambda_lovasz)


def zero_tokens(cfg: Config, vit_cfg, batch_size: int):
    """Placeholder tokens for the LiDAR-only path (image_encoder: none).

    LidarSegmentationModel ignores them, so keep the array trivial."""
    import jax.numpy as jnp
    if vit_cfg is None:
        return jnp.zeros((batch_size, 1, 1, 1), jnp.float32)
    return jnp.zeros(
        (batch_size, 6, vit_cfg.num_patches, vit_cfg.hidden_size),
        jnp.float32)
