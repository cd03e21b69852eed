"""Fusion head + end-to-end pipeline tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.models.fusion import (
    FeatureFusionModel,
    FusionConfig,
    PipelineConfig,
    SegmentationPipeline,
    gather_camera_features,
)
from tpu3dssf.models.ptv3 import PTv3Config


def _calib(rng, B, n_cam=6):
    K = np.zeros((B, n_cam, 3, 3), np.float32)
    K[:, :, 0, 0] = K[:, :, 1, 1] = 1200.0
    K[:, :, 0, 2] = 800.0
    K[:, :, 1, 2] = 450.0
    K[:, :, 2, 2] = 1.0
    Rt = np.tile(np.eye(4, dtype=np.float32), (B, n_cam, 1, 1))
    # rotate cameras to look along +z in different yaw directions
    for c in range(n_cam):
        a = 2 * np.pi * c / n_cam
        Rt[:, c, 0, 0] = np.cos(a)
        Rt[:, c, 0, 1] = -np.sin(a)
        Rt[:, c, 1, 0] = np.sin(a)
        Rt[:, c, 1, 1] = np.cos(a)
    return jnp.asarray(K), jnp.asarray(Rt)


def test_gather_masked_mean_matches_oracle(rng):
    B, V, n_cam, M, D = 1, 32, 6, 2840, 8
    cfg = FusionConfig(patch_tok_dim=D)
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, D)), jnp.float32)
    xyz = jnp.asarray(rng.normal(size=(B, V, 3)) * 20, jnp.float32)
    K, Rt = _calib(rng, B)

    fused, valid = gather_camera_features(tokens, xyz, K, Rt, cfg)
    assert fused.shape == (B, V, D)

    # oracle: recompute with plain numpy following the reference recipe
    from tpu3dssf.geometry import (multi_camera_projector,
                                   scale_pixel_coords,
                                   pixel_to_patch_index)
    pix, _, val = multi_camera_projector(xyz, K, Rt, cfg.raw_image_size)
    pix = scale_pixel_coords(pix, cfg.raw_image_size, cfg.encoder_size)
    idx = np.asarray(pixel_to_patch_index(
        pix, cfg.patch_size, *cfg.grid_hw))
    val = np.asarray(val)
    t = np.asarray(tokens)
    want = np.zeros((B, V, D))
    for b in range(B):
        for v in range(V):
            acc, cnt = np.zeros(D), 0
            for c in range(n_cam):
                if val[b, c, v]:
                    acc += t[b, c, idx[b, c, v]]
                    cnt += 1
            want[b, v] = acc / max(cnt, 1)
    np.testing.assert_allclose(np.asarray(fused), want, atol=1e-4)


def test_fusion_head_shapes(rng):
    B, V, n_cam, M = 2, 16, 6, 2840
    cfg = FusionConfig()
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, 384)), jnp.float32)
    vfeat = jnp.asarray(rng.normal(size=(B, V, 64)), jnp.float32)
    vraw = jnp.asarray(rng.normal(size=(B, V, 4)) * 10, jnp.float32)
    vmask = jnp.ones((B, V), bool)
    K, Rt = _calib(rng, B)

    model = FeatureFusionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), tokens, vfeat, vraw, vmask,
                        K, Rt)
    out = model.apply(params, tokens, vfeat, vraw, vmask, K, Rt)
    assert out.shape == (B, V, 16)
    assert np.isfinite(np.asarray(out)).all()


def _tiny_pipeline():
    return PipelineConfig(
        fusion=FusionConfig(point_feat_dim=8, patch_tok_dim=12),
        ptv3=PTv3Config(
            orders=("z",), enc_depths=(1, 1), enc_channels=(8, 8),
            enc_heads=(1, 1), enc_window=(16, 16),
            dec_depths=(1,), dec_channels=(8,), dec_heads=(1,),
            dec_window=(16,), use_pallas=False),
        voxel_size=0.5,
        voxel_capacity=64,
        devoxelize_mode="own",
    )


def test_pipeline_end_to_end(rng):
    B, P, n_cam, M = 1, 128, 6, 2840
    cfg = _tiny_pipeline()
    pts = jnp.asarray(
        np.concatenate([rng.normal(size=(B, P, 3)) * 5,
                        rng.random((B, P, 1))], -1), jnp.float32)
    pmask = jnp.ones((B, P), bool)
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, 12)), jnp.float32)
    K, Rt = _calib(rng, B)

    model = SegmentationPipeline(cfg)
    params = model.init(jax.random.PRNGKey(0), pts, pmask, tokens, K, Rt)
    logits = model.apply(params, pts, pmask, tokens, K, Rt)
    assert logits.shape == (B, P, 16)
    assert np.isfinite(np.asarray(logits)).all()


def test_dinov2_branch_fusion_works(rng):
    """Reference parity divergence (b): the reference's dinov2 fusion
    path crashes (uses resize_height/width attributes only the dinov3
    branch sets, camera.py:33-34 vs fusion_model.py:167); this framework
    supports the dinov2 geometry (patch 14, 224x224, 16x16 grid)."""
    B, V, n_cam = 1, 16, 6
    cfg = FusionConfig(patch_tok_dim=8, patch_size=14,
                       encoder_size=(224, 224))
    assert cfg.grid_hw == (16, 16)
    M = 16 * 16
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, 8)), jnp.float32)
    vfeat = jnp.asarray(rng.normal(size=(B, V, 64)), jnp.float32)
    vraw = jnp.asarray(rng.normal(size=(B, V, 4)) * 10, jnp.float32)
    vmask = jnp.ones((B, V), bool)
    K, Rt = _calib(rng, B)
    model = FeatureFusionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), tokens, vfeat, vraw,
                        vmask, K, Rt)
    out = model.apply(params, tokens, vfeat, vraw, vmask, K, Rt)
    assert out.shape == (B, V, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_nearest_devoxelize_mode(rng):
    """Reference-parity devoxelization (1-NN, utils/lidar.py:147-150)
    through the full pipeline."""
    import dataclasses
    cfg = dataclasses.replace(_tiny_pipeline(), devoxelize_mode="nearest",
                              intensity_mode="knn5")
    B, P, n_cam, M = 1, 128, 6, 2840
    pts = jnp.asarray(
        np.concatenate([rng.normal(size=(B, P, 3)) * 5,
                        rng.random((B, P, 1))], -1), jnp.float32)
    pmask = jnp.ones((B, P), bool)
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, 12)), jnp.float32)
    K, Rt = _calib(rng, B)
    model = SegmentationPipeline(cfg)
    params = model.init(jax.random.PRNGKey(0), pts, pmask, tokens, K, Rt)
    logits = model.apply(params, pts, pmask, tokens, K, Rt)
    assert logits.shape == (B, P, 16)
    assert np.isfinite(np.asarray(logits)).all()


def test_pipeline_trains(rng):
    B, P, n_cam, M = 1, 64, 6, 2840
    cfg = _tiny_pipeline()
    pts = jnp.asarray(
        np.concatenate([rng.normal(size=(B, P, 3)) * 5,
                        rng.random((B, P, 1))], -1), jnp.float32)
    pmask = jnp.ones((B, P), bool)
    tokens = jnp.asarray(rng.normal(size=(B, n_cam, M, 12)), jnp.float32)
    K, Rt = _calib(rng, B)
    labels = jnp.asarray(rng.integers(1, 17, size=(B, P)))

    model = SegmentationPipeline(cfg)
    params = model.init(jax.random.PRNGKey(0), pts, pmask, tokens, K, Rt)

    from tpu3dssf.losses import CELSLoss
    loss_fn = CELSLoss(weight=np.ones(16, np.float32))

    def loss(p):
        logits = model.apply(p, pts, pmask, tokens, K, Rt)
        return loss_fn(logits, labels, pmask).total

    l0 = float(loss(params))
    grads = jax.grad(loss)(params)
    # one SGD step must reduce the loss
    params2 = jax.tree.map(lambda p, g: p - 0.05 * g, params, grads)
    l1 = float(loss(params2))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0
