"""Full-scale-shaped pretrained-weight dry-fit (VERDICT r3 task 6).

The loading-path tests in test_vit_port_loading.py use toy 8x8/2-layer
models; real nuScenes deployment loads a DINOv3-ViT-S/16 checkpoint with
the REAL tensor shapes and HF key names into the 640x1138 pipeline. This
closes that axis without network egress: instantiate the actual
``transformers.DINOv3ViTModel`` at the real vits16 geometry (random
init — weights are not downloadable here, shapes and key layout are
exact), dump its state dict to disk, load it through the production
discovery path, and run the full 640x1138 fusion pipeline end to end on
CPU. A key-name or tensor-shape surprise at deployment scale fails here.

Reference: utils/camera.py:42 (AutoModel.from_pretrained dinov3-vits16),
camera.py:27-34 (640x1138 processor geometry).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _real_vits16_hf_model():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    if not hasattr(tfm, "DINOv3ViTConfig"):
        pytest.skip("installed transformers has no DINOv3")
    # facebook/dinov3-vits16-pretrain-lvd1689m geometry
    hf_cfg = tfm.DINOv3ViTConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
        intermediate_size=1536, patch_size=16, num_register_tokens=4,
        rope_theta=100.0)
    torch.manual_seed(0)
    return tfm.DINOv3ViTModel(hf_cfg).eval()


def test_fullscale_dinov3_checkpoint_through_pipeline(tmp_path,
                                                      monkeypatch):
    """Real-shaped safetensors checkpoint -> weights-dir discovery ->
    port -> full-resolution ViT encode -> fusion pipeline, all finite."""
    from safetensors.numpy import save_file
    from tpu3dssf.models.vit import VisionTransformer, dinov3_small
    from tpu3dssf.models.vit_port import try_load_pretrained

    model = _real_vits16_hf_model()
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in model.state_dict().items()}

    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_file(sd, str(wdir / "dinov3.safetensors"))
    monkeypatch.delenv("TPU3DSSF_VIT_CHECKPOINT", raising=False)
    monkeypatch.setenv("TPU3DSSF_WEIGHTS", str(wdir))

    cfg = dinov3_small()
    vit = VisionTransformer(cfg)
    params = try_load_pretrained("dinov3", vit, cfg)
    assert params is not None

    # spot-check the port really carried the full-scale tensors
    p = params["params"]
    assert p["patch_embed"]["kernel"].shape == (16, 16, 3, 384)
    assert p["register_tokens"].shape == (1, 4, 384)
    assert p["block11"]["qkv"]["kernel"].shape == (384, 3 * 384)
    np.testing.assert_array_equal(
        np.asarray(p["block7"]["mlp_in"]["kernel"]),
        sd["layer.7.mlp.up_proj.weight"].T)
    # DINOv3 k_proj has no bias: the ported qkv bias k-slice is zero
    np.testing.assert_array_equal(
        np.asarray(p["block0"]["qkv"]["bias"][384:768]), np.zeros(384))

    # full 640x1138 encode: 40x71 = 2840 patch tokens
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 640, 1138, 3)), jnp.float32)
    out = jax.jit(vit.apply)(jax.tree.map(jnp.asarray, params), img)
    tokens = out["patch_features"]
    assert tokens.shape == (1, 2840, 384)
    assert bool(jnp.all(jnp.isfinite(tokens)))

    # full fusion pipeline at deployment token geometry (tokens tiled
    # across the 6 cameras; the gather indexes all 2840 slots)
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config

    P, V, W = 8192, 4096, 256
    pcfg = PipelineConfig(
        fusion=FusionConfig(),
        ptv3=PTv3Config(enc_window=(W,) * 5, dec_window=(W,) * 4,
                        use_pallas=False),
        voxel_size=0.1, voxel_capacity=V)
    pipe = SegmentationPipeline(pcfg)
    points = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, P, 3)) * 20, rng.random((1, P, 1))], -1),
        jnp.float32)
    pmask = jnp.ones((1, P), bool)
    toks6 = jnp.broadcast_to(tokens[:, None], (1, 6, 2840, 384))
    intr = jnp.tile(jnp.asarray(
        [[500.0, 0, 800], [0, 500, 450], [0, 0, 1]], jnp.float32),
        (1, 6, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, 6, 1, 1))

    pparams = jax.jit(pipe.init)(
        jax.random.PRNGKey(0), points, pmask, toks6, intr, extr)
    logits = jax.jit(pipe.apply)(pparams, points, pmask, toks6, intr,
                                 extr)
    assert logits.shape == (1, P, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_fullscale_dinov3_torch_format_loads(tmp_path, monkeypatch):
    """The torch.save branch at real shapes: load + port only (the
    pipeline run above covers compute)."""
    torch = pytest.importorskip("torch")
    from tpu3dssf.models.vit import VisionTransformer, dinov3_small
    from tpu3dssf.models.vit_port import try_load_pretrained

    model = _real_vits16_hf_model()
    path = tmp_path / "dinov3.pth"
    torch.save(model.state_dict(), str(path))
    monkeypatch.setenv("TPU3DSSF_VIT_CHECKPOINT", str(path))

    cfg = dinov3_small()
    params = try_load_pretrained("dinov3", VisionTransformer(cfg), cfg)
    assert params is not None
    assert params["params"]["norm"]["scale"].shape == (384,)
    assert len([k for k in params["params"] if k.startswith("block")]) \
        == 12
