"""HF → flax ViT port parity against the REAL transformers modeling code.

The image has no pretrained checkpoints (zero egress), but it ships
transformers 4.57 + torch-cpu, so we can verify the two things the port
must get right — the *naming* and the *compute* — by building tiny
random-weight Dinov2Model / DINOv3ViTModel instances, porting their
state dicts through tpu3dssf.models.vit_port, and demanding patch-token
forward parity (SURVEY.md §7.4: "port weights, verify patch-token
parity <= 1e-3"). Reference load site: utils/camera.py:42.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpu3dssf.models.vit import ViTConfig, VisionTransformer
from tpu3dssf.models.vit_port import port_hf_state_dict


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.eval()
    return model


def _run_ours(vit_cfg, sd, pixels_nchw):
    vit = VisionTransformer(vit_cfg)
    params = port_hf_state_dict(sd, vit_cfg)
    x = np.transpose(pixels_nchw, (0, 2, 3, 1))  # NCHW -> NHWC
    return np.asarray(vit.apply(params, x)["patch_features"])


def test_dinov2_forward_parity():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=4, image_size=28, patch_size=14,
        layerscale_value=0.8)
    hf = _randomize(Dinov2Model(hf_cfg))

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    hf_patches = hf_out[:, 1:]  # drop CLS

    cfg = ViTConfig(patch_size=14, image_size=(28, 28), hidden_size=32,
                    num_layers=2, num_heads=4, mlp_ratio=4.0,
                    num_register_tokens=0, use_rope=False)
    ours = _run_ours(cfg, hf.state_dict(), px)
    assert ours.shape == hf_patches.shape
    np.testing.assert_allclose(ours, hf_patches, atol=1e-4, rtol=1e-4)


def test_dinov3_forward_parity():
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=4, layerscale_value=0.8, rope_theta=100.0)
    hf = _randomize(DINOv3ViTModel(hf_cfg))
    # DINOv3 ships key_bias=False: the port must tolerate the missing
    # k_proj.bias key (zeros), not KeyError
    assert "layer.0.attention.k_proj.bias" not in hf.state_dict()

    rng = np.random.default_rng(1)
    # non-square input: exercises the axial RoPE y/x split (grid 2x3)
    px = rng.normal(size=(2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    hf_patches = hf_out[:, 1 + 4:]  # drop CLS + 4 registers

    cfg = ViTConfig(patch_size=16, image_size=(32, 48), hidden_size=32,
                    num_layers=2, num_heads=4, mlp_ratio=4.0,
                    num_register_tokens=4, use_rope=True, ln_eps=1e-5,
                    rope_theta=100.0)
    ours = _run_ours(cfg, hf.state_dict(), px)
    assert ours.shape == hf_patches.shape
    np.testing.assert_allclose(ours, hf_patches, atol=1e-4, rtol=1e-4)


def test_dinov3_scan_layers_forward_parity():
    """scan_layers=True (one lax.scan over stacked block params) must be
    numerically identical to the unrolled path and to HF."""
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=4, layerscale_value=0.8)
    hf = _randomize(DINOv3ViTModel(hf_cfg), seed=5)

    rng = np.random.default_rng(5)
    px = rng.normal(size=(1, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        hf_patches = hf(
            torch.from_numpy(px)).last_hidden_state.numpy()[:, 5:]

    cfg = ViTConfig(patch_size=16, image_size=(32, 48), hidden_size=32,
                    num_layers=3, num_heads=4, mlp_ratio=4.0,
                    num_register_tokens=4, use_rope=True, ln_eps=1e-5,
                    scan_layers=True)
    ours = _run_ours(cfg, hf.state_dict(), px)
    np.testing.assert_allclose(ours, hf_patches, atol=1e-4, rtol=1e-4)


def test_fold_layerscale_is_exact():
    """Inference-time LayerScale folding must not change the output."""
    import jax
    from tpu3dssf.models.vit import fold_layerscale

    for scan in (False, True):
        cfg = ViTConfig(patch_size=16, image_size=(32, 48),
                        hidden_size=32, num_layers=2, num_heads=4,
                        num_register_tokens=4, use_rope=True,
                        layerscale_init=0.7, scan_layers=scan)
        vit = VisionTransformer(cfg)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 32, 48, 3)).astype(np.float32)
        params = vit.init(jax.random.PRNGKey(1), x)
        # make gammas non-trivial
        params = jax.tree.map(
            lambda a: a + 0.3 * (np.arange(a.size) % 7 / 7.0)
            .reshape(a.shape).astype(a.dtype), params)
        want = np.asarray(vit.apply(params, x)["patch_features"])

        fparams, fcfg = fold_layerscale(params, cfg)
        assert fcfg.layerscale_init is None
        got = np.asarray(
            VisionTransformer(fcfg).apply(fparams, x)["patch_features"])
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dinov3_register_slice_compat_matches_reference_slice():
    """register_slice_compat reproduces the reference feats[1:-4]
    (camera.py:57-58) on the HF token layout."""
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    hf_cfg = DINOv3ViTConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=4, layerscale_value=0.8)
    hf = _randomize(DINOv3ViTModel(hf_cfg), seed=2)

    rng = np.random.default_rng(2)
    px = rng.normal(size=(1, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(px)).last_hidden_state.numpy()

    cfg = ViTConfig(patch_size=16, image_size=(32, 48), hidden_size=32,
                    num_layers=1, num_heads=4, mlp_ratio=4.0,
                    num_register_tokens=4, use_rope=True, ln_eps=1e-5)
    vit = VisionTransformer(cfg, register_slice_compat=True)
    params = port_hf_state_dict(hf.state_dict(), cfg)
    x = np.transpose(px, (0, 2, 3, 1))
    ours = np.asarray(vit.apply(params, x)["patch_features"])
    np.testing.assert_allclose(ours, hf_out[:, 1:-4], atol=1e-4,
                               rtol=1e-4)
