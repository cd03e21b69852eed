"""HF-compute parity for the weight port (SURVEY.md §7.4).

The image has no network egress, but transformers + torch (CPU) are
installed — so we instantiate RANDOM-INIT HF models from config (no
download), port their state dicts with vit_port, and assert forward
parity of the patch tokens against the actual HF modeling code. This is
strictly stronger than the synthetic-state-dict tests in
test_vit_port.py: it pins our ViT compute (incl. RoPE and the register
token layout) to HF's, not to our own oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _port_and_run(hf_model, vit_cfg, np_images):
    from tpu3dssf.models.vit import VisionTransformer
    from tpu3dssf.models.vit_port import port_hf_state_dict

    sd = {k: v.detach().cpu().numpy()
          for k, v in hf_model.state_dict().items()}
    params = port_hf_state_dict(sd, vit_cfg)
    vit = VisionTransformer(vit_cfg)
    out = vit.apply(jax.tree.map(jnp.asarray, params),
                    jnp.asarray(np_images))
    return np.asarray(out["patch_features"], np.float32), \
        np.asarray(out["global_features"], np.float32)


def test_port_matches_hf_dinov2_forward():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from tpu3dssf.models.vit import ViTConfig

    hf_cfg = tfm.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=28, patch_size=14,
        layerscale_value=0.7)
    torch.manual_seed(0)
    model = tfm.Dinov2Model(hf_cfg).eval()

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    cfg = ViTConfig(patch_size=14, image_size=(28, 28), hidden_size=32,
                    num_layers=2, num_heads=2, mlp_ratio=4.0,
                    num_register_tokens=0, layerscale_init=0.7,
                    use_rope=False, ln_eps=hf_cfg.layer_norm_eps)
    patches, glob = _port_and_run(model, cfg, imgs)

    np.testing.assert_allclose(patches, hf_out[:, 1:], atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(glob, hf_out[:, 0], atol=1e-4, rtol=1e-4)


def test_port_matches_hf_dinov3_forward():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    if not hasattr(tfm, "DINOv3ViTConfig"):
        pytest.skip("installed transformers has no DINOv3")
    from tpu3dssf.models.vit import ViTConfig

    hf_cfg = tfm.DINOv3ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=4, rope_theta=100.0, layerscale_value=0.7)
    torch.manual_seed(0)
    model = tfm.DINOv3ViTModel(hf_cfg).eval()

    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    cfg = ViTConfig(patch_size=16, image_size=(32, 32), hidden_size=32,
                    num_layers=2, num_heads=2, mlp_ratio=4.0,
                    num_register_tokens=4, layerscale_init=0.7,
                    use_rope=True, rope_theta=100.0,
                    ln_eps=hf_cfg.layer_norm_eps)
    patches, glob = _port_and_run(model, cfg, imgs)

    # HF layout: [CLS, 4 registers, patches...]
    np.testing.assert_allclose(patches, hf_out[:, 5:], atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(glob, hf_out[:, 0], atol=1e-4, rtol=1e-4)
