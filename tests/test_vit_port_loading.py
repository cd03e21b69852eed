"""Weight-LOADING path tests for the HF port (VERDICT r2 missing #1).

The port *mapping* is proven against real HF compute in
test_vit_port_hf.py; these tests cover the production file-loading path
that had zero executions: ``_find_local_checkpoint`` (explicit env var,
weights dir, HF cache layout) and ``_load_state_dict`` (safetensors AND
torch pickle branches), ending in ``try_load_pretrained`` → a real
forward. A key-layout or dtype surprise on disk now fails here instead
of in production.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3dssf.models.vit import ViTConfig, VisionTransformer
from tpu3dssf.models.vit_port import (
    _find_local_checkpoint,
    _load_state_dict,
    try_load_pretrained,
)


def _tiny_cfg(**kw):
    base = dict(patch_size=4, image_size=(8, 8), hidden_size=8,
                num_layers=2, num_heads=2, num_register_tokens=0,
                layerscale_init=1e-5, use_rope=False)
    base.update(kw)
    return ViTConfig(**base)


def _hf_dinov2_state_dict(cfg, rng, dtype=np.float32):
    """Random state dict in the exact HF Dinov2Model key layout."""
    C = cfg.hidden_size
    hid = int(C * cfg.mlp_ratio)
    n_tok = 1 + cfg.num_patches

    def r(*shape):
        return rng.normal(size=shape).astype(dtype) * 0.1

    sd = {
        "embeddings.patch_embeddings.projection.weight":
            r(C, 3, cfg.patch_size, cfg.patch_size),  # OIHW
        "embeddings.patch_embeddings.projection.bias": r(C),
        "embeddings.cls_token": r(1, 1, C),
        "embeddings.position_embeddings": r(1, n_tok, C),
        "layernorm.weight": r(C),
        "layernorm.bias": r(C),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        sd.update({
            p + "norm1.weight": r(C), p + "norm1.bias": r(C),
            p + "norm2.weight": r(C), p + "norm2.bias": r(C),
            p + "attention.attention.query.weight": r(C, C),
            p + "attention.attention.query.bias": r(C),
            p + "attention.attention.key.weight": r(C, C),
            p + "attention.attention.key.bias": r(C),
            p + "attention.attention.value.weight": r(C, C),
            p + "attention.attention.value.bias": r(C),
            p + "attention.output.dense.weight": r(C, C),
            p + "attention.output.dense.bias": r(C),
            p + "layer_scale1.lambda1": r(C),
            p + "layer_scale2.lambda1": r(C),
            p + "mlp.fc1.weight": r(hid, C), p + "mlp.fc1.bias": r(hid),
            p + "mlp.fc2.weight": r(C, hid), p + "mlp.fc2.bias": r(C),
        })
    return sd


def _save_safetensors(sd, path):
    from safetensors.numpy import save_file
    save_file(sd, path)


def _save_torch(sd, path):
    import torch
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


def _forward(cfg, params):
    vit = VisionTransformer(cfg)
    x = jnp.asarray(np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32)
                    .reshape(1, 8, 8, 3))
    return np.asarray(vit.apply(params, x)["patch_features"])


@pytest.mark.parametrize("fmt", ["safetensors", "torch"])
def test_load_roundtrip_both_formats(tmp_path, rng, monkeypatch, fmt):
    """try_load_pretrained from a real on-disk file (both branches of
    _load_state_dict) must produce loadable params whose forward equals
    the in-memory port of the same state dict."""
    cfg = _tiny_cfg()
    sd = _hf_dinov2_state_dict(cfg, rng)
    path = tmp_path / ("m.safetensors" if fmt == "safetensors" else "m.bin")
    (_save_safetensors if fmt == "safetensors" else _save_torch)(
        sd, str(path))

    monkeypatch.setenv("TPU3DSSF_VIT_CHECKPOINT", str(path))
    vit = VisionTransformer(cfg)
    params = try_load_pretrained("dinov2", vit, cfg)
    assert params is not None

    from tpu3dssf.models.vit_port import port_hf_state_dict
    want = port_hf_state_dict(sd, cfg)
    jax.tree.map(np.testing.assert_allclose, params, want)

    out = _forward(cfg, params)
    assert np.all(np.isfinite(out)) and out.shape == (1, 4, 8)


def test_load_fp16_checkpoint(tmp_path, rng, monkeypatch):
    """Half-precision on-disk weights (common for distributed HF dumps)
    must load and run — the dtype flows through the port unchanged and
    flax promotes at apply time."""
    cfg = _tiny_cfg()
    sd = _hf_dinov2_state_dict(cfg, rng, dtype=np.float16)
    path = tmp_path / "m.safetensors"
    _save_safetensors(sd, path)
    monkeypatch.setenv("TPU3DSSF_VIT_CHECKPOINT", str(path))
    params = try_load_pretrained("dinov2", VisionTransformer(cfg), cfg)
    assert params is not None
    out = _forward(cfg, jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), params))
    assert np.all(np.isfinite(out))


def test_find_checkpoint_precedence(tmp_path, monkeypatch):
    """Discovery order: explicit env var > weights dir > HF cache."""
    monkeypatch.delenv("TPU3DSSF_VIT_CHECKPOINT", raising=False)
    # weights-dir discovery
    wdir = tmp_path / "weights"
    wdir.mkdir()
    wfile = wdir / "dinov2.safetensors"
    wfile.write_bytes(b"x")
    monkeypatch.setenv("TPU3DSSF_WEIGHTS", str(wdir))
    assert _find_local_checkpoint("dinov2") == str(wfile)

    # explicit env var wins over weights dir
    efile = tmp_path / "explicit.safetensors"
    efile.write_bytes(b"x")
    monkeypatch.setenv("TPU3DSSF_VIT_CHECKPOINT", str(efile))
    assert _find_local_checkpoint("dinov2") == str(efile)

    # HF cache layout (snapshots/<hash>/model.safetensors)
    monkeypatch.delenv("TPU3DSSF_VIT_CHECKPOINT", raising=False)
    monkeypatch.setenv("TPU3DSSF_WEIGHTS", str(tmp_path / "nope"))
    hf = (tmp_path / "hf" / "hub" / "models--facebook--dinov2-small"
          / "snapshots" / "abc123")
    hf.mkdir(parents=True)
    cfile = hf / "model.safetensors"
    cfile.write_bytes(b"x")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    assert _find_local_checkpoint("dinov2") == str(cfile)

    # nothing anywhere -> None (random-init fallback path)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty"))
    assert _find_local_checkpoint("dinov2") is None


def test_load_state_dict_rejects_garbage(tmp_path):
    """A corrupt file must raise loudly, not return a half-parsed tree."""
    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"not a safetensors file")
    with pytest.raises(Exception):
        _load_state_dict(str(bad))
