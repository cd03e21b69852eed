"""ViT tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.models.vit import (
    ViTConfig,
    VisionTransformer,
    dinov2_small,
    dinov3_small,
    preprocess_images,
)


def tiny(**kw):
    base = dict(patch_size=8, image_size=(32, 48), hidden_size=16,
                num_layers=2, num_heads=2)
    base.update(kw)
    return ViTConfig(**base)


def test_preset_geometry():
    v2 = dinov2_small()
    assert v2.grid_size == (16, 16) and v2.num_patches == 256
    v3 = dinov3_small()
    # reference fusion_model.py:172-174: 640/16=40, 1138/16=71, 2840 total
    assert v3.grid_size == (40, 71) and v3.num_patches == 2840
    assert v3.num_register_tokens == 4


def test_forward_shapes(rng):
    cfg = tiny()
    vit = VisionTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out["patch_features"].shape == (2, 4 * 6, 16)
    assert out["global_features"].shape == (2, 16)


def test_register_tokens_layout(rng):
    cfg = tiny(num_register_tokens=4)
    vit = VisionTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    # registers excluded from patch features
    assert out["patch_features"].shape == (1, 24, 16)

    # reference-compat slice [1:-4] keeps registers + drops 4 patches
    # (camera.py:57-58 quirk) — same COUNT, different content
    compat = VisionTransformer(cfg, register_slice_compat=True)
    out_c = compat.apply(params, x)
    assert out_c["patch_features"].shape == (1, 24, 16)
    assert not np.allclose(np.asarray(out["patch_features"]),
                           np.asarray(out_c["patch_features"]))


def test_rope_changes_attention(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    cfg_r = tiny(use_rope=True, num_register_tokens=2)
    cfg_n = tiny(use_rope=False, num_register_tokens=2)
    vit_r = VisionTransformer(cfg_r)
    vit_n = VisionTransformer(cfg_n)
    pr = vit_r.init(jax.random.PRNGKey(0), x)
    out = vit_r.apply(pr, x)
    assert np.isfinite(np.asarray(out["patch_features"])).all()
    # rope config has no pos_embed param; abs-pos config does
    names = jax.tree_util.tree_leaves_with_path(pr)
    keys = {"/".join(str(p) for p in path) for path, _ in names}
    assert not any("pos_embed" in k for k in keys)
    pn = vit_n.init(jax.random.PRNGKey(0), x)
    names_n = jax.tree_util.tree_leaves_with_path(pn)
    keys_n = {"/".join(str(p) for p in path) for path, _ in names_n}
    assert any("pos_embed" in k for k in keys_n)


def test_flash_path_matches_einsum_on_cpu_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu
    cfg_f = tiny(use_flash=True, num_heads=2, hidden_size=16)
    cfg_e = tiny(use_flash=False, num_heads=2, hidden_size=16)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    vit_e = VisionTransformer(cfg_e)
    params = vit_e.init(jax.random.PRNGKey(0), x)
    out_e = vit_e.apply(params, x)
    vit_f = VisionTransformer(cfg_f)
    with pltpu.force_tpu_interpret_mode():
        out_f = vit_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_e["patch_features"]),
        np.asarray(out_f["patch_features"]), atol=2e-3)


def test_preprocess_images(rng):
    imgs = rng.integers(0, 255, (2, 3, 90, 160, 3), dtype=np.uint8)
    out = preprocess_images(imgs, (45, 80))
    assert out.shape == (2, 3, 45, 80, 3)
    out_np = np.asarray(out)
    # ImageNet normalization keeps values in a sane range
    assert -3 < out_np.min() and out_np.max() < 3


def test_weight_port_roundtrip(rng):
    # fabricate an HF-style state dict for the tiny config and port it
    from tpu3dssf.models.vit_port import port_hf_state_dict
    cfg = tiny(num_register_tokens=0, layerscale_init=1e-5)
    C, L = cfg.hidden_size, cfg.num_layers
    M = cfg.num_patches

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd = {
        "embeddings.patch_embeddings.projection.weight": t(C, 3, 8, 8),
        "embeddings.patch_embeddings.projection.bias": t(C),
        "embeddings.cls_token": t(1, 1, C),
        "embeddings.position_embeddings": t(1, M + 1, C),
        "layernorm.weight": t(C), "layernorm.bias": t(C),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        sd.update({
            p + "norm1.weight": t(C), p + "norm1.bias": t(C),
            p + "norm2.weight": t(C), p + "norm2.bias": t(C),
            p + "attention.attention.query.weight": t(C, C),
            p + "attention.attention.query.bias": t(C),
            p + "attention.attention.key.weight": t(C, C),
            p + "attention.attention.key.bias": t(C),
            p + "attention.attention.value.weight": t(C, C),
            p + "attention.attention.value.bias": t(C),
            p + "attention.output.dense.weight": t(C, C),
            p + "attention.output.dense.bias": t(C),
            p + "layer_scale1.lambda1": t(C),
            p + "layer_scale2.lambda1": t(C),
            p + "mlp.fc1.weight": t(4 * C, C), p + "mlp.fc1.bias": t(4 * C),
            p + "mlp.fc2.weight": t(C, 4 * C), p + "mlp.fc2.bias": t(C),
        })

    params = port_hf_state_dict(sd, cfg)
    vit = VisionTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    # structure must match what init produces
    ref_params = vit.init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes
    out = vit.apply(params, x)
    assert np.isfinite(np.asarray(out["patch_features"])).all()


def test_quantize_vit_matches_float(rng):
    """W8A8 path tracks the float forward within int8 tolerance, for
    both unrolled and scan-layers param trees."""
    from tpu3dssf.models.vit import quantize_vit

    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    for scan in (False, True):
        # layerscale 1.0: the default 1e-5 init suppresses block outputs
        # at random init, which would hide any quantization defect
        cfg = tiny(use_rope=True, scan_layers=scan, layerscale_init=1.0)
        vit = VisionTransformer(cfg)
        params = vit.init(jax.random.PRNGKey(0), x)
        ref = vit.apply(params, x)["patch_features"]

        qparams, qcfg = quantize_vit(params, cfg)
        assert qcfg.quant_int8 and qcfg.layerscale_init is None
        leaves = jax.tree.leaves(qparams)
        assert any(l.dtype == jnp.int8 for l in leaves)
        out = VisionTransformer(qcfg).apply(qparams, x)["patch_features"]
        err = float(jnp.abs(out - ref).max())
        denom = float(jnp.abs(ref).max())
        # int8 is approximate — the error must be small but NONZERO
        # (zero would mean the quantized path silently isn't running)
        assert 0.0 < err < 0.05 * max(denom, 1.0), (scan, err, denom)


def test_quantize_vit_int8_grid_is_used(rng):
    """The quantized kernel really is int8 round(W/scale)."""
    from tpu3dssf.models.vit import quantize_vit, fold_layerscale

    cfg = tiny()
    vit = VisionTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    fparams, _ = fold_layerscale(params, cfg)
    qparams, _ = quantize_vit(params, cfg)
    w = np.asarray(fparams["params"]["block0"]["qkv"]["kernel"])
    q = qparams["params"]["block0"]["qkv"]
    rec = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["scale"])
    assert np.abs(rec - w).max() <= (np.abs(w).max(0) / 127.0 + 1e-9).max()


def test_preprocess_matmul_matches_jax_image_resize():
    """The MXU matmul resize must reproduce jax.image.resize exactly
    (f32): the weight matrices are built by resizing the identity."""
    from tpu3dssf.models.vit import (preprocess_images, IMAGENET_MEAN,
                                     IMAGENET_STD)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 37, 53, 3)), jnp.float32)
    got = preprocess_images(imgs, (20, 31), jnp.float32)
    want = jax.image.resize(imgs, (2, 20, 31, 3), method="bilinear")
    want = (want - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # uint8 path + upsampling direction
    imgs8 = (np.asarray(imgs[..., :]) * 255).astype(np.uint8)
    got8 = preprocess_images(jnp.asarray(imgs8), (41, 60), jnp.float32)
    want8 = jax.image.resize(jnp.asarray(imgs8, jnp.float32) / 255.0,
                             (2, 41, 60, 3), method="bilinear")
    want8 = (want8 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
        IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                               atol=1e-5, rtol=1e-5)


def test_dinov3_large_preset_forward():
    """ViT-L preset (BASELINE config 5) runs end-to-end; image size
    reduced for CPU (the on-chip measurement is blocked by the remote
    compile service — see PERF.md)."""
    import dataclasses
    from tpu3dssf.models.vit import (VisionTransformer, dinov3_large,
                                     fold_layerscale)

    cfg = dataclasses.replace(dinov3_large(), image_size=(32, 32),
                              num_layers=2)
    assert cfg.hidden_size == 1024 and cfg.num_heads == 16
    assert cfg.use_rope and cfg.num_register_tokens == 4
    vit = VisionTransformer(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), imgs)
    params, cfg2 = fold_layerscale(params, cfg)
    out = VisionTransformer(cfg2).apply(params, imgs)
    assert out["patch_features"].shape == (1, 4, 1024)
    assert np.isfinite(np.asarray(out["patch_features"])).all()


def test_patch_embed_matmul_matches_conv(rng):
    """embed_matmul patchifier must be the EXACT same linear map as the
    VALID strided conv, sharing one param tree (checkpoints and the HF
    port are layout-identical). Image width 50 also exercises the
    crop-the-remainder contract (50 = 6*8 + 2 px dropped)."""
    cfg_mm = tiny(image_size=(32, 50), embed_matmul=True)
    cfg_cv = tiny(image_size=(32, 50), embed_matmul=False)
    x = jnp.asarray(rng.normal(size=(2, 32, 50, 3)), jnp.float32)

    vit_mm = VisionTransformer(cfg_mm)
    params = vit_mm.init(jax.random.PRNGKey(0), x)
    pe = params["params"]["patch_embed"]
    assert pe["kernel"].shape == (8, 8, 3, cfg_mm.hidden_size)

    out_mm = vit_mm.apply(params, x)
    out_cv = VisionTransformer(cfg_cv).apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_mm["patch_features"]),
        np.asarray(out_cv["patch_features"]), atol=2e-5, rtol=2e-5)


def test_looped_encode_matches_one_program(rng):
    """make_looped_encode (per-layer dispatch — the ViT-L route around
    the remote AOT compiler limit) must reproduce the one-jit scan
    encode to fusion-reassociation noise (same submodules and op order;
    measured max |Δ| ≈ 4e-7 in f32 — program-boundary fusion differs).
    Covers rope + registers and the pos-embed variant."""
    from tpu3dssf.models.vit import make_looped_encode

    for kw in (dict(use_rope=True, num_register_tokens=2),
               dict(use_rope=False)):
        cfg = tiny(num_layers=3, scan_layers=True, **kw)
        vit = VisionTransformer(cfg)
        x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
        params = vit.init(jax.random.PRNGKey(0), x)
        ref = vit.apply(params, x)["patch_features"]
        enc = make_looped_encode(cfg, params, donate=False)
        np.testing.assert_allclose(np.asarray(enc(x)), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_image_encode_fn_looped_matches_one_jit(rng):
    """cli/common.py's vit_looped route: make_image_encode_fn(looped=
    True) must match the one-jit encode fn (preprocess + reshape
    included) on the frozen-ViT contract."""
    from tpu3dssf.train.loop import make_image_encode_fn

    cfg = tiny(num_layers=2, scan_layers=True, use_rope=True,
               num_register_tokens=1)
    vit = VisionTransformer(cfg)
    imgs = (rng.random((1, 2, 24, 40, 3)) * 255).astype(np.uint8)
    imgs = jnp.asarray(imgs)
    params = vit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + cfg.image_size + (3,), jnp.float32))
    one = make_image_encode_fn(vit, params, cfg.image_size)
    loop = make_image_encode_fn(vit, params, cfg.image_size, looped=True)
    np.testing.assert_allclose(np.asarray(loop(imgs)),
                               np.asarray(one(imgs)),
                               atol=1e-5, rtol=1e-5)


def test_looped_encode_donation_reusable(rng):
    """donate=True (the production default) donates the token carry
    between block dispatches; repeated calls on the same input buffers
    must keep working and agree with themselves (a donation bug would
    corrupt the second call's inputs)."""
    from tpu3dssf.models.vit import make_looped_encode

    cfg = tiny(num_layers=2, scan_layers=True)
    vit = VisionTransformer(cfg)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    enc = make_looped_encode(cfg, params)
    first = np.asarray(enc(x))
    second = np.asarray(enc(x))
    np.testing.assert_array_equal(first, second)


def test_many_head_flash_routes_to_head_groups(rng):
    """H=16 with 128-aligned group widths must take the packed
    head-group route (zero transposes) and match the einsum path.
    Geometry picks hg=8 -> G=2, group width C/2=128."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    cfg_e = tiny(use_flash=False, num_heads=16, hidden_size=256,
                 use_rope=True)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    vit_e = VisionTransformer(cfg_e)
    params = vit_e.init(jax.random.PRNGKey(0), x)
    out_e = vit_e.apply(params, x)

    for phg in (True, False):  # head-group packed AND transposing kernel
        cfg_f = dataclasses.replace(cfg_e, use_flash=True,
                                    packed_head_groups=phg)
        with pltpu.force_tpu_interpret_mode():
            out_f = VisionTransformer(cfg_f).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out_e["patch_features"]),
            np.asarray(out_f["patch_features"]), atol=2e-3,
            err_msg=f"packed_head_groups={phg}")
