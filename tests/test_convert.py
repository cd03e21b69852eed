"""Checkpoint layout conversion: unrolled ↔ scan_blocks / scan_layers.

scan_blocks is the designated escape hatch for AOT program-size limits
(config.py tpu_params); checkpoints written unrolled must survive the
flip. These tests assert the conversion is EXACT (identical logits) and
roundtrips to bit-identical trees, including through the Orbax
save/convert/restore path the CLI script uses."""

import dataclasses
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tpu3dssf.models.ptv3 import PTv3Config, PointTransformerV3
from tpu3dssf.train.convert import convert_tree


def _cfg(scan_blocks, **kw):
    return PTv3Config(
        orders=("z", "z-trans"),
        enc_depths=(2, 3), enc_channels=(8, 16), enc_heads=(1, 2),
        enc_window=(16, 16),
        dec_depths=(2,), dec_channels=(8,), dec_heads=(1,),
        dec_window=(16,), use_pallas=False, scan_blocks=scan_blocks,
        **kw)


def _inputs(seed=0, B=1, N=64):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.normal(size=(B, N, 4)), jnp.float32)
    # distinct cells (unique_cells contract)
    cells = rng.choice(16 ** 3, size=(B, N), replace=False)
    grid = jnp.asarray(
        np.stack([cells // 256, (cells // 16) % 16, cells % 16], -1),
        jnp.int32)
    mask = jnp.ones((B, N), bool)
    return feat, grid, mask


def test_unrolled_to_scan_identical_logits():
    feat, grid, mask = _inputs()
    un = PointTransformerV3(_cfg(False))
    params = un.init(jax.random.PRNGKey(0), feat, grid, mask)
    want, _ = un.apply(params, feat, grid, mask)

    sc_params = convert_tree(jax.tree.map(np.asarray, params),
                             to_scan=True)
    sc = PointTransformerV3(_cfg(True))
    # structure must match a fresh scan init exactly
    ref = sc.init(jax.random.PRNGKey(1), feat, grid, mask)
    assert (jax.tree.structure(jax.tree.map(np.asarray, ref))
            == jax.tree.structure(sc_params))
    got, _ = sc.apply(sc_params, feat, grid, mask)
    # same math; XLA reassociates fusions under scan (few-ULP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_scan_to_unrolled_identical_logits():
    feat, grid, mask = _inputs(seed=3)
    sc = PointTransformerV3(_cfg(True))
    params = sc.init(jax.random.PRNGKey(0), feat, grid, mask)
    want, _ = sc.apply(params, feat, grid, mask)

    un_params = convert_tree(jax.tree.map(np.asarray, params),
                             to_scan=False)
    un = PointTransformerV3(_cfg(False))
    got, _ = un.apply(un_params, feat, grid, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_roundtrip_bit_identical():
    feat, grid, mask = _inputs(seed=5)
    un = PointTransformerV3(_cfg(False))
    params = jax.tree.map(np.asarray,
                          un.init(jax.random.PRNGKey(2), feat, grid, mask))
    back = convert_tree(convert_tree(params, True), False)
    assert jax.tree.structure(params) == jax.tree.structure(back)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(a, b)


def test_vit_layers_convert():
    from tpu3dssf.models.vit import ViTConfig, VisionTransformer

    kw = dict(patch_size=8, image_size=(16, 24), hidden_size=16,
              num_layers=3, num_heads=2, num_register_tokens=0,
              use_rope=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 24, 3)),
                    jnp.float32)
    un = VisionTransformer(ViTConfig(**kw))
    params = jax.tree.map(np.asarray, un.init(jax.random.PRNGKey(0), x))
    want = un.apply(params, x)["patch_features"]

    sc_params = convert_tree(params, to_scan=True)
    sc = VisionTransformer(ViTConfig(scan_layers=True, **kw))
    got = sc.apply(sc_params, x)["patch_features"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    back = convert_tree(sc_params, to_scan=False)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(a, b)


def test_optimizer_state_converts_too():
    """Optimizer moments mirror the param tree; convert_tree must reach
    them through the optax chain's tuples/namedtuples."""
    feat, grid, mask = _inputs(seed=7)
    un = PointTransformerV3(_cfg(False))
    params = un.init(jax.random.PRNGKey(0), feat, grid, mask)
    opt_state = optax.adamw(1e-3).init(params)
    raw = jax.tree.map(np.asarray, opt_state)
    conv = convert_tree(raw, to_scan=True)
    # mu must now hold the stacked layout
    mu = conv[0].mu if hasattr(conv[0], "mu") else conv[0][0]
    stacked = mu["params"]["enc1_scan"]["mlp_in"]["kernel"]
    assert np.asarray(stacked).shape[0] == 3
    back = convert_tree(conv, to_scan=False)
    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(back)):
        np.testing.assert_array_equal(a, b)


def test_cli_converter_roundtrip(tmp_path):
    """End-to-end: save an unrolled checkpoint with Orbax, run the
    converter script, restore under a scan_blocks model and check the
    logits match the unrolled model's."""
    from tpu3dssf.train import create_train_state
    from tpu3dssf.train.checkpoint import restore_checkpoint, \
        save_checkpoint

    feat, grid, mask = _inputs(seed=9)
    un = PointTransformerV3(_cfg(False))
    params = un.init(jax.random.PRNGKey(0), feat, grid, mask)
    want, _ = un.apply(params, feat, grid, mask)
    state = create_train_state(un, params, optax.adamw(1e-3))
    src, dst = str(tmp_path / "unrolled"), str(tmp_path / "scanned")
    save_checkpoint(src, 5, state, {"best_acc": 0.5, "epoch": 2})

    out = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py",
         "--in", src, "--out", dst, "--to", "scan"],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""})
    assert out.returncode == 0, out.stderr[-2000:]

    sc = PointTransformerV3(_cfg(True))
    sc_params = sc.init(jax.random.PRNGKey(1), feat, grid, mask)
    sc_state = create_train_state(sc, sc_params, optax.adamw(1e-3))
    restored, extra, step = restore_checkpoint(dst, None, sc_state)
    assert step == 5 and extra["best_acc"] == 0.5
    got, _ = sc.apply(restored.params, feat, grid, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
