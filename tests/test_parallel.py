"""Sharding tests on the 8-virtual-CPU mesh (conftest forces cpu)."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3dssf.parallel import create_mesh, vit_tp_shardings
from tpu3dssf.models.vit import ViTConfig, VisionTransformer


@pytest.mark.parametrize("scan", [False, True])
def test_vit_tensor_parallel_matches_single_device(scan):
    """Megatron-style TP over a 2-way model axis must be numerically
    equivalent to the unsharded forward (GSPMD inserts the
    collectives; we only annotate param shardings)."""
    cfg = ViTConfig(patch_size=16, image_size=(32, 48), hidden_size=32,
                    num_layers=2, num_heads=4, num_register_tokens=4,
                    use_rope=True, scan_layers=scan)
    vit = VisionTransformer(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    want = np.asarray(vit.apply(params, x)["patch_features"])

    mesh = create_mesh((4, 2), ("data", "model"))
    shardings = vit_tp_shardings(params, mesh)
    sharded = jax.device_put(params, shardings)
    # check at least the qkv kernels actually got partitioned
    tree = sharded["params"]
    qkv = (tree["blocks"]["qkv"]["kernel"] if scan
           else tree["block0"]["qkv"]["kernel"])
    assert not qkv.sharding.is_fully_replicated

    with mesh:
        got = np.asarray(jax.jit(vit.apply)(sharded, x)["patch_features"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("scan", [False, True])
def test_vit_tp_flash_path_matches_einsum(scan):
    """TP with use_flash=True (VERDICT r2 missing #2): prepare_tp_params
    permutes qkv columns so a contiguous channel sharding is each
    shard's packed [q_s|k_s|v_s]; the Pallas kernel runs head-parallel
    under shard_map (interpret mode on CPU). Must equal the unsharded
    einsum forward.

    Runs in a SUBPROCESS: jax's TPU-interpret machinery keeps
    process-global shared memory whose per-pallas_call cleanup barrier
    can deadlock a MULTI-device interpret computation when other
    interpret-mode tests ran earlier in the same interpreter (device
    threads stuck in _clean_up_shared_memory → "Fatal Python error:
    Aborted"; same isolation as test_graft_entry_dryrun)."""
    if os.environ.get("TPU3DSSF_INTERPRET_SUBPROC") != "1":
        env = dict(os.environ, TPU3DSSF_INTERPRET_SUBPROC="1")
        env.pop("PYTHONPATH", None)  # breaks axon plugin discovery
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p",
             "no:cacheprovider",
             os.path.abspath(__file__)
             + f"::test_vit_tp_flash_path_matches_einsum[{scan}]"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=root)
        assert r.returncode == 0, \
            f"subprocess failed:\n{r.stdout}\n{r.stderr}"
        return

    from jax.experimental.pallas import tpu as pltpu
    from tpu3dssf.models.vit import prepare_tp_params

    cfg = ViTConfig(patch_size=16, image_size=(32, 48), hidden_size=32,
                    num_layers=2, num_heads=4, num_register_tokens=4,
                    use_rope=True, scan_layers=scan)
    vit = VisionTransformer(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    want = np.asarray(vit.apply(params, x)["patch_features"])

    mesh = create_mesh((2, 4), ("data", "model"))  # 4-way heads
    import dataclasses
    flash_cfg = dataclasses.replace(cfg, use_flash=True)
    tp_params, tp_cfg = prepare_tp_params(params, flash_cfg, mesh)
    assert tp_cfg.tp_axis == "model" and tp_cfg.tp_mesh is mesh
    vit_tp = VisionTransformer(tp_cfg)
    shardings = vit_tp_shardings(tp_params, mesh)
    sharded = jax.device_put(tp_params, shardings)

    with mesh, pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            jax.jit(vit_tp.apply)(sharded, x)["patch_features"])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_qkv_tp_permutation_is_exact_relayout():
    """The permutation must be a bijection that maps head h's q/k/v
    channels into shard h//Hl's block, preserving within-head order."""
    from tpu3dssf.models.vit import qkv_tp_permutation
    C, H, S = 32, 4, 2
    D = C // H
    perm = np.asarray(qkv_tp_permutation(C, H, S))
    assert sorted(perm.tolist()) == list(range(3 * C))
    # shard 0's block: q of heads 0..1, k of heads 0..1, v of heads 0..1
    want0 = np.concatenate([
        np.arange(t * C, t * C + (H // S) * D) for t in range(3)])
    np.testing.assert_array_equal(perm[: 3 * C // S], want0)


def test_prepare_tp_params_rejects_einsum_path():
    """Permuted qkv columns would silently scramble the einsum path's
    head slices — the combination must be rejected, not computed."""
    import pytest
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tpu3dssf.models.vit import (ViTConfig, VisionTransformer,
                                     prepare_tp_params)

    cfg = ViTConfig(patch_size=8, image_size=(16, 16), hidden_size=16,
                    num_layers=1, num_heads=2, use_flash=False)
    vit = VisionTransformer(cfg)
    params = vit.init(jax.random.PRNGKey(0),
                      jax.numpy.zeros((1, 16, 16, 3)))
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    with pytest.raises(ValueError, match="use_flash"):
        prepare_tp_params(params, cfg, mesh)
