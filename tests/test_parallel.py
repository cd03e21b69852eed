"""Sharding tests on the 8-virtual-CPU mesh (conftest forces cpu)."""

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
